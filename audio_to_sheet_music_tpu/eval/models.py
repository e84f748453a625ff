"""Benchmark model registry (reference ``SeparationModel`` ABC + impls).

Reference registry (`benchmark.py:81-548`): ``OurModel`` (the text-conditioned
model, one chunked pass per stem), ``HTDemucsModel`` (the frozen 4-source
baseline via ``demucs.apply_model``), ``CLAPSepModel`` (a third-party HF
download — requires network + external weights; provided as an optional stub
that raises with instructions, mirroring the reference's graceful skip at
`benchmark.py:294-299, 977-980`).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..infer import Separator, chunked
from ..models import htdemucs
from ..text.prompts import STEM_NAMES


class SeparationModel:
    """ABC: ``separate(mixture, stem)`` / ``separate_all(mixture)``
    (reference `benchmark.py:81-115`)."""

    name = "base"

    def separate(self, mixture: np.ndarray, stem: str) -> np.ndarray:
        raise NotImplementedError

    def separate_all(self, mixture: np.ndarray) -> Mapping[str, np.ndarray]:
        return {stem: self.separate(mixture, stem) for stem in STEM_NAMES}


class OursModel(SeparationModel):
    """AudioTextHTDemucs through the shared ``Separator`` session."""

    name = "AudioTextHTDemucs (Ours)"

    def __init__(self, params, **kwargs):
        self._sep = Separator(params, **kwargs)

    def separate(self, mixture, stem):
        return self._sep.separate(mixture, stem)

    def separate_all(self, mixture):
        return self._sep.separate_all(mixture)


class HTDemucsBaseline(SeparationModel):
    """Frozen 4-source HTDemucs with demucs-style chunking (25% overlap).

    Reference runs ``demucs.apply_model(split=True, overlap=0.25)``
    (`benchmark.py:251`); here the same protocol through our chunk sweep.
    """

    name = "HTDemucs (pretrained)"

    def __init__(self, params, segment_seconds: float = 7.8,
                 overlap_ratio: float = 0.25, compute_dtype=jnp.bfloat16,
                 sample_rate: int = 44100):
        self.params = params
        self.segment = int(segment_seconds * sample_rate)
        self.overlap = int(self.segment * overlap_ratio)
        self.compute_dtype = compute_dtype

        @jax.jit
        def fwd(params, chunks):
            return htdemucs.forward(params, chunks)

        self._fwd = fwd

    def separate_all(self, mixture) -> Dict[str, np.ndarray]:
        mix = jnp.asarray(np.asarray(mixture, np.float32))

        def forward_stems(chunks):            # (n, 2, L) -> (n, 8, L)
            out = self._fwd(self.params, chunks)      # (n, 4, 2, L)
            n, s, c, l = out.shape
            return out.reshape(n, s * c, l)

        flat = chunked.separate_chunked(forward_stems, mix, self.segment,
                                        self.overlap)
        out = np.asarray(flat).reshape(len(STEM_NAMES), 2, -1)
        return {stem: out[i] for i, stem in enumerate(STEM_NAMES)}

    def separate(self, mixture, stem):
        return self.separate_all(mixture)[stem]


class CLAPSepModel(SeparationModel):
    """Third-party CLAPSep baseline (reference `benchmark.py:277-548`).

    The reference downloads it from HF Hub at runtime; in offline
    environments it is unavailable and the benchmark skips it exactly like
    the reference does when the download fails.
    """

    name = "CLAPSep"

    def __init__(self, *_, **__):
        raise RuntimeError(
            "CLAPSep requires downloading third-party weights from HF Hub "
            "(AisakaMikoto/CLAPSep); unavailable offline — skipping, as the "
            "reference does (benchmark.py:294-299).")
