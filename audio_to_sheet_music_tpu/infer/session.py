"""Separator — the high-level inference session all entry points share.

Owns: model params (optionally mesh-replicated), a prompt->embedding cache
(the text tower runs once per distinct prompt, SURVEY §7 step 4), and jitted
chunk-batched forwards cached per chunk-grid shape.  Used by the benchmark
harness, the CLI, and the serving app — replacing the reference's three
separate model-wrapper copies (`benchmark.py:122-215`, `app.py:129-178`,
`test_inference.py:96-142`).
"""

from __future__ import annotations

import functools
from typing import Dict, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import atht
from ..parallel import mesh as meshlib
from ..text.prompts import STEM_NAMES
from ..text.tokenizer import default_tokenizer
from . import chunked

SAMPLE_RATE = 44100


class Separator:
    """Text-conditioned full-song stem separation."""

    def __init__(
        self,
        params,
        segment_seconds: float = chunked.DEFAULT_SEGMENT_SECONDS,
        overlap_seconds: float = chunked.DEFAULT_OVERLAP_SECONDS,
        compute_dtype=jnp.bfloat16,
        mesh=None,
        tokenizer=None,
        normalize_text: bool = False,
        sample_rate: int = SAMPLE_RATE,
    ):
        self.sample_rate = sample_rate
        self.segment = int(segment_seconds * sample_rate)
        self.overlap = int(overlap_seconds * sample_rate)
        self.compute_dtype = compute_dtype
        self.normalize_text = normalize_text
        self.mesh = mesh
        self.tokenizer = tokenizer or default_tokenizer()
        if mesh is not None:
            params = meshlib.replicate(params, mesh)
            self.bucket = meshlib.pad_to_multiple(8, mesh.devices.size)
        else:
            self.bucket = 8
        self.params = params
        self._emb_cache: Dict[str, jnp.ndarray] = {}

        @jax.jit
        def _encode_text(params, ids, mask):
            return atht.encode_text(params, ids, mask, self.normalize_text)

        self._encode_text = _encode_text

        @functools.partial(jax.jit, static_argnames=("dtype",))
        def _chunk_forward(params, chunks, emb, dtype):
            b = chunks.shape[0]
            embs = jnp.broadcast_to(emb[None, :], (b, emb.shape[-1]))
            return atht.forward_with_text_emb(params, chunks, embs, dtype)

        self._chunk_forward = _chunk_forward

    # -- text ---------------------------------------------------------------

    def text_embedding(self, prompt: str) -> jnp.ndarray:
        """(512,) CLAP embedding, cached per distinct prompt string."""
        if prompt not in self._emb_cache:
            ids, mask = self.tokenizer([prompt])
            emb = self._encode_text(self.params, jnp.asarray(ids),
                                    jnp.asarray(mask))[0]
            self._emb_cache[prompt] = emb
        return self._emb_cache[prompt]

    # -- separation ---------------------------------------------------------

    def separate(self, mixture: np.ndarray, prompt: str) -> np.ndarray:
        """(2, T) mixture + free-text prompt -> (2, T) stem.

        Matches the reference protocol: 6 s chunks, linear cross-fade
        overlap-add, weight renormalisation (`benchmark.py:155-204`).
        """
        emb = self.text_embedding(prompt)
        mix = jnp.asarray(np.asarray(mixture, np.float32))

        def fwd(chunks):
            if self.mesh is not None:
                chunks = meshlib.shard_batch(chunks, self.mesh)
            return self._chunk_forward(self.params, chunks, emb,
                                       self.compute_dtype)

        out = chunked.separate_chunked(
            fwd, mix, self.segment, self.overlap, bucket=self.bucket)
        return np.asarray(out)

    def separate_all(self, mixture: np.ndarray,
                     stems: Sequence[str] = STEM_NAMES
                     ) -> Mapping[str, np.ndarray]:
        """All stems for one mixture (reference ``separate_all``,
        `benchmark.py:139-153`)."""
        return {stem: self.separate(mixture, stem) for stem in stems}
