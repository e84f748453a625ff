"""Prompt tokenisation for the CLAP text tower.

The reference uses HF ``RobertaTokenizerFast`` from ``laion/clap-htsat-unfused``
(`ATHTDemucs_v2.py:19,239`).  This module provides:

- ``RobertaBpeTokenizer`` — the real byte-level BPE, backed by the
  ``tokenizers`` library, loading ``vocab.json``/``merges.txt`` (or a
  ``tokenizer.json``) from a local path / HF cache.  Offline-friendly: no
  network, just files on disk.
- ``HashTokenizer`` — a deterministic fallback for environments without the
  vocab files (tests, random-weight benches): stable per-word ids in the
  RoBERTa id space with the same special-token framing (bos=0, eos=2, pad=1).
  NOT suitable for pretrained weights.

Both expose ``__call__(prompts) -> (input_ids, attention_mask)`` as padded
int32 numpy arrays, the contract ``models.clap_text`` consumes.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

BOS, PAD, EOS = 0, 1, 2
VOCAB_SIZE = 50265
# RoBERTa position table is 514 rows with a 2-row offset -> 512 usable token
# positions; HF truncates to model_max_length, and so must we (ids past the
# table would silently gather the clamped last row on TPU).
MAX_TOKENS = 512


def _truncate(ids: List[int]) -> List[int]:
    if len(ids) <= MAX_TOKENS:
        return ids
    return ids[: MAX_TOKENS - 1] + [EOS]


def _pad_batch(seqs: List[List[int]]) -> Tuple[np.ndarray, np.ndarray]:
    seqs = [_truncate(s) for s in seqs]
    max_len = max(len(s) for s in seqs)
    ids = np.full((len(seqs), max_len), PAD, np.int32)
    mask = np.zeros((len(seqs), max_len), np.int32)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s
        mask[i, : len(s)] = 1
    return ids, mask


class HashTokenizer:
    """Deterministic word-hash tokenizer (fallback; see module docstring)."""

    def __call__(self, prompts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        seqs = []
        for p in prompts:
            ids = [BOS]
            for word in p.lower().split():
                h = int.from_bytes(
                    hashlib.sha256(word.encode()).digest()[:4], "little")
                ids.append(3 + h % (VOCAB_SIZE - 3))
            ids.append(EOS)
            seqs.append(ids)
        return _pad_batch(seqs)


class RobertaBpeTokenizer:
    """Byte-level BPE via the ``tokenizers`` library (local files only)."""

    def __init__(self, path: str | Path):
        path = Path(path)
        from tokenizers import Tokenizer
        from tokenizers.processors import RobertaProcessing

        if (path / "tokenizer.json").exists():
            self._tok = Tokenizer.from_file(str(path / "tokenizer.json"))
        else:
            from tokenizers import ByteLevelBPETokenizer

            self._tok = ByteLevelBPETokenizer(
                str(path / "vocab.json"), str(path / "merges.txt"))
            self._tok.post_processor = RobertaProcessing(
                sep=("</s>", EOS), cls=("<s>", BOS))

    def __call__(self, prompts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        encs = [self._tok.encode(p) for p in prompts]
        return _pad_batch([e.ids for e in encs])


def default_tokenizer(vocab_path: str | Path | None = None,
                      require_real: bool = False):
    """Real BPE if vocab files are available, else the hash fallback.

    ``require_real=True`` (set when PRETRAINED weights are in play, e.g. a
    reference ``.pt`` checkpoint was imported) refuses the hash fallback:
    hashed ids would silently feed garbage text conditioning to a tower that
    was trained on real RoBERTa BPE ids (reference `ATHTDemucs_v2.py:19,239`).
    """
    candidates = []
    if vocab_path:
        candidates.append(Path(vocab_path))
    env = os.environ.get("ATSM_TOKENIZER_DIR")
    if env:
        candidates.append(Path(env))
    for c in candidates:
        if (c / "tokenizer.json").exists() or (c / "vocab.json").exists():
            return RobertaBpeTokenizer(c)
    if require_real:
        looked = ", ".join(str(c) for c in candidates) or "(none)"
        raise RuntimeError(
            "Pretrained weights are loaded but no real RoBERTa BPE vocabulary "
            f"was found (searched: {looked}). The HashTokenizer fallback "
            "would produce meaningless token ids for a pretrained checkpoint. "
            "Point ATSM_TOKENIZER_DIR (or vocab_path) at a directory holding "
            "tokenizer.json or vocab.json+merges.txt from "
            "laion/clap-htsat-unfused.")
    return HashTokenizer()
