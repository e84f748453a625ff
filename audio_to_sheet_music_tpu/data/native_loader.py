"""ctypes bindings for the native C++ segment loader.

Builds ``segment_loader.cpp`` with g++ on first use (cached next to the
source; no pybind11 needed) and exposes ``NativeBatchLoader`` with the same
iterator contract as the Python ``BatchLoader`` — batches of ``{mixture,
target, input_ids, attention_mask, stem_index}``.  Tokenisation stays in
Python (tiny); segment slicing, augmentation and batching run in C++ worker
threads over mmapped track caches.

Falls back cleanly: ``native_available()`` is False when the toolchain or a
prebuilt library is missing, and callers keep using ``BatchLoader``.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Dict, Iterator, Sequence

import numpy as np

from ..text.prompts import STEM_NAMES, STEM_PROMPTS

_SRC = Path(__file__).parent / "native" / "segment_loader.cpp"
_LIB = Path(__file__).parent / "native" / "_segment_loader.so"
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _load_lib():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                # compile to a per-process temp path and os.replace (atomic)
                # so a concurrent first use in another process never dlopens
                # a half-written library
                import os

                tmp = _LIB.with_suffix(f".{os.getpid()}.tmp.so")
                try:
                    subprocess.run(
                        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                         "-pthread", str(_SRC), "-o", str(tmp)],
                        check=True, capture_output=True, text=True)
                    os.replace(tmp, _LIB)
                except (subprocess.CalledProcessError, OSError) as e:
                    if not _LIB.exists():
                        raise
                    # a prebuilt .so exists (e.g. fresh checkout with
                    # arbitrary sub-second mtime ordering, no toolchain):
                    # use it rather than silently dropping to the slow
                    # Python loader
                    print(f"native_loader: rebuild failed ({e}); using the "
                          f"existing prebuilt {_LIB.name}", flush=True)
            lib = ctypes.CDLL(str(_LIB))
            lib.sl_create.restype = ctypes.c_void_p
            lib.sl_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
                ctypes.c_int, ctypes.c_ulong, ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            lib.sl_epoch_size.restype = ctypes.c_long
            lib.sl_epoch_size.argtypes = [ctypes.c_void_p]
            lib.sl_next.restype = ctypes.c_int
            lib.sl_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_int32)]
            lib.sl_reset.argtypes = [ctypes.c_void_p, ctypes.c_ulong]
            lib.sl_track_count.restype = ctypes.c_long
            lib.sl_track_count.argtypes = [ctypes.c_void_p]
            lib.sl_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except (subprocess.CalledProcessError, OSError) as e:
            _build_error = str(e)
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeBatchLoader:
    """C++-backed batch iterator over decode-once ``.npy`` track caches."""

    def __init__(self, track_paths: Sequence[str | Path], segment_samples: int,
                 batch_size: int, tokenizer, seed: int = 0,
                 n_threads: int = 4, augment: bool = False,
                 random_segments: bool = False, max_token_len: int = 16):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self.segment = int(segment_samples)
        self.batch = int(batch_size)
        self.tokenizer = tokenizer
        self.max_token_len = max_token_len
        self._epoch = 0
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        paths = [str(p).encode() for p in track_paths]
        arr = (ctypes.c_char_p * len(paths))(*paths)
        self._h = lib.sl_create(arr, len(paths), self.segment, self.batch,
                                seed, n_threads, int(augment),
                                int(random_segments))
        loaded = int(lib.sl_track_count(self._h))
        if loaded < len(paths):
            # mirror the Python path, which raises on corrupt caches —
            # never silently train on a shrunken dataset
            lib.sl_destroy(self._h)
            self._h = None
            raise RuntimeError(
                f"native loader parsed only {loaded}/{len(paths)} track "
                "caches (corrupt/truncated .npy? see stderr for names)")
        self._n_batches = int(lib.sl_epoch_size(self._h))
        # token table: pre-tokenise every prompt variant once
        all_prompts = [p for ps in STEM_PROMPTS.values() for p in ps]
        ids, mask = tokenizer(all_prompts)
        l = max_token_len
        self._tok_ids = np.full((len(all_prompts), l), 1, np.int32)
        self._tok_mask = np.zeros((len(all_prompts), l), np.int32)
        w = min(l, ids.shape[1])
        self._tok_ids[:, :w] = ids[:, :w]
        self._tok_mask[:, :w] = mask[:, :w]
        self._prompt_slices = {}
        off = 0
        for stem, ps in STEM_PROMPTS.items():
            self._prompt_slices[stem] = (off, off + len(ps))
            off += len(ps)

    def __len__(self) -> int:
        return self._n_batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self._epoch > 0:
            self._lib.sl_reset(self._h, self._seed + self._epoch)
        self._epoch += 1
        b, seg = self.batch, self.segment
        while True:
            mix = np.empty((b, 2, seg), np.float32)
            tgt = np.empty((b, 2, seg), np.float32)
            sidx = np.empty((b,), np.int32)
            ok = self._lib.sl_next(
                self._h,
                mix.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                sidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if not ok:
                break
            ids = np.empty((b, self.max_token_len), np.int32)
            mask = np.empty((b, self.max_token_len), np.int32)
            for i, s in enumerate(sidx):
                lo, hi = self._prompt_slices[STEM_NAMES[int(s)]]
                j = int(self._rng.integers(lo, hi))
                ids[i] = self._tok_ids[j]
                mask[i] = self._tok_mask[j]
            yield {"mixture": mix, "target": tgt, "input_ids": ids,
                   "attention_mask": mask, "stem_index": sidx}

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sl_destroy(self._h)
            self._h = None
