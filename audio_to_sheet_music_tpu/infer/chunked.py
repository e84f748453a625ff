"""Chunked full-song separation with weighted overlap-add, device-side.

The reference carries three near-duplicate host-side loops for this
(`app.py:129-178` with 0.1 s overlap, `benchmark.py:155-204` with 1.5 s,
`test_inference.py:96-142` with torchaudio Fade); this module is the single
TPU-native implementation all entry points share:

1. ``plan_chunks`` — host-side static plan: chunk count for a song length,
   bucketed upward so jit sees a small set of shapes (no per-track recompile;
   SURVEY §7 hard part #3).
2. ``frame_song`` — frame the padded song into the chunk grid on device
   (one gather, outside the hot loop).
3. model forward over the chunk axis as a **batch** — the chunk axis is a
   data axis: shard it over the mesh and a full song sweeps all chips.
4. ``overlap_add_weighted`` — linear cross-fade accumulate + weight
   renormalisation (reference weight scheme: ones with ``linspace`` fade-in/
   out of ``overlap`` samples, divided by the clamped weight sum).

Everything between frame and OLA is jit-compatible with static shapes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax.numpy as jnp
import numpy as np

DEFAULT_SEGMENT_SECONDS = 6.0
DEFAULT_OVERLAP_SECONDS = 1.5   # benchmark protocol (reference benchmark.py:134)


@dataclasses.dataclass(frozen=True)
class ChunkGrid:
    """Static chunking plan for one (bucketed) song length."""

    segment: int          # chunk length, samples
    hop: int              # stride between chunk starts
    n_chunks: int         # bucketed chunk count (>= needed)
    length: int           # true song length, samples

    @property
    def padded_length(self) -> int:
        return (self.n_chunks - 1) * self.hop + self.segment


def plan_chunks(length: int, segment: int, overlap: int,
                bucket: int | str = "auto") -> ChunkGrid:
    """Chunk plan for a song of ``length`` samples.

    ``n_chunks`` is rounded up to a multiple of ``bucket`` so only
    ``O(song_length / (bucket*hop))`` distinct shapes ever reach jit.
    Padded chunks carry zero OLA weight, so bucketing is output-invariant.

    ``bucket="auto"``: fine-grained (2) for short songs, where padding waste
    is proportionally large and the few extra compiled shapes are cheap;
    coarse (8) beyond 16 chunks, where shape diversity would multiply
    multi-minute compiles across an eval set.
    """
    overlap = min(overlap, segment - 1)
    hop = segment - overlap
    # every chunk start < length contributes (reference `while start < t`
    # loop, app.py:147): count = ceil(length / hop)
    needed = max(1, math.ceil(length / hop))
    if bucket == "auto":
        bucket = 2 if needed <= 16 else 8
    n = math.ceil(needed / bucket) * bucket
    return ChunkGrid(segment=segment, hop=hop, n_chunks=n, length=length)


def fade_weights(segment: int, overlap: int, dtype=jnp.float32) -> jnp.ndarray:
    """Reference OLA weights: ones with linear fade-in/out over ``overlap``
    samples (`app.py:140-144`).

    Composed as ``min(fade_in, fade_out)`` so ``overlap > segment/2``
    (allowed by ``plan_chunks`` up to ``segment - 1``) degrades to a
    continuous symmetric triangle instead of the fade-out overwriting most
    of the fade-in with a mid-chunk weight jump; for ``overlap <=
    segment/2`` this is bit-identical to the reference's construction."""
    w = np.ones(segment, np.float32)
    if overlap > 1:
        ramp = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
        w[:overlap] = np.minimum(w[:overlap], ramp)
        w[segment - overlap:] = np.minimum(w[segment - overlap:], ramp[::-1])
    return jnp.asarray(w, dtype)


def frame_song(x: jnp.ndarray, grid: ChunkGrid, padded: bool = False) -> jnp.ndarray:
    """``(C, T)`` song -> ``(n_chunks, C, segment)`` chunk batch.

    Zero-pads to the grid (skip with ``padded=True`` when the caller already
    padded host-side), then gathers all chunks in one indexed load.
    """
    if not padded:
        pad = grid.padded_length - x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, pad)))
    starts = jnp.arange(grid.n_chunks) * grid.hop
    idx = starts[:, None] + jnp.arange(grid.segment)[None, :]   # (n, L)
    return x[:, idx].transpose(1, 0, 2)                          # (n, C, L)


def overlap_add_weighted(chunks: jnp.ndarray, grid: ChunkGrid,
                         overlap: int,
                         valid_mask: jnp.ndarray | None = None,
                         normalize: bool = True):
    """``(n_chunks, C, segment)`` -> ``(C, length)`` weighted overlap-add.

    Accumulates ``sum(chunk * w)`` and ``sum(w)`` over the chunk grid
    (scatter-free, see below) and divides by the clamped weight sum
    (reference `app.py:160-177`).  ``valid_mask (n,)`` zeroes padded bucket
    chunks.
    With ``normalize=False`` returns the raw ``(acc (C, padded), wsum
    (padded,))`` pair instead — the streaming API carries these across block
    boundaries before normalising.
    """
    n, c, seg = chunks.shape
    w = fade_weights(seg, overlap, chunks.dtype)                 # (L,)
    wn = jnp.broadcast_to(w, (n, seg))
    if valid_mask is not None:
        wn = wn * valid_mask[:, None].astype(chunks.dtype)
    weighted = chunks * wn[:, None, :]

    # Scatter-free OLA: pad each chunk to a multiple of hop, then the output
    # is a sum of `ratio` shifted dense views (XLA lowers this to adds —
    # TPU-friendly, unlike a (n*L)-index scatter).
    hop = grid.hop
    ratio = -(-seg // hop)
    pad = ratio * hop - seg
    total = grid.padded_length

    def ola(x):                                   # (..., n, seg) -> (..., T)
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        pieces = xp.reshape(*x.shape[:-1], ratio, hop)
        out_chunks = n - 1 + ratio
        acc = jnp.zeros((*x.shape[:-2], out_chunks, hop), x.dtype)
        for i in range(ratio):
            acc = acc.at[..., i : i + n, :].add(pieces[..., :, i, :])
        return acc.reshape(*x.shape[:-2], out_chunks * hop)[..., :total]

    acc = ola(weighted.transpose(1, 0, 2))        # (C, T)
    wsum = ola(wn)                                # (T,)
    if not normalize:
        return acc, wsum
    out = acc / jnp.maximum(wsum, 1e-8)[None, :]
    return out[:, : grid.length]


def separate_chunked(
    forward_fn: Callable[[jnp.ndarray], jnp.ndarray],
    mixture: jnp.ndarray,
    segment: int,
    overlap: int,
    bucket: int = 8,
    chunk_batch: int | None = None,
) -> jnp.ndarray:
    """Separate a full ``(C, T)`` song through a chunk-batched model.

    ``forward_fn``: jitted ``(B, C, segment) -> (B, C, segment)`` (the model
    with prompt embedding already bound).  ``chunk_batch`` limits how many
    chunks run per device step (None = all at once, the fastest when memory
    allows; the chunk axis can also be mesh-sharded inside ``forward_fn``).
    """
    grid = plan_chunks(int(mixture.shape[-1]), segment, overlap, bucket)
    chunks = frame_song(jnp.asarray(mixture), grid)
    n = grid.n_chunks
    if chunk_batch is None or chunk_batch >= n:
        outs = forward_fn(chunks)
    else:
        parts = []
        for i in range(0, n, chunk_batch):
            block = chunks[i : i + chunk_batch]
            if block.shape[0] < chunk_batch:  # keep shapes static for jit
                pad = chunk_batch - block.shape[0]
                block = jnp.pad(block, ((0, pad), (0, 0), (0, 0)))
            parts.append(forward_fn(block))
        outs = jnp.concatenate(parts, axis=0)[:n]
    valid = (jnp.arange(n) * grid.hop) < grid.length
    return overlap_add_weighted(outs, grid, overlap, valid)
