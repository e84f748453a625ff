"""Streaming long-form separation: bounded memory, incremental output.

The reference handles long audio only by materialising the whole song and
looping host-side (`app.py:129-178`); this API separates an **unbounded**
stream with O(block) memory: feed samples as they arrive, receive separated
samples as soon as their overlap-add weights are final.

Design: the chunk grid is global (chunk ``k`` starts at ``k*hop``).  A block
of ``block_chunks`` consecutive chunks runs through the same fused device
sweep as offline separation, but returns the *unnormalised* (acc, weight)
pair; the overlapping tail (``segment - hop`` samples) carries across block
boundaries on the host, so emitted audio is bit-identical to the offline
path away from stream edges (verified in ``tests/test_streaming.py``).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..text.prompts import STEM_NAMES


class StreamingSeparator:
    """Incremental multi-stem separation over an audio stream.

    Usage::

        stream = StreamingSeparator(separator, stems=("vocals",))
        for piece in stream.feed(samples):   # (n_stems, 2, n) pieces
            play(piece)
        tail = stream.flush()
    """

    def __init__(self, separator, stems: Sequence[str] = STEM_NAMES,
                 block_chunks: int = 8):
        self.sep = separator
        self.stems = list(stems)
        if separator.mesh is not None:
            # chunk axis shards over the mesh inside the block program —
            # round the block up so every device gets equal work
            n_dev = separator.mesh.devices.size
            block_chunks = -(-block_chunks // n_dev) * n_dev
        self.block_chunks = block_chunks
        self.segment = separator.segment
        # same clamp as plan_chunks: overlap >= segment would make hop <= 0
        # and feed() would never drain its buffer
        self.overlap = min(separator.overlap, self.segment - 1)
        self.hop = self.segment - self.overlap
        self._embs = jnp.stack([separator.text_embedding(s) for s in stems])
        self._buf = np.zeros((2, 0), np.float32)     # pending input samples
        self._acc = None                              # carry: (S*2, tail)
        self._wsum = None                             # carry: (tail,)
        self._block_fn = None
        self._span = (block_chunks - 1) * self.hop + self.segment

    def _get_block_fn(self):
        if self._block_fn is None:
            # cached on the Separator: streams of the same geometry share
            # one compiled program, and the chunk axis gets the same mesh
            # sharding as the offline sweeps
            self._block_fn = self.sep._get_stream_block_fn(
                self.block_chunks, self.hop, self.overlap, len(self.stems))
        return self._block_fn

    def _emit(self, acc: np.ndarray, wsum: np.ndarray, n: int) -> np.ndarray:
        out = acc[:, :n] / np.maximum(wsum[:n], 1e-8)[None, :]
        return out.reshape(len(self.stems), 2, -1).astype(np.float32)

    def feed(self, samples: np.ndarray) -> list[np.ndarray]:
        """Append ``(2, n)`` samples; return finalised ``(S, 2, m)`` pieces
        (possibly empty).

        Eager (a list, not a generator): the buffer/state mutation happens
        on the call itself, so un-iterated or interleaved calls can never
        silently drop or reorder audio.
        """
        self._buf = np.concatenate(
            [self._buf, np.asarray(samples, np.float32)], axis=-1)
        advance = self.block_chunks * self.hop
        pieces = []
        while self._buf.shape[-1] >= self._span:
            acc, wsum = self._run_block(self._buf[:, : self._span])
            # samples >= advance still receive weight from the next block
            pieces.append(self._slide(acc, wsum, advance))
        return pieces

    def _run_block(self, song: np.ndarray):
        """One block program + carry-in -> host ``(acc, wsum)`` (the single
        home of the carry recurrence, shared by feed and flush)."""
        acc, wsum = self._get_block_fn()(self.sep.params, jnp.asarray(song),
                                         self._embs)
        acc = np.array(acc, np.float32)
        wsum = np.array(wsum, np.float32)
        if self._acc is not None:
            tail = self._acc.shape[-1]
            acc[:, :tail] += self._acc
            wsum[:tail] += self._wsum
        return acc, wsum

    def _slide(self, acc, wsum, advance: int) -> np.ndarray:
        """Emit ``advance`` finalised samples, carry the rest, drop the
        consumed input."""
        piece = self._emit(acc, wsum, advance)
        self._acc = acc[:, advance:]
        self._wsum = wsum[advance:]
        self._buf = self._buf[:, advance:]
        return piece

    def flush(self) -> np.ndarray:
        """Finalise the remaining buffered audio; returns ``(S, 2, m)``.

        Every chunk whose start lies inside the remaining audio contributes
        (matching the offline valid-chunk rule), so short tails may span
        several zero-padded blocks.
        """
        advance = self.block_chunks * self.hop
        pieces = []
        while self._buf.shape[-1] > 0:
            n = self._buf.shape[-1]
            song = np.zeros((2, self._span), np.float32)
            take = min(n, self._span)
            song[:, :take] = self._buf[:, :take]
            acc, wsum = self._run_block(song)
            n_chunks_needed = (n - 1) // self.hop + 1   # chunk starts < n
            if n_chunks_needed <= self.block_chunks:
                pieces.append(self._emit(acc, wsum, n))
                self._buf = np.zeros((2, 0), np.float32)
                self._acc = self._wsum = None
                break
            pieces.append(self._slide(acc, wsum, advance))
        if not pieces and self._acc is not None:
            pieces.append(self._emit(self._acc, self._wsum,
                                     self._acc.shape[-1]))
        self._buf = np.zeros((2, 0), np.float32)
        self._acc = self._wsum = None
        return (np.concatenate(pieces, axis=-1) if pieces
                else np.zeros((len(self.stems), 2, 0), np.float32))
