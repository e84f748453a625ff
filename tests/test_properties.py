"""Property-based tests (hypothesis) for the pure-math core.

These target the places where a shape/stride slip would corrupt audio
silently: the chunk-grid planner, signal framing, generic-hop overlap-add,
and the three-way lowering of linear interpolation in ``nn/core.py``
(strided-slice near-identity path / dense MXU matrix / gather-lerp — all
must agree with the naive two-tap formula for EVERY size pair).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from audio_to_sheet_music_tpu.infer import chunked
from audio_to_sheet_music_tpu.nn import core as nn
from audio_to_sheet_music_tpu.ops import dsp

import jax.numpy as jnp

SET = dict(max_examples=40, deadline=None)


class TestPlanChunks:
    @given(length=st.integers(1, 200_000), segment=st.integers(2, 40_000),
           overlap_frac=st.floats(0.0, 0.9), bucket=st.sampled_from([1, 4, 8]))
    @settings(**SET)
    def test_grid_covers_song(self, length, segment, overlap_frac, bucket):
        overlap = int(segment * overlap_frac)
        grid = chunked.plan_chunks(length, segment, overlap, bucket)
        assert grid.hop >= 1
        assert grid.n_chunks % bucket == 0
        # every sample of the song lies inside at least one chunk
        last_start = (grid.n_chunks - 1) * grid.hop
        assert last_start + grid.segment >= length
        # starts of valid chunks are inside the song (validity rule)
        n_valid = sum(1 for k in range(grid.n_chunks)
                      if k * grid.hop < length)
        assert n_valid >= 1
        assert grid.padded_length >= length

    @given(length=st.integers(1, 100_000))
    @settings(**SET)
    def test_serving_geometry(self, length):
        """The production 6 s/0.1 s geometry never loses samples."""
        grid = chunked.plan_chunks(length, 264600, 4410, 4)
        assert (grid.n_chunks - 1) * grid.hop + grid.segment >= length


class TestFrameProperties:
    @given(t=st.integers(16, 3000), frame_length=st.sampled_from([8, 12, 64]),
           hop=st.integers(1, 64))
    @settings(**SET)
    def test_frame_matches_naive(self, t, frame_length, hop):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, t)).astype(np.float32)
        n_frames = max(1, (t - frame_length) // hop + 1)
        got = np.asarray(dsp.frame(jnp.asarray(x), frame_length, hop,
                                   n_frames))
        padded = np.pad(x, [(0, 0), (0, max(0, (n_frames - 1) * hop
                                            + frame_length - t))])
        for k in range(n_frames):
            np.testing.assert_array_equal(
                got[:, k], padded[:, k * hop : k * hop + frame_length])


class TestOverlapAddProperties:
    @given(n=st.integers(1, 9), length=st.integers(2, 260),
           hop=st.integers(1, 260))
    @settings(**SET)
    def test_matches_naive_any_hop(self, n, length, hop):
        hop = min(hop, length)          # hop > frame length is degenerate
        rng = np.random.default_rng(1)
        frames = rng.standard_normal((n, length)).astype(np.float32)
        out = np.asarray(dsp.overlap_add(jnp.asarray(frames), hop))
        naive = np.zeros(length + (n - 1) * hop, np.float32)
        for i in range(n):
            naive[i * hop : i * hop + length] += frames[i]
        np.testing.assert_allclose(out, naive, atol=1e-5)


def _naive_lerp(x: np.ndarray, size: int) -> np.ndarray:
    """align_corners=False linear resize along the last axis."""
    in_size = x.shape[-1]
    if in_size == size:
        return x.copy()
    pos = (np.arange(size) + 0.5) * in_size / size - 0.5
    i0 = np.clip(np.floor(pos).astype(int), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    frac = np.clip(pos - i0, 0.0, 1.0).astype(np.float32)
    return x[..., i0] * (1 - frac) + x[..., i1] * frac


class TestInterpolationLowerings:
    """nn.interpolate_linear picks between strided-slice, dense-matmul and
    gather-lerp lowerings by size; all must equal the naive formula."""

    @given(in_size=st.integers(2, 400), out_size=st.integers(1, 400))
    @settings(**SET)
    def test_all_lowerings_match_naive(self, in_size, out_size):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 3, in_size)).astype(np.float32)
        got = np.asarray(nn.interpolate_linear(jnp.asarray(x), out_size))
        np.testing.assert_allclose(got, _naive_lerp(x, out_size),
                                   atol=2e-5, rtol=1e-5)

    @given(delta=st.integers(-8, 8))
    @settings(**SET)
    def test_near_identity_sizes(self, delta):
        """The serving path's 4T -> 4T-k adjustments (slice-lowered)."""
        in_size = 1024
        out_size = max(2, in_size + delta)
        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 2, in_size)).astype(np.float32)
        got = np.asarray(nn.interpolate_linear(jnp.asarray(x), out_size))
        np.testing.assert_allclose(got, _naive_lerp(x, out_size),
                                   atol=2e-5, rtol=1e-5)
