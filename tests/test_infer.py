"""Chunked-inference unit tests: OLA invariants, grid planning, identity
model round-trip, and mesh-sharded chunk sweeps on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.infer import chunked
from audio_to_sheet_music_tpu.parallel import mesh as meshlib


class TestPlan:
    def test_counts_cover_song(self):
        g = chunked.plan_chunks(length=100_000, segment=10_000, overlap=2_500)
        assert g.hop == 7_500
        assert (g.n_chunks - 1) * g.hop + g.segment >= 100_000
        assert g.n_chunks % 2 == 0          # auto bucket, short song
        g8 = chunked.plan_chunks(100_000, 10_000, 2_500, bucket=8)
        assert g8.n_chunks % 8 == 0

    def test_bucketing_bounds_shape_count(self):
        shapes = {chunked.plan_chunks(t, 264600, 66150, bucket=8).n_chunks
                  for t in range(264600, 264600 * 40, 99_991)}
        assert len(shapes) <= 8

    def test_auto_bucket_fine_for_short_coarse_for_long(self):
        short = chunked.plan_chunks(14 * 198450, 264600, 66150)
        assert short.n_chunks % 2 == 0 and short.n_chunks < 18
        long_ = chunked.plan_chunks(60 * 198450, 264600, 66150)
        assert long_.n_chunks % 8 == 0

    def test_short_song(self):
        g = chunked.plan_chunks(length=5_000, segment=10_000, overlap=2_500)
        assert g.n_chunks >= 1


class TestOLA:
    def test_identity_model_reconstructs_input(self):
        """Constant-weight OLA with an identity model must return the input
        (reference invariant: constant-input => constant-output)."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 50_000)).astype(np.float32)
        out = np.asarray(chunked.separate_chunked(
            lambda c: c, jnp.asarray(x), segment=8_000, overlap=2_000))
        # The exact fade endpoints carry zero total weight and renormalise to
        # 0 — identical to the reference's clamp(sum_w, 1e-8) behaviour
        # (app.py:160-177).  Everything else reconstructs exactly.
        mismatch = np.abs(out - x) > 1e-5
        assert mismatch.sum() <= 4
        np.testing.assert_allclose(out[:, 1:-1], x[:, 1:-1], atol=1e-5)

    def test_identity_zero_overlap(self):
        x = np.random.default_rng(1).standard_normal((1, 33_000)).astype(np.float32)
        out = chunked.separate_chunked(lambda c: c, jnp.asarray(x),
                                       segment=4_000, overlap=0)
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)

    def test_chunk_batched_equals_full(self):
        x = np.random.default_rng(2).standard_normal((2, 40_000)).astype(np.float32)
        fwd = lambda c: c * 2.0
        full = chunked.separate_chunked(fwd, jnp.asarray(x), 6_000, 1_500)
        batched = chunked.separate_chunked(fwd, jnp.asarray(x), 6_000, 1_500,
                                           chunk_batch=3)
        np.testing.assert_allclose(np.asarray(full), np.asarray(batched),
                                   atol=1e-6)

    def test_fade_weights_shape(self):
        w = chunked.fade_weights(100, 20)
        assert w.shape == (100,)
        assert float(w[0]) == 0.0 and float(w[50]) == 1.0 and float(w[-1]) == 0.0


class TestMeshSweep:
    def test_sharded_chunk_axis(self):
        """Chunk axis sharded over the 8-device CPU mesh gives identical
        output to single-device."""
        mesh = meshlib.make_mesh()
        assert mesh.devices.size == 8
        x = np.random.default_rng(3).standard_normal((2, 64_000)).astype(np.float32)

        @jax.jit
        def model(c):
            return c * 0.5

        def fwd(chunks):
            return model(meshlib.shard_batch(chunks, mesh))

        out = np.asarray(chunked.separate_chunked(
            fwd, jnp.asarray(x), 8_000, 2_000, bucket=8))
        np.testing.assert_allclose(out[:, 1:-1], (x * 0.5)[:, 1:-1], atol=1e-5)
