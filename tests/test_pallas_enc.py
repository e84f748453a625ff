"""Equality tests for the fused frequency HEncLayer kernel
(ops/pallas_enc.py) against the per-op XLA composition it replaces
(models.htdemucs.henc_layer_apply, freq=True).

Interpret mode (CPU emulation) — Mosaic lowering is covered by the
on-hardware parity gate (ops/kernel_gate.py), same policy as the fused
transformer-layer kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.models import htdemucs
from audio_to_sheet_music_tpu.ops import pallas_enc


def _layer(key, cin, cout):
    return htdemucs.henc_layer_init(key, cin, cout, freq=True)


def _ref(p, x):
    return htdemucs.henc_layer_apply(p, x, freq=True)


class TestFusedFreqEncLayer:
    @pytest.mark.parametrize("cin,cout,f,t", [
        (4, 48, 2048, 336),     # flagship layer 0 (6 s segment)
        (48, 96, 512, 336),     # flagship layer 1
        (4, 48, 64, 87),        # tiny grid, non-128-aligned T
        (8, 16, 32, 130),       # T just over one lane tile
        (8, 16, 12, 87),        # odd nb_out -> fb == 1 (overlap-only xs)
        (96, 192, 128, 336),    # flagship layer 2 (VMEM-constrained fb)
    ])
    def test_matches_per_op_path(self, cin, cout, f, t):
        assert pallas_enc.supports(cin, cout, f, t)
        key = jax.random.PRNGKey(cin * 1000 + f)
        p = _layer(key, cin, cout)
        x = 0.5 * jax.random.normal(jax.random.PRNGKey(7), (2, cin, f, t),
                                    jnp.float32)
        ref = _ref(p, x)
        out = pallas_enc.henc_freq_fused(p, x, interpret=True)
        assert out.shape == ref.shape == (2, cout, f // 4, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_bf16_inputs_match_to_bf16_grade(self):
        p = _layer(jax.random.PRNGKey(0), 4, 48)
        x = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (1, 4, 256, 87),
                                    jnp.bfloat16)
        ref = np.asarray(_ref(p, x), np.float32)
        out = np.asarray(
            pallas_enc.henc_freq_fused(p, x, interpret=True), np.float32)
        rms = float(np.sqrt(np.mean((ref - out) ** 2)))
        ref_rms = float(np.sqrt(np.mean(ref ** 2)))
        # kernel computes in f32 after the bf16 matmuls; the per-op path
        # keeps bf16 between every op -> bf16-rounding-grade deltas
        assert rms < 2e-2 * max(ref_rms, 1e-3)

    def test_supports_rejects_unpackable(self):
        assert not pallas_enc.supports(4, 48, 30, 87)     # F % 4 != 0
        assert not pallas_enc.supports(4, 44, 64, 87)     # C % 8 != 0
        # flagship layer 3 shape (192 -> 384, F=32): VMEM model may reject
        # or accept depending on budget; it must at least not crash
        pallas_enc.supports(192, 384, 32, 336)

    def test_fb_one_matches(self):
        # force the degenerate single-row block (overlap-only xs branch)
        # at a shape whose auto fb is larger
        import os
        p = _layer(jax.random.PRNGKey(5), 4, 48)
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 64, 87),
                              jnp.float32)
        ref = _ref(p, x)
        os.environ["ATSM_PALLAS_ENC_FB"] = "1"
        try:
            out = pallas_enc.henc_freq_fused(p, x, interpret=True)
        finally:
            del os.environ["ATSM_PALLAS_ENC_FB"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_profitable_gates_to_layer_zero(self):
        """The production default applies the kernel only where it measured
        faster than XLA (layer 0, Cin=4); deeper layers measured slower and
        must be excluded from auto mode (docs/PERFORMANCE.md round 5)."""
        assert pallas_enc.profitable(4)       # flagship layer 0
        assert pallas_enc.profitable(2)       # mono-variant layer 0
        assert not pallas_enc.profitable(48)  # layer 1: measured loss
        assert not pallas_enc.profitable(96)  # layer 2: measured loss

    def test_mode_env_policy(self, monkeypatch):
        """ATSM_PALLAS_ENC: 0 -> off, 1 -> profitable layers off-CPU,
        all -> every supported layer, unset -> TPU-only auto."""
        monkeypatch.setattr(htdemucs, "_PALLAS_ENC_VETO", None)
        monkeypatch.setenv("ATSM_PALLAS_ENC", "0")
        assert htdemucs._pallas_enc_mode() is None
        monkeypatch.setenv("ATSM_PALLAS_ENC", "1")
        expect = None if jax.default_backend() == "cpu" else "auto"
        assert htdemucs._pallas_enc_mode() == expect
        monkeypatch.setenv("ATSM_PALLAS_ENC", "all")
        expect_all = None if jax.default_backend() == "cpu" else "all"
        assert htdemucs._pallas_enc_mode() == expect_all
        monkeypatch.delenv("ATSM_PALLAS_ENC")
        auto = htdemucs._pallas_enc_mode()
        assert auto == ("auto" if jax.default_backend() == "tpu" else None)
        # the parity-gate veto overrides every setting
        monkeypatch.setenv("ATSM_PALLAS_ENC", "all")
        monkeypatch.setattr(htdemucs, "_PALLAS_ENC_VETO", "test")
        assert htdemucs._pallas_enc_mode() is None

    def test_grid_independence_of_batch(self):
        # per-(b, f-block) grid: batch items must not bleed into each other
        p = _layer(jax.random.PRNGKey(3), 4, 16)
        x = jax.random.normal(jax.random.PRNGKey(4), (3, 4, 64, 87),
                              jnp.float32)
        full = pallas_enc.henc_freq_fused(p, x, interpret=True)
        for b in range(3):
            one = pallas_enc.henc_freq_fused(p, x[b:b + 1], interpret=True)
            np.testing.assert_allclose(np.asarray(full[b:b + 1]),
                                       np.asarray(one), atol=1e-6)
