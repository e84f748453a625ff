"""Parity of the fused Pallas DConv kernel vs the XLA reference path.

Runs in interpreter mode (tests are CPU-only); compiled-TPU parity is
checked by `scripts/bench_pallas_dconv.py` / `bench_forward_loop.py`.
Biases/scales are randomised — zero-init norm biases would hide pad-region
leakage through the residual (a real bug this suite caught).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_to_sheet_music_tpu.models import htdemucs as H
from audio_to_sheet_music_tpu.ops import pallas_dconv


def _randomized_params(key, c, rng):
    p = H.dconv_init(key, c)
    for blk in p["layers"]:
        for nm in ("norm1", "norm2"):
            blk[nm]["bias"] = jnp.asarray(
                rng.standard_normal(blk[nm]["bias"].shape), jnp.float32)
            blk[nm]["weight"] = jnp.asarray(
                1 + 0.1 * rng.standard_normal(blk[nm]["weight"].shape),
                jnp.float32)
        blk["scale"]["scale"] = jnp.asarray(
            0.5 * rng.standard_normal(blk["scale"]["scale"].shape),
            jnp.float32)
    return p


class TestPallasDconv:
    @pytest.mark.parametrize("r,c,t", [
        (64, 48, 336),     # enc0-like fold (full block + remainder rows)
        (16, 96, 336),     # enc1-like
        (8, 384, 336),     # enc3-like (rb=1 path)
        (6, 48, 100),      # non-aligned T, odd row count
    ])
    def test_parity_vs_xla(self, rng, r, c, t):
        p = _randomized_params(jax.random.PRNGKey(0), c, rng)
        x = jnp.asarray(rng.standard_normal((r, c, t)), jnp.float32)
        ref = H.dconv_apply(p, x)
        got = pallas_dconv.dconv_rows(p, x, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)

    def test_supports_contract(self):
        assert pallas_dconv.supports(6144, 336, 48)
        assert pallas_dconv.supports(96, 336, 384)
        assert pallas_dconv.supports(7, 336, 48)        # rb=1 fallback
        assert not pallas_dconv.supports(8, 336, 12)    # C % 8 != 0

    def test_rows_differ_independently(self, rng):
        """Row independence: permuting input rows permutes output rows
        (catches cross-row leakage through the flat lane layout)."""
        c = 48
        p = _randomized_params(jax.random.PRNGKey(1), c, rng)
        x = jnp.asarray(rng.standard_normal((16, c, 336)), jnp.float32)
        perm = rng.permutation(16)
        a = pallas_dconv.dconv_rows(p, x, interpret=True)
        b = pallas_dconv.dconv_rows(p, x[perm], interpret=True)
        np.testing.assert_allclose(np.asarray(a[perm]), np.asarray(b),
                                   atol=1e-5)
