"""Parity of the phase-fused freq-decoder layer vs the generic op chain.

The reference decoder resizes the frequency axis to T_spec after every
layer (`/root/reference/src/models/stem_separation/ATHTDemucs_v2.py:91-94`,
targets recorded at `:198`), so when ``F_in == target`` the 4x convT
upsample is exactly undone by /4 decimation.  ``atht._freq_layer_down4``
fuses convT + GroupNorm + GELU + decimation via the sub-pixel phase
decomposition; these tests pin it to the unfused ops bit-for-bit-level
(f32) and within bf16 rounding (bf16).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_to_sheet_music_tpu.models import atht
from audio_to_sheet_music_tpu.nn import core as nn


def _layer(key, i_ch, o_ch, with_norm, rng):
    conv = nn.conv_transpose2d_init(key, i_ch, o_ch, (8, 1))
    layer = {"conv": conv}
    if with_norm:
        layer["norm"] = {
            "weight": jnp.asarray(
                1 + 0.1 * rng.standard_normal(o_ch), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(o_ch), jnp.float32),
        }
    return layer


def _generic(layer, x, target):
    y = nn.conv_transpose2d(layer["conv"], x, stride=(4, 1), padding=(2, 0))
    if "norm" in layer:
        y = nn.gelu(nn.group_norm(layer["norm"], y, 1))
    if y.shape[2] != target:
        y = nn.interpolate_bilinear(y, (target, y.shape[3]))
    return y


class TestFreqLayerDown4:
    @pytest.mark.parametrize("i_ch,o_ch,s,t,with_norm", [
        (16, 8, 11, 11, True),      # tiny, norm (mirrors 0.25 s t_spec=11)
        (16, 8, 11, 11, False),     # last-layer shape (no norm)
        (8, 4, 7, 13, True),        # S != T
        (12, 6, 1, 5, True),        # S=1 edge (a_len=2, all-edge mask)
    ])
    def test_matches_generic_f32(self, rng, i_ch, o_ch, s, t, with_norm):
        layer = _layer(jax.random.PRNGKey(0), i_ch, o_ch, with_norm, rng)
        x = jnp.asarray(rng.standard_normal((2, i_ch, s, t)), jnp.float32)
        ref = _generic(layer, x, s)
        got = atht._freq_layer_down4(layer, x)
        assert got.shape == ref.shape == (2, o_ch, s, t)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_matches_generic_bf16(self, rng):
        layer = _layer(jax.random.PRNGKey(1), 16, 8, True, rng)
        x = jnp.asarray(rng.standard_normal((2, 16, 11, 11)),
                        jnp.float32).astype(jnp.bfloat16)
        ref = _generic(layer, x, 11).astype(jnp.float32)
        got = atht._freq_layer_down4(layer, x).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-2)

    def test_decoder_apply_routes_through_fused(self, rng, monkeypatch):
        """freq_decoder_apply must hit the fused path whenever
        F_in == target (every layer after the first in real use)."""
        calls = []
        orig = atht._freq_layer_down4

        def spy(layer, x):
            calls.append(x.shape)
            return orig(layer, x)

        monkeypatch.setattr(atht, "_freq_layer_down4", spy)
        key = jax.random.PRNGKey(2)
        p = atht._decoder_init(key, freq=True, chans=(16, 12, 8, 6, 4))
        x = jnp.asarray(rng.standard_normal((2, 16, 3, 11)), jnp.float32)
        skips = [jnp.asarray(rng.standard_normal((2, c, f, 11)), jnp.float32)
                 for c, f in zip((12, 8, 6, 4), (12, 48, 11, 11))]
        out = atht.freq_decoder_apply(p, x, skips, [11, 11, 11, 11])
        assert out.shape == (2, 4, 11, 11)
        # layer 0 has F_in=3 != 11 -> generic; layers 1-3 F_in=11 -> fused
        assert len(calls) == 3
        # and the full result equals the pre-fusion implementation
        def generic_apply(p, x, skips, targets):
            for i, layer in enumerate(p["layers"]):
                x = nn.conv_transpose2d(layer["conv"], x, stride=(4, 1),
                                        padding=(2, 0))
                if "norm" in layer:
                    x = nn.gelu(nn.group_norm(layer["norm"], x, 1))
                if x.shape[2] != targets[i]:
                    x = nn.interpolate_bilinear(x, (targets[i], x.shape[3]))
                sk = nn.interpolate_bilinear(skips[i][:, : x.shape[1]],
                                             x.shape[2:])
                x = x + sk.astype(x.dtype) * atht.SKIP_SCALE
            return x

        ref = generic_apply(p, x, skips, [11, 11, 11, 11])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
