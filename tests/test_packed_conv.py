"""Packed small-channel conv lowering == the exact XLA conv.

The ``ATSM_FAST_ENC=1`` fast path is a pure weight relayout + matmul, so in
f32 it must match ``nn.conv2d`` to float-associativity tolerance, at the
real layer-0 geometry and at property-style odd geometries.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.models import htdemucs
from audio_to_sheet_music_tpu.nn import core as nn
from audio_to_sheet_music_tpu.ops import packed_conv


@pytest.mark.parametrize("cin,co,f,t,k,s,pad,g", [
    (4, 48, 2048, 7, 8, 4, 2, 4),      # real freq layer-0 geometry
    (4, 48, 128, 5, 8, 4, 2, 4),
    (2, 8, 64, 3, 8, 4, 2, 4),
    (4, 16, 96, 4, 4, 2, 1, 2),        # k/s=2, smaller stride
])
def test_packed_conv_matches_exact(cin, co, f, t, k, s, pad, g):
    assert packed_conv.supports(cin, k, s, f, pad, g)
    key = jax.random.PRNGKey(0)
    p = nn.conv2d_init(key, cin, co, (k, 1))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cin, f, t), jnp.float32)
    want = nn.conv2d(p, x, stride=(s, 1), padding=(pad, 0))
    got = packed_conv.packed_freq_conv(p, x, k, s, pad, g)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_supports_rejects_bad_geometry():
    assert not packed_conv.supports(4, 8, 3, 2048, 2)     # k % s != 0
    assert not packed_conv.supports(48, 8, 4, 512, 2)     # contraction >= 128
    assert not packed_conv.supports(4, 8, 4, 2047, 2)     # grid not divisible


@pytest.mark.parametrize("c,h,t,dil,blk", [
    (48, 6, 336, 1, 16),       # real layer-0 folded DConv, depth 0
    (48, 6, 336, 2, 16),       # depth 1 (dilation 2)
    (384, 48, 336, 1, 16),
    (8, 1, 64, 2, 8),
])
def test_packed_time_conv_matches_exact(c, h, t, dil, blk):
    assert packed_conv.supports_time_pack(c, t, dil, blk)
    p = nn.conv1d_init(jax.random.PRNGKey(0), c, h, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, c, t), jnp.float32)
    want = nn.conv1d(p, x, padding=dil, dilation=dil)
    got = packed_conv.packed_time_conv(p, x, dil, blk)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,co,t,k,s,pad,g", [
    (2, 48, 66152, 8, 4, 2, 32),       # real time layer-0 geometry
    (2, 48, 1024, 8, 4, 2, 32),        # tout=256, divides exactly
    (2, 48, 1000, 8, 4, 2, 32),        # tout=250: pad+slice remainder
    (4, 16, 480, 4, 2, 1, 8),          # k/s=2
])
def test_packed_time_stride_conv_matches_exact(cin, co, t, k, s, pad, g):
    assert packed_conv.supports_time_stride(cin, k, s, t, pad)
    p = nn.conv1d_init(jax.random.PRNGKey(0), cin, co, k)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cin, t), jnp.float32)
    want = nn.conv1d(p, x, stride=s, padding=pad)
    got = packed_conv.packed_time_stride_conv(p, x, k, s, pad, g)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_supports_time_stride_rejects_bad_geometry():
    assert not packed_conv.supports_time_stride(2, 8, 3, 1024, 2)  # k % s
    assert not packed_conv.supports_time_stride(48, 8, 4, 1024, 2) # deep cin
    assert not packed_conv.supports_time_stride(2, 8, 4, 1023, 2)  # stride


def test_fast_enc_time_layer_matches_default(monkeypatch):
    """Full time-branch HEncLayer forward with ATSM_FAST_ENC=1 == default
    (covers the packed strided conv1d inside the real layer wiring,
    including the odd-length T pre-pad)."""
    p = htdemucs.henc_layer_init(jax.random.PRNGKey(0), 2, 48, freq=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 5511), jnp.float32)
    monkeypatch.delenv("ATSM_FAST_ENC", raising=False)
    want = htdemucs.henc_layer_apply(p, x, freq=False)
    monkeypatch.setenv("ATSM_FAST_ENC", "1")
    got = htdemucs.henc_layer_apply(p, x, freq=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fast_dconv_matches_default(monkeypatch):
    p = htdemucs.dconv_init(jax.random.PRNGKey(0), 48)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 48, 336), jnp.float32)
    monkeypatch.delenv("ATSM_FAST_DCONV", raising=False)
    want = htdemucs.dconv_apply(p, x)
    monkeypatch.setenv("ATSM_FAST_DCONV", "1")
    got = htdemucs.dconv_apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fast_dconv_falls_back_on_odd_lengths(monkeypatch):
    """T not divisible by the block -> exact path, same result."""
    p = htdemucs.dconv_init(jax.random.PRNGKey(0), 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 333), jnp.float32)
    monkeypatch.setenv("ATSM_FAST_DCONV", "1")
    got = htdemucs.dconv_apply(p, x)
    monkeypatch.delenv("ATSM_FAST_DCONV")
    want = htdemucs.dconv_apply(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_fast_enc_layer_matches_default(monkeypatch):
    """Full HEncLayer forward with ATSM_FAST_ENC=1 == default (f32)."""
    p = htdemucs.henc_layer_init(jax.random.PRNGKey(0), 4, 48, freq=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 256, 8), jnp.float32)
    monkeypatch.delenv("ATSM_FAST_ENC", raising=False)
    want = htdemucs.henc_layer_apply(p, x, freq=True)
    monkeypatch.setenv("ATSM_FAST_ENC", "1")
    got = htdemucs.henc_layer_apply(p, x, freq=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fast_enc_full_tower_forward(monkeypatch):
    """ATSM_FAST_ENC=1 on the tiny full tower: same separation output
    (the deeper layers reject packing via supports() and stay exact)."""
    from audio_to_sheet_music_tpu.models import atht

    params = atht.init_tiny(jax.random.PRNGKey(0))
    wav = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (1, 2, 11025))
    emb = jax.random.normal(jax.random.PRNGKey(3), (1, 512))
    monkeypatch.delenv("ATSM_FAST_ENC", raising=False)
    want = atht.forward_with_text_emb(params, wav, emb, jnp.float32)
    monkeypatch.setenv("ATSM_FAST_ENC", "1")
    got = atht.forward_with_text_emb(params, wav, emb, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
