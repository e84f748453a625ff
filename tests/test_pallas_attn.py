"""Correctness of the fused attention-block Pallas kernel (interpret mode).

The kernel must match ``x + layer_scale(mha(q_in, kv_in, kv_in))`` — the
exact XLA path of the cross-domain transformer layers — including f32
softmax, torch Linear out-proj semantics, padded/masked key positions, and
the bf16 compute dtype used on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.nn import core as nn
from audio_to_sheet_music_tpu.nn.attention import mha, mha_init
from audio_to_sheet_music_tpu.ops import pallas_attn


def _ref_block(q, k, v, x, wo, bo, gamma, num_heads):
    """The exact math attn_block fuses, straight jnp."""
    import math

    dh = q.shape[-1] // num_heads

    def heads(t):
        b, l, e = t.shape
        return t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhld,bhsd->bhls", qh, kh) / math.sqrt(dh)
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
    out = jnp.einsum("bhls,bhsd->bhld", probs, vh)
    out = out.transpose(0, 2, 1, 3).reshape(*q.shape)
    out = out @ wo.astype(q.dtype).T + bo.astype(q.dtype)
    return x + gamma.astype(q.dtype) * out


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("l,s", [(256, 256), (100, 188), (128, 384)])
def test_attn_block_matches_reference(rng, l, s):
    d, heads = 128, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    b = 2
    q, k, v = _rand(ks[0], b, l, d), _rand(ks[1], b, s, d), _rand(ks[2], b, s, d)
    x = _rand(ks[3], b, l, d)
    wo = _rand(ks[4], d, d) * 0.1
    bo = _rand(ks[5], d) * 0.1
    gamma = _rand(ks[6], d) * 0.5

    got = pallas_attn.attn_block(q, k, v, x, wo, bo, gamma, heads,
                                 interpret=True)
    want = _ref_block(q, k, v, x, wo, bo, gamma, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_attn_block_bf16(rng):
    d, heads, b, l, s = 128, 2, 1, 192, 320
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    mk = lambda *sh: _rand(ks[len(sh)], *sh).astype(jnp.bfloat16)  # noqa: E731
    q, k, v = mk(b, l, d), mk(b, s, d), mk(b, s, d)
    x = mk(b, l, d)
    wo, bo, gamma = _rand(ks[4], d, d) * 0.1, _rand(ks[5], d) * 0.1, _rand(ks[6], d)

    got = pallas_attn.attn_block(q, k, v, x, wo, bo, gamma, heads,
                                 interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _ref_block(q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32), x.astype(jnp.float32),
                      wo, bo, gamma, heads)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=0.05, rtol=0.05)


@pytest.mark.parametrize("cross", [False, True])
def test_mha_residual_matches_layer_path(rng, cross):
    """The fused tail == x + layer_scale(mha(...)) on real mha params."""
    d, heads, b, l, s = 128, 2, 2, 96, 96 if not cross else 160
    p = mha_init(jax.random.PRNGKey(2), d)
    gamma = nn.layer_scale_init(d, 1e-2)
    gamma["scale"] = gamma["scale"] + 0.3   # non-trivial scale
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = _rand(ks[0], b, l, d)
    q_in = _rand(ks[1], b, l, d)
    kv_in = q_in if not cross else _rand(ks[2], b, s, d)

    got = pallas_attn.mha_residual(p, gamma, x, q_in, kv_in, heads,
                                   interpret=True)
    want = x + nn.layer_scale(gamma, mha(p, q_in, kv_in, kv_in, heads),
                              channel_last=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_supports():
    assert pallas_attn.supports(512, 8)
    assert not pallas_attn.supports(100, 2)     # not lane-aligned
    assert not pallas_attn.supports(128, 48)    # head_dim too small
    assert pallas_attn.supports_layer(512, 8, 2048)
    assert not pallas_attn.supports_layer(512, 8, 2000)  # FF not aligned


def test_fused_self_layer_matches_xla_layer(rng):
    """Full fused layer (Q-proj+attn+out-proj+LN+FF+residuals) + GroupNorm
    == htdemucs._self_layer_apply on the same params."""
    from audio_to_sheet_music_tpu.models import htdemucs as H

    d, heads, b, l, ff = 128, 2, 2, 200, 256
    p = H._transformer_layer_init(jax.random.PRNGKey(4), d, cross=False, ff=ff)
    p["gamma_1"]["scale"] = p["gamma_1"]["scale"] + 0.2
    p["gamma_2"]["scale"] = p["gamma_2"]["scale"] + 0.1
    x = _rand(jax.random.PRNGKey(5), b, l, d)

    want = H._self_layer_apply(p, x)
    pre = pallas_attn.fused_self_layer(p, x, heads, interpret=True)
    got = H._group_norm_tokens(p["norm_out"], pre)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_fused_cross_layer_matches_xla_layer(rng):
    from audio_to_sheet_music_tpu.models import htdemucs as H

    d, heads, b, l, s, ff = 128, 2, 2, 96, 224, 256
    p = H._transformer_layer_init(jax.random.PRNGKey(6), d, cross=True, ff=ff)
    p["gamma_1"]["scale"] = p["gamma_1"]["scale"] + 0.2
    p["gamma_2"]["scale"] = p["gamma_2"]["scale"] + 0.1
    q = _rand(jax.random.PRNGKey(7), b, l, d)
    mem = _rand(jax.random.PRNGKey(8), b, s, d)

    want = H._cross_layer_apply(p, q, mem)
    pre = pallas_attn.fused_cross_layer(p, q, mem, heads, interpret=True)
    got = H._group_norm_tokens(p["norm_out"], pre)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_fused_self_layer_bf16(rng):
    """bf16 compute dtype (the TPU path) stays within bf16 tolerance."""
    from audio_to_sheet_music_tpu.models import htdemucs as H

    d, heads, b, l, ff = 128, 2, 1, 160, 256
    p = H._transformer_layer_init(jax.random.PRNGKey(9), d, cross=False, ff=ff)
    p["gamma_1"]["scale"] = p["gamma_1"]["scale"] + 0.2
    p["gamma_2"]["scale"] = p["gamma_2"]["scale"] + 0.1
    x32 = _rand(jax.random.PRNGKey(10), b, l, d)
    x = x32.astype(jnp.bfloat16)

    want = H._self_layer_apply(p, x32)
    pre = pallas_attn.fused_self_layer(p, x, heads, interpret=True)
    assert pre.dtype == jnp.bfloat16
    got = H._group_norm_tokens(p["norm_out"], pre)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=0.05, rtol=0.05)


def test_pallas_layer_gate_tristate(monkeypatch):
    """Gate semantics: unset=auto (TPU only), 0=off everywhere, 1=force
    on any non-CPU backend."""
    from audio_to_sheet_music_tpu.models import htdemucs as H

    p = H._transformer_layer_init(jax.random.PRNGKey(0), 512, cross=False,
                                  ff=2048)

    def with_backend(name, env):
        if env is None:
            monkeypatch.delenv("ATSM_PALLAS_LAYER", raising=False)
        else:
            monkeypatch.setenv("ATSM_PALLAS_LAYER", env)
        monkeypatch.setattr(jax, "default_backend", lambda: name)
        return H._use_pallas_layer(p)

    assert with_backend("tpu", None) is True      # auto: default-on for TPU
    assert with_backend("cpu", None) is False     # auto: off for CPU
    assert with_backend("gpu", None) is False     # auto: TPU only
    assert with_backend("tpu", "0") is False      # kill switch
    assert with_backend("cpu", "1") is False      # force never covers CPU
    assert with_backend("gpu", "1") is True       # force covers non-CPU


def test_pallas_layer_gate_respects_supports(monkeypatch):
    """Auto mode still defers to supports_layer (odd dims stay on XLA)."""
    from audio_to_sheet_music_tpu.models import htdemucs as H

    monkeypatch.delenv("ATSM_PALLAS_LAYER", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    p = H._transformer_layer_init(jax.random.PRNGKey(0), 48, cross=False,
                                  ff=96)
    assert H._use_pallas_layer(p) is False
