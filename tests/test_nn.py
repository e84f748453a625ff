"""Primitive parity vs torch: conv/convtranspose/norms/MHA/GELU/interpolate."""

import numpy as np
import torch

import jax.numpy as jnp

from audio_to_sheet_music_tpu import nn as jnn

ATOL = 2e-5


def to_j(params_torch):
    """torch module state_dict -> our param dict (same names/layouts)."""
    out = {}
    for name, t in params_torch.items():
        node = out
        parts = name.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(t.detach().numpy())
    return out


def test_linear(rng):
    m = torch.nn.Linear(16, 24)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    ref = m(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(jnn.linear(to_j(m.state_dict()), jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_conv1d(rng):
    m = torch.nn.Conv1d(4, 8, 8, stride=4, padding=2)
    x = rng.standard_normal((2, 4, 64)).astype(np.float32)
    ref = m(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(jnn.conv1d(to_j(m.state_dict()), jnp.asarray(x), 4, 2))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_conv1d_dilated(rng):
    m = torch.nn.Conv1d(6, 12, 3, padding=2, dilation=2)
    x = rng.standard_normal((1, 6, 50)).astype(np.float32)
    ref = m(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(jnn.conv1d(to_j(m.state_dict()), jnp.asarray(x), 1, 2, 2))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_conv2d(rng):
    m = torch.nn.Conv2d(4, 8, (8, 1), stride=(4, 1), padding=(2, 0))
    x = rng.standard_normal((2, 4, 64, 6)).astype(np.float32)
    ref = m(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(jnn.conv2d(to_j(m.state_dict()), jnp.asarray(x), (4, 1), (2, 0)))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_conv_transpose1d(rng):
    m = torch.nn.ConvTranspose1d(8, 4, 8, stride=4, padding=2)
    x = rng.standard_normal((2, 8, 16)).astype(np.float32)
    ref = m(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(jnn.conv_transpose1d(to_j(m.state_dict()), jnp.asarray(x), 4, 2))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_conv_transpose1d_nopad(rng):
    m = torch.nn.ConvTranspose1d(8, 4, 8, stride=4)
    x = rng.standard_normal((2, 8, 16)).astype(np.float32)
    ref = m(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(jnn.conv_transpose1d(to_j(m.state_dict()), jnp.asarray(x), 4, 0))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_conv_transpose2d(rng):
    m = torch.nn.ConvTranspose2d(8, 4, (8, 1), stride=(4, 1), padding=(2, 0))
    x = rng.standard_normal((2, 8, 16, 5)).astype(np.float32)
    ref = m(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(
        jnn.conv_transpose2d(to_j(m.state_dict()), jnp.asarray(x), (4, 1), (2, 0))
    )
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_group_norm(rng):
    m = torch.nn.GroupNorm(1, 12)
    with torch.no_grad():
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    x = rng.standard_normal((2, 12, 30)).astype(np.float32)
    ref = m(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(jnn.group_norm(to_j(m.state_dict()), jnp.asarray(x), 1))
    np.testing.assert_allclose(ours, ref, atol=ATOL)
    # 2-D spatial case
    x2 = rng.standard_normal((2, 12, 8, 5)).astype(np.float32)
    ref2 = m(torch.from_numpy(x2)).detach().numpy()
    ours2 = np.asarray(jnn.group_norm(to_j(m.state_dict()), jnp.asarray(x2), 1))
    np.testing.assert_allclose(ours2, ref2, atol=ATOL)


def test_layer_norm(rng):
    m = torch.nn.LayerNorm(20)
    with torch.no_grad():
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    x = rng.standard_normal((2, 7, 20)).astype(np.float32)
    ref = m(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(jnn.layer_norm(to_j(m.state_dict()), jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_gelu_glu(rng):
    x = rng.standard_normal((4, 8, 10)).astype(np.float32)
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(jnn.gelu(jnp.asarray(x))), ref, atol=ATOL)
    ref_glu = torch.nn.functional.glu(torch.from_numpy(x), dim=1).numpy()
    np.testing.assert_allclose(
        np.asarray(jnn.glu(jnp.asarray(x), axis=1)), ref_glu, atol=ATOL
    )


def test_mha_self(rng):
    m = torch.nn.MultiheadAttention(32, 4, batch_first=True)
    x = rng.standard_normal((2, 9, 32)).astype(np.float32)
    xt = torch.from_numpy(x)
    ref, _ = m(xt, xt, xt)
    ours = np.asarray(
        jnn.self_attention(to_j(m.state_dict()), jnp.asarray(x), 4)
    )
    np.testing.assert_allclose(ours, ref.detach().numpy(), atol=1e-4)


def test_mha_cross(rng):
    m = torch.nn.MultiheadAttention(32, 8, batch_first=True)
    q = rng.standard_normal((2, 9, 32)).astype(np.float32)
    kv = rng.standard_normal((2, 1, 32)).astype(np.float32)
    ref, _ = m(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))
    ours = np.asarray(
        jnn.mha(to_j(m.state_dict()), jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv), 8)
    )
    np.testing.assert_allclose(ours, ref.detach().numpy(), atol=1e-4)


def test_interpolate_linear(rng):
    x = rng.standard_normal((2, 3, 17)).astype(np.float32)
    for size in [9, 23, 34]:
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=size, mode="linear", align_corners=False
        ).numpy()
        ours = np.asarray(jnn.interpolate_linear(jnp.asarray(x), size))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_interpolate_linear_integer_decimation(rng):
    # exact integer downsample factors hit the strided-slice fast path
    # (even s -> 2-tap 0.5/0.5 blend, odd s -> pure slice)
    x = rng.standard_normal((2, 3, 24)).astype(np.float32)
    for size in [12, 8, 6]:   # s = 2, 3, 4
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=size, mode="linear", align_corners=False
        ).numpy()
        ours = np.asarray(jnn.interpolate_linear(jnp.asarray(x), size))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_interpolate_bilinear(rng):
    x = rng.standard_normal((2, 3, 9, 7)).astype(np.float32)
    for size in [(18, 7), (5, 13), (36, 28)]:
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=size, mode="bilinear", align_corners=False
        ).numpy()
        ours = np.asarray(jnn.interpolate_bilinear(jnp.asarray(x), size))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_embedding(rng):
    m = torch.nn.Embedding(10, 6)
    idx = np.array([1, 3, 9])
    ref = m(torch.from_numpy(idx)).detach().numpy()
    ours = np.asarray(jnn.embedding(to_j(m.state_dict()), jnp.asarray(idx)))
    np.testing.assert_allclose(ours, ref, atol=ATOL)


class TestSubpixelConvTranspose:
    """Sub-pixel phase path == input-dilated path == torch (exact identity)."""

    def test_1d_matches_torch(self, rng):
        import torch

        from audio_to_sheet_music_tpu.nn import core as nn_core

        x = rng.standard_normal((2, 6, 37)).astype(np.float32)
        w = rng.standard_normal((6, 5, 8)).astype(np.float32)
        b = rng.standard_normal(5).astype(np.float32)
        p = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
        ours = np.asarray(nn_core.conv_transpose1d(p, jnp.asarray(x),
                                                   stride=4, padding=2))
        ref = torch.nn.functional.conv_transpose1d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b),
            stride=4, padding=2).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_2d_matches_torch(self, rng):
        import torch

        from audio_to_sheet_music_tpu.nn import core as nn_core

        x = rng.standard_normal((2, 6, 19, 11)).astype(np.float32)
        w = rng.standard_normal((6, 5, 8, 1)).astype(np.float32)
        p = {"weight": jnp.asarray(w)}
        ours = np.asarray(nn_core.conv_transpose2d(p, jnp.asarray(x),
                                                   stride=(4, 1),
                                                   padding=(2, 0)))
        ref = torch.nn.functional.conv_transpose2d(
            torch.tensor(x), torch.tensor(w),
            stride=(4, 1), padding=(2, 0)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_1d_taps1_and_fallback(self, rng):
        import torch

        from audio_to_sheet_music_tpu.nn import core as nn_core

        for k, s, pad in [(4, 4, 1), (5, 4, 2), (8, 4, 0)]:
            x = rng.standard_normal((1, 3, 23)).astype(np.float32)
            w = rng.standard_normal((3, 2, k)).astype(np.float32)
            p = {"weight": jnp.asarray(w)}
            ours = np.asarray(nn_core.conv_transpose1d(p, jnp.asarray(x),
                                                       stride=s, padding=pad))
            ref = torch.nn.functional.conv_transpose1d(
                torch.tensor(x), torch.tensor(w), stride=s,
                padding=pad).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=f"k={k}")


def test_conv_transpose_init_matches_torch_fan_in():
    """torch ConvTranspose fan_in = out_ch * receptive field (weight dim 1),
    not in_ch * k — random-init training parity for the decoders."""
    import math

    import jax

    p = jnn.conv_transpose1d_init(jax.random.PRNGKey(0), 384, 192, 8)
    bound = 1.0 / math.sqrt(192 * 8)
    m = float(jnp.abs(p["weight"]).max())
    assert 0.9 * bound < m <= bound
    ref = torch.nn.ConvTranspose1d(384, 192, 8)
    assert abs(float(ref.weight.abs().max()) - m) < 0.2 * bound

    from audio_to_sheet_music_tpu.nn.attention import mha_init
    pa = mha_init(jax.random.PRNGKey(1), 384)
    bound_x = math.sqrt(6.0 / (4 * 384))
    mx = float(jnp.abs(pa["in_proj_weight"]).max())
    assert 0.9 * bound_x < mx <= bound_x
    tref = torch.nn.MultiheadAttention(384, 8)
    assert abs(float(tref.in_proj_weight.abs().max()) - mx) < 0.2 * bound_x


def test_conv_transpose2d_width_padding_fast_path():
    """The (K,1)-kernel sub-pixel fast path must honor padding[1] like
    torch (out_w = W - 2*pw when kw == 1, sw == 1)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, 64, 10)).astype(np.float32)
    m = torch.nn.ConvTranspose2d(2, 2, (8, 1), stride=(4, 1), padding=(2, 1))
    p = {"weight": jnp.asarray(m.weight.detach().numpy()),
         "bias": jnp.asarray(m.bias.detach().numpy())}
    ours = np.asarray(jnn.conv_transpose2d(p, jnp.asarray(x),
                                           stride=(4, 1), padding=(2, 1)))
    ref = m(torch.from_numpy(x)).detach().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)
