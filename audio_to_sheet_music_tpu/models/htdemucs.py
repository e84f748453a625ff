"""HTDemucs (Hybrid Transformer Demucs) as pure-function JAX, TPU-first.

This re-implements the frozen 42 M-param tower the reference consumes from the
``demucs`` pip package (architecture pinned by the in-repo module dumps,
reference `src/models/stem_separation/AudioTextHTDemucs_Full.txt:4-628` and
shape trace `HTDemucs_Fwd_Pass.txt:1-156`):

- 4x frequency ``HEncLayer`` (Conv2d k=(8,1) s=(4,1), chans 4->48->96->192->384,
  1x1 rewrite + GLU, DConv residual branch) over the 2048-bin CaC spectrogram.
- 4x time ``HEncLayer`` (Conv1d k=8 s=4) over the stereo waveform.
- ``ScaledEmbedding(512, 48)`` frequency positional embedding after layer 0.
- Cross-domain transformer bottleneck: 384<->512 channel up/down samplers and
  5 layers per branch alternating self-attention (idx 0,2,4) and cross-branch
  attention (idx 1,3), pre-LN with LayerScale and a GroupNorm output norm.
- 4x frequency + 4x time ``HDecLayer`` (used by the HTDemucs baseline in the
  benchmark; the AudioTextHTDemucs model bypasses them, reference
  `ATHTDemucs_v2.py:190-236`).

Design: every module is ``(init, apply)`` pure-function pairs over explicit
param pytrees (torch weight layouts, see ``nn.core``), so the whole tower jits
into a single XLA program.  The DConv branches of the frequency layers fold
the frequency axis into the batch (``(B, C, F, T) -> (B*F, C, T)``) exactly as
the reference does — on TPU this turns many small convs into one large batched
conv that tiles onto the MXU.  All shapes are static at trace time.

Frozen-tower usage: wrap the encode/forward call in
``jax.lax.stop_gradient`` at the call site (the reference runs the encoder
under ``torch.no_grad()``, `ATHTDemucs_v2.py:277-279`).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..nn.attention import mha, mha_init
from ..ops import dsp

Params = Dict[str, Any]

# Architecture constants (AudioTextHTDemucs_Full.txt:4-466).
CHANNELS = [48, 96, 192, 384]
AUDIO_CHANNELS = 2
CAC_CHANNELS = 2 * AUDIO_CHANNELS          # complex-as-channels input: 4
KERNEL = 8
STRIDE = 4
DCONV_COMPRESS = 8                          # 48 -> 6 hidden (Full.txt:13)
DCONV_DEPTH = 2
DCONV_INIT = 1e-3                           # htdemucs dconv LayerScale init
FREQ_BINS = 2048
FREQ_EMB_DIM = 512                          # embedding rows (Full.txt:460-462)
FREQ_EMB_SCALE = 0.2
SCALED_EMB_SCALE = 10.0
BOTTOM_CHANNELS = 512
T_LAYERS = 5
T_HEADS = 8
T_FF = 2048
T_MAX_PERIOD = 10000.0
T_WEIGHT_POS_EMBED = 1.0
T_LAYER_SCALE_INIT = 1e-4
SOURCES = ["drums", "bass", "other", "vocals"]
NFFT = 4096
HOP = 1024
SAMPLE_RATE = 44100
DEFAULT_SEGMENT = 39 / 5                    # 7.8 s (htdemucs train segment)


# ---------------------------------------------------------------------------
# DConv — dilated compress-expand residual branch (Full.txt:10-31)
# ---------------------------------------------------------------------------

def dconv_init(key, channels: int) -> Params:
    hidden = channels // DCONV_COMPRESS
    layers = []
    for d in range(DCONV_DEPTH):
        key, k1, k2 = jax.random.split(key, 3)
        layers.append({
            "conv1": nn.conv1d_init(k1, channels, hidden, 3),
            "norm1": nn.norm_affine_init(hidden),
            "conv2": nn.conv1d_init(k2, hidden, 2 * channels, 1),
            "norm2": nn.norm_affine_init(2 * channels),
            "scale": nn.layer_scale_init(channels, DCONV_INIT),
        })
    return {"layers": layers}


def _use_fast_dconv() -> bool:
    """Opt-in time-packed dot lowering for the tile-starved DConv compress
    conv (``ATSM_FAST_DCONV=1``; N = C/8 = 6..48 underfills the MXU —
    docs/PERFORMANCE.md roofline)."""
    import os

    return os.environ.get("ATSM_FAST_DCONV") == "1"


def dconv_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, C, T).  Two residual dilated compress-expand blocks."""
    from ..ops import packed_conv

    fast = _use_fast_dconv()
    for d, blk in enumerate(p["layers"]):
        dilation = 2 ** d
        if fast and packed_conv.supports_time_pack(x.shape[1], x.shape[-1],
                                                   dilation):
            y = packed_conv.packed_time_conv(blk["conv1"], x, dilation)
        else:
            y = nn.conv1d(blk["conv1"], x, padding=dilation, dilation=dilation)
        y = nn.group_norm(blk["norm1"], y, 1)
        y = nn.gelu(y)
        y = nn.conv1d(blk["conv2"], y)
        y = nn.group_norm(blk["norm2"], y, 1)
        y = nn.glu(y, axis=1)
        y = nn.layer_scale(blk["scale"], y)
        x = x + y
    return x


# ---------------------------------------------------------------------------
# HEncLayer / HDecLayer
# ---------------------------------------------------------------------------

def henc_layer_init(key, chin: int, chout: int, freq: bool) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    if freq:
        conv = nn.conv2d_init(k1, chin, chout, (KERNEL, 1))
        rewrite = nn.conv2d_init(k2, chout, 2 * chout, (1, 1))
    else:
        conv = nn.conv1d_init(k1, chin, chout, KERNEL)
        rewrite = nn.conv1d_init(k2, chout, 2 * chout, 1)
    return {"conv": conv, "rewrite": rewrite, "dconv": dconv_init(k3, chout)}


def _use_pallas_dconv() -> bool:
    import os

    return os.environ.get("ATSM_PALLAS_DCONV") == "1"


def _dconv_freq(p: Params, y: jnp.ndarray) -> jnp.ndarray:
    """Run the 1-D DConv along time for every (batch, freq) row.

    Reference folds F into the batch (demucs ``HEncLayer.forward``); one big
    batched conv is the MXU-friendly layout.  With ``ATSM_PALLAS_DCONV=1``
    the folded rows run through the fused VMEM kernel
    (``ops.pallas_dconv``) instead of per-op XLA convs.
    """
    b, c, f, t = y.shape
    y = y.transpose(0, 2, 1, 3).reshape(b * f, c, t)
    if _use_pallas_dconv() and jax.default_backend() != "cpu":
        from ..ops import pallas_dconv

        if pallas_dconv.supports(b * f, t, c):
            y = pallas_dconv.dconv_rows(p, y)
        else:
            y = dconv_apply(p, y)
    else:
        y = dconv_apply(p, y)
    return y.reshape(b, f, c, t).transpose(0, 2, 1, 3)


def _use_fast_enc() -> bool:
    """Opt-in packed lowering for tile-starved shallow convs
    (``ATSM_FAST_ENC=1``; see ops/packed_conv.py and the A/B in
    scripts/profile_enc_ablate.py)."""
    import os

    return os.environ.get("ATSM_FAST_ENC") == "1"


# Process-wide veto for the fused encoder-layer kernel, set by the
# on-hardware parity gate (ops/kernel_gate.py) alongside the layer-kernel
# veto: on divergence the gate disables BOTH hand-written kernels.
_PALLAS_ENC_VETO: str | None = None


def veto_pallas_enc(reason: str) -> None:
    """Disable the fused encoder kernel for the rest of the process."""
    global _PALLAS_ENC_VETO
    _PALLAS_ENC_VETO = reason


def pallas_enc_vetoed() -> bool:
    return _PALLAS_ENC_VETO is not None


def _pallas_enc_mode() -> str | None:
    """Fused frequency HEncLayer kernel: strided conv + GELU + DConv +
    rewrite + GLU in one VMEM pass (ops/pallas_enc.py) — the round-4
    roofline's shallow-encoder fix, where repacking can't break XLA's
    surrounding fusion because the fusion lives inside the kernel.

    The kernel only *wins* at layer 0 (4->48, the most tile-starved conv:
    contraction depth 32); deeper layers measured slower than XLA's per-op
    fusion (table in docs/PERFORMANCE.md round 5), so the auto gate applies
    it to profitable layers only (``ops.pallas_enc.profitable``).

    ``ATSM_PALLAS_ENC``: unset = auto (profitable layers, TPU backend only);
    ``0`` = force the per-op XLA path; ``1`` = profitable layers on any
    non-CPU backend; ``all`` = every supported layer (the measured-negative
    experiment config, kept for A/B reproduction).  A parity veto overrides
    everything.  Returns ``None`` (off), ``"auto"`` or ``"all"``."""
    import os

    if _PALLAS_ENC_VETO is not None:
        return None
    v = os.environ.get("ATSM_PALLAS_ENC")
    if v == "0":
        return None
    if v == "all":
        return "all" if jax.default_backend() != "cpu" else None
    if v == "1":
        return "auto" if jax.default_backend() != "cpu" else None
    return "auto" if jax.default_backend() == "tpu" else None


def _use_pallas_enc() -> bool:
    """True when the fused encoder kernel would engage for profitable
    layers (the kernel_gate/test hook; see ``_pallas_enc_mode``)."""
    return _pallas_enc_mode() is not None


def henc_layer_apply(p: Params, x: jnp.ndarray, freq: bool,
                     inject: jnp.ndarray | None = None) -> jnp.ndarray:
    """HEncLayer: strided conv -> (+inject) -> GELU -> DConv -> rewrite+GLU."""
    if freq:
        from ..ops import packed_conv

        cin = x.shape[1]
        enc_mode = None if inject is not None else _pallas_enc_mode()
        if enc_mode is not None:
            from ..ops import pallas_enc

            cout = p["conv"]["weight"].shape[0]
            if (pallas_enc.supports(cin, cout, x.shape[2], x.shape[3])
                    and (enc_mode == "all" or pallas_enc.profitable(cin))):
                return pallas_enc.henc_freq_fused(p, x)
        if (_use_fast_enc()
                and packed_conv.supports(cin, KERNEL, STRIDE, x.shape[2],
                                         KERNEL // 4)):
            y = packed_conv.packed_freq_conv(p["conv"], x, KERNEL, STRIDE,
                                             KERNEL // 4)
        else:
            y = nn.conv2d(p["conv"], x, stride=(STRIDE, 1),
                          padding=(KERNEL // 4, 0))
    else:
        from ..ops import packed_conv

        t = x.shape[-1]
        if t % STRIDE != 0:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, STRIDE - t % STRIDE)])
        if (_use_fast_enc()
                and packed_conv.supports_time_stride(
                    x.shape[1], KERNEL, STRIDE, x.shape[-1], KERNEL // 4)):
            y = packed_conv.packed_time_stride_conv(p["conv"], x, KERNEL,
                                                    STRIDE, KERNEL // 4)
        else:
            y = nn.conv1d(p["conv"], x, stride=STRIDE, padding=KERNEL // 4)
    if inject is not None:
        if inject.ndim == 3 and y.ndim == 4:
            inject = inject[:, :, None]
        y = y + inject
    y = nn.gelu(y)
    y = _dconv_freq(p["dconv"], y) if freq else dconv_apply(p["dconv"], y)
    z = nn.conv2d(p["rewrite"], y) if freq else nn.conv1d(p["rewrite"], y)
    return nn.glu(z, axis=1)


def hdec_layer_init(key, chin: int, chout: int, freq: bool) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    if freq:
        conv_tr = nn.conv_transpose2d_init(k1, chin, chout, (KERNEL, 1))
        rewrite = nn.conv2d_init(k2, chin, 2 * chin, (3, 3))
    else:
        conv_tr = nn.conv_transpose1d_init(k1, chin, chout, KERNEL)
        rewrite = nn.conv1d_init(k2, chin, 2 * chin, 3)
    return {"conv_tr": conv_tr, "rewrite": rewrite, "dconv": dconv_init(k3, chin)}


def hdec_layer_apply(p: Params, x: jnp.ndarray, skip: jnp.ndarray,
                     length: int, freq: bool, last: bool
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HDecLayer: +skip -> rewrite+GLU -> DConv -> convT -> crop -> GELU.

    Returns ``(z, pre)`` like the reference (``pre`` feeds empty time layers
    in deeper variants; unused by the 4-layer model but kept for parity).
    """
    x = x + skip
    if freq:
        y = nn.glu(nn.conv2d(p["rewrite"], x, padding=(1, 1)), axis=1)
        y = _dconv_freq(p["dconv"], y)
        z = nn.conv_transpose2d(p["conv_tr"], y, stride=(STRIDE, 1))
        pad = (KERNEL - STRIDE) // 2
        z = z[..., pad:-pad, :]
    else:
        y = nn.glu(nn.conv1d(p["rewrite"], x, padding=1), axis=1)
        y = dconv_apply(p["dconv"], y)
        z = nn.conv_transpose1d(p["conv_tr"], y, stride=STRIDE)
        pad = (KERNEL - STRIDE) // 2
        z = z[..., pad:pad + length]
    if not last:
        z = nn.gelu(z)
    return z, y


# ---------------------------------------------------------------------------
# Positional embeddings (demucs transformer sin embeddings)
# ---------------------------------------------------------------------------

def create_sin_embedding(length: int, dim: int,
                         max_period: float = T_MAX_PERIOD) -> jnp.ndarray:
    """1-D sin embedding, ``(length, dim)`` = concat[cos(phase), sin(phase)]."""
    assert dim % 2 == 0
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    half = dim // 2
    adim = jnp.arange(half, dtype=jnp.float32)[None, :]
    phase = pos / (max_period ** (adim / (half - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def create_2d_sin_embedding(d_model: int, height: int, width: int,
                            max_period: float = T_MAX_PERIOD) -> jnp.ndarray:
    """2-D sin embedding ``(d_model, height, width)``.

    First half of channels encodes width (time), interleaved sin/cos; second
    half encodes height (frequency) the same way.
    """
    assert d_model % 4 == 0
    half = d_model // 2
    div_term = jnp.exp(jnp.arange(0.0, half, 2.0) * -(math.log(max_period) / half))
    pos_w = jnp.arange(width, dtype=jnp.float32)[:, None]   # (W, half/2)
    pos_h = jnp.arange(height, dtype=jnp.float32)[:, None]  # (H, half/2)
    sin_w = jnp.sin(pos_w * div_term).T                      # (half/2, W)
    cos_w = jnp.cos(pos_w * div_term).T
    sin_h = jnp.sin(pos_h * div_term).T                      # (half/2, H)
    cos_h = jnp.cos(pos_h * div_term).T
    pe = jnp.zeros((d_model, height, width), jnp.float32)
    pe = pe.at[0:half:2].set(jnp.broadcast_to(sin_w[:, None, :], (half // 2, height, width)))
    pe = pe.at[1:half:2].set(jnp.broadcast_to(cos_w[:, None, :], (half // 2, height, width)))
    pe = pe.at[half::2].set(jnp.broadcast_to(sin_h[:, :, None], (half // 2, height, width)))
    pe = pe.at[half + 1::2].set(jnp.broadcast_to(cos_h[:, :, None], (half // 2, height, width)))
    return pe


# ---------------------------------------------------------------------------
# Cross-domain transformer (Full.txt:467-628)
# ---------------------------------------------------------------------------

def _transformer_layer_init(key, dim: int, cross: bool, ff: int = T_FF) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        ("cross_attn" if cross else "self_attn"): mha_init(k1, dim),
        "linear1": nn.linear_init(k2, dim, ff),
        "linear2": nn.linear_init(k3, ff, dim),
        "norm1": nn.norm_affine_init(dim),
        "norm2": nn.norm_affine_init(dim),
        "norm_out": nn.norm_affine_init(dim),
        "gamma_1": nn.layer_scale_init(dim, T_LAYER_SCALE_INIT),
        "gamma_2": nn.layer_scale_init(dim, T_LAYER_SCALE_INIT),
    }
    if cross:
        p["norm3"] = nn.norm_affine_init(dim)
    return p


def _ff(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return nn.linear(p["linear2"], nn.gelu(nn.linear(p["linear1"], x)))


def _n_heads(dim: int) -> int:
    """Head count by the head_dim=64 convention (512/8 for the reference
    tower); keeps tiny test configurations consistent without threading a
    static argument through every caller."""
    return max(1, dim // 64)


def _group_norm_tokens(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """MyGroupNorm(1, C) over a (B, L, C) token stream: stats over (L, C)."""
    return nn.group_norm(p, x.transpose(0, 2, 1), 1).transpose(0, 2, 1)


def _use_pallas_attn(dim: int) -> bool:
    """Opt-in fused attention-block kernel (``ATSM_PALLAS_ATTN=1``, TPU
    only): keeps scores/softmax/AV/out-proj/residual on-chip instead of
    round-tripping the (B, H, L, S) score matrix through HBM."""
    import os

    if os.environ.get("ATSM_PALLAS_ATTN") != "1":
        return False
    if jax.default_backend() == "cpu":
        return False
    from ..ops import pallas_attn

    return pallas_attn.supports(dim, _n_heads(dim))


# Process-wide kernel veto, set by the on-hardware parity gate
# (ops/kernel_gate.py) when the fused layer kernel diverges from the per-op
# path on the live backend: serving a ~7% slower forward beats serving
# corrupt stems.  Read at trace time by ``_use_pallas_layer``; the gate runs
# before any production program traces (Separator/bench construction).
_PALLAS_LAYER_VETO: str | None = None


def veto_pallas_layer(reason: str) -> None:
    """Disable the fused layer kernel for the rest of the process."""
    global _PALLAS_LAYER_VETO
    _PALLAS_LAYER_VETO = reason


def pallas_layer_vetoed() -> bool:
    return _PALLAS_LAYER_VETO is not None


def _use_pallas_layer(p: Params) -> bool:
    """Fully fused layer kernel: Q-proj + attention + out-proj + LayerScale
    + residual + LN + FF in one VMEM pass (ops/pallas_attn.py:layer_tail).
    Subsumes — and takes precedence over — ``ATSM_PALLAS_ATTN``.

    Tri-state ``ATSM_PALLAS_LAYER``: unset = auto (ON for the TPU backend —
    a measured +7% forward win with bf16-rounding-grade output delta,
    docs/PERFORMANCE.md round 4); ``0`` = force the per-op XLA path
    everywhere; ``1`` = force the kernel on any non-CPU backend.  A parity
    veto (``veto_pallas_layer``) overrides everything, including ``1``."""
    import os

    if _PALLAS_LAYER_VETO is not None:
        return False
    v = os.environ.get("ATSM_PALLAS_LAYER")
    if v == "0":
        return False
    if v == "1":
        if jax.default_backend() == "cpu":
            return False
    elif jax.default_backend() != "tpu":
        return False
    from ..ops import pallas_attn

    dim = p["linear1"]["weight"].shape[1]
    ff = p["linear1"]["weight"].shape[0]
    return pallas_attn.supports_layer(dim, _n_heads(dim), ff)


def _attn_residual(p: Params, attn_key: str, x_res: jnp.ndarray,
                   q_in: jnp.ndarray, kv_in: jnp.ndarray) -> jnp.ndarray:
    """``x_res + LayerScale(MHA(q_in, kv_in, kv_in))`` — XLA or fused."""
    heads = _n_heads(x_res.shape[-1])
    if _use_pallas_attn(x_res.shape[-1]):
        from ..ops import pallas_attn

        return pallas_attn.mha_residual(p[attn_key], p["gamma_1"], x_res,
                                        q_in, kv_in, heads)
    return x_res + nn.layer_scale(
        p["gamma_1"], mha(p[attn_key], q_in, kv_in, kv_in, heads),
        channel_last=True)


def _self_layer_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Pre-LN self-attention layer with LayerScale + GroupNorm out."""
    if _use_pallas_layer(p):
        from ..ops import pallas_attn

        y = pallas_attn.fused_self_layer(p, x, _n_heads(x.shape[-1]))
        return _group_norm_tokens(p["norm_out"], y)
    h = nn.layer_norm(p["norm1"], x)
    x = _attn_residual(p, "self_attn", x, h, h)
    x = x + nn.layer_scale(p["gamma_2"], _ff(p, nn.layer_norm(p["norm2"], x)),
                           channel_last=True)
    return _group_norm_tokens(p["norm_out"], x)


def _cross_layer_apply(p: Params, q: jnp.ndarray, mem: jnp.ndarray) -> jnp.ndarray:
    """Pre-LN cross-attention layer: q attends to the other branch."""
    if _use_pallas_layer(p):
        from ..ops import pallas_attn

        y = pallas_attn.fused_cross_layer(p, q, mem, _n_heads(q.shape[-1]))
        return _group_norm_tokens(p["norm_out"], y)
    qn = nn.layer_norm(p["norm1"], q)
    mn = nn.layer_norm(p["norm2"], mem)
    x = _attn_residual(p, "cross_attn", q, qn, mn)
    x = x + nn.layer_scale(p["gamma_2"], _ff(p, nn.layer_norm(p["norm3"], x)),
                           channel_last=True)
    return _group_norm_tokens(p["norm_out"], x)


def crosstransformer_init(key, dim: int = BOTTOM_CHANNELS,
                          n_layers: int = T_LAYERS,
                          ff: int | None = None) -> Params:
    ff = ff if ff is not None else 4 * dim
    keys = jax.random.split(key, 2 * n_layers)
    layers, layers_t = [], []
    for idx in range(n_layers):
        cross = idx % 2 == 1
        layers.append(_transformer_layer_init(keys[2 * idx], dim, cross, ff))
        layers_t.append(_transformer_layer_init(keys[2 * idx + 1], dim, cross, ff))
    return {
        "norm_in": nn.norm_affine_init(dim),
        "norm_in_t": nn.norm_affine_init(dim),
        "layers": layers,
        "layers_t": layers_t,
    }


def crosstransformer_apply(p: Params, x: jnp.ndarray, xt: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, C, Fr, T1) freq branch; xt: (B, C, T2) time branch.

    Tokenises both branches (freq tokens t-major: ``b c f t -> b (t f) c``),
    adds sin positional embeddings after the input LayerNorm, then alternates
    self (idx 0,2,4) and cross (idx 1,3) layers.
    """
    b, c, fr, t1 = x.shape
    pos2d = create_2d_sin_embedding(c, fr, t1)               # (C, Fr, T1)
    pos2d = pos2d.transpose(2, 1, 0).reshape(t1 * fr, c)     # (t f) major
    xs = x.transpose(0, 3, 2, 1).reshape(b, t1 * fr, c)      # b (t f) c
    xs = nn.layer_norm(p["norm_in"], xs)
    xs = xs + T_WEIGHT_POS_EMBED * pos2d.astype(xs.dtype)

    t2 = xt.shape[-1]
    pos1d = create_sin_embedding(t2, c)
    xts = xt.transpose(0, 2, 1)                              # b t c
    xts = nn.layer_norm(p["norm_in_t"], xts)
    xts = xts + T_WEIGHT_POS_EMBED * pos1d.astype(xts.dtype)

    for lp, ltp in zip(p["layers"], p["layers_t"]):
        if "self_attn" in lp:
            xs = _self_layer_apply(lp, xs)
            xts = _self_layer_apply(ltp, xts)
        else:
            old = xs
            xs = _cross_layer_apply(lp, xs, xts)
            xts = _cross_layer_apply(ltp, xts, old)

    x = xs.reshape(b, t1, fr, c).transpose(0, 3, 2, 1)
    xt = xts.transpose(0, 2, 1)
    return x, xt


# ---------------------------------------------------------------------------
# Full tower
# ---------------------------------------------------------------------------

def htdemucs_init(key, channels=tuple(CHANNELS),
                  bottom_channels: int = BOTTOM_CHANNELS,
                  t_layers: int = T_LAYERS) -> Params:
    """Random-init params with the pretrained-tower shapes (defaults).

    The published checkpoint is loaded over the default structure by
    ``convert.torch_import``.  Non-default ``channels`` / ``bottom_channels``
    / ``t_layers`` build smaller family members (e.g. test-sized towers);
    the depth stays 4 (the 2048-bin -> 8-bin stride-4 ladder).
    """
    channels = list(channels)
    n = len(channels)
    keys = jax.random.split(key, 4 * n + 7)
    ki = iter(keys)
    enc, tenc, dec, tdec = [], [], [], []
    chin_f, chin_t = CAC_CHANNELS, AUDIO_CHANNELS
    for ch in channels:
        enc.append(henc_layer_init(next(ki), chin_f, ch, freq=True))
        tenc.append(henc_layer_init(next(ki), chin_t, ch, freq=False))
        chin_f, chin_t = ch, ch
    n_src = len(SOURCES)
    douts_f = channels[-2::-1] + [n_src * CAC_CHANNELS]
    douts_t = channels[-2::-1] + [n_src * AUDIO_CHANNELS]
    dins = channels[::-1]
    for i in range(n):
        dec.append(hdec_layer_init(next(ki), dins[i], douts_f[i], freq=True))
        tdec.append(hdec_layer_init(next(ki), dins[i], douts_t[i], freq=False))
    # ScaledEmbedding(512, 48) with smooth=True init: cumsum of normals
    # down-weighted by sqrt(row+1), pre-divided by the output scale.
    w = jax.random.normal(next(ki), (FREQ_EMB_DIM, channels[0]), jnp.float32)
    w = jnp.cumsum(w, axis=0) / jnp.sqrt(jnp.arange(1, FREQ_EMB_DIM + 1, dtype=jnp.float32))[:, None]
    w = w / SCALED_EMB_SCALE
    return {
        "encoder": enc,
        "tencoder": tenc,
        "decoder": dec,
        "tdecoder": tdec,
        "freq_emb": {"embedding": {"weight": w}},
        "channel_upsampler": nn.conv1d_init(next(ki), channels[-1], bottom_channels, 1),
        "channel_downsampler": nn.conv1d_init(next(ki), bottom_channels, channels[-1], 1),
        "channel_upsampler_t": nn.conv1d_init(next(ki), channels[-1], bottom_channels, 1),
        "channel_downsampler_t": nn.conv1d_init(next(ki), bottom_channels, channels[-1], 1),
        "crosstransformer": crosstransformer_init(next(ki), bottom_channels,
                                                  t_layers),
    }


def _std(x: jnp.ndarray, axis, keepdims=True) -> jnp.ndarray:
    """torch ``Tensor.std`` parity: unbiased (ddof=1)."""
    return jnp.std(x.astype(jnp.float32), axis=axis, keepdims=keepdims, ddof=1)


def normalize_inputs(mix: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Spectral + waveform normalisation (reference `ATHTDemucs_v2.py:260-275`).

    Returns ``(z, mag, x, xt, mean, std, meant, stdt)`` where ``x`` is the
    normalised CaC spectrogram and ``xt`` the normalised waveform.
    """
    z = dsp.spec(mix, NFFT, HOP)                       # (B, 2, 2048, T) complex
    mag = dsp.magnitude_cac(z)                          # (B, 4, 2048, T)
    mean = jnp.mean(mag.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
    std = _std(mag, (1, 2, 3))
    x = (mag - mean) / (1e-5 + std)
    meant = jnp.mean(mix.astype(jnp.float32), axis=(1, 2), keepdims=True)
    stdt = _std(mix, (1, 2))
    xt = (mix - meant) / (1e-5 + stdt)
    return z, mag, x, xt, mean, std, meant, stdt


def encode(p: Params, x: jnp.ndarray, xt: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray, List[jnp.ndarray],
                      List[jnp.ndarray], List[int], List[int]]:
    """Encoder replay contract (reference `ATHTDemucs_v2.py:190-236`).

    x: (B, 4, 2048, T) normalised CaC spectrogram; xt: (B, 2, T) waveform.
    Returns bottleneck features after the cross-transformer plus per-layer
    skips and lengths for the decoders.
    """
    saved, saved_t, lengths, lengths_t = [], [], [], []
    for idx in range(len(p["encoder"])):
        lengths.append(x.shape[-1])
        lengths_t.append(xt.shape[-1])
        xt = henc_layer_apply(p["tencoder"][idx], xt, freq=False)
        saved_t.append(xt)
        x = henc_layer_apply(p["encoder"][idx], x, freq=True)
        if idx == 0:
            frs = jnp.arange(x.shape[-2])
            emb = nn.embedding(p["freq_emb"]["embedding"], frs) * SCALED_EMB_SCALE
            x = x + FREQ_EMB_SCALE * emb.T[None, :, :, None].astype(x.dtype)
        saved.append(x)

    b, c, f, t = x.shape
    x = nn.conv1d(p["channel_upsampler"], x.reshape(b, c, f * t)).reshape(b, -1, f, t)
    xt = nn.conv1d(p["channel_upsampler_t"], xt)
    x, xt = crosstransformer_apply(p["crosstransformer"], x, xt)
    b, c2, f, t = x.shape
    x = nn.conv1d(p["channel_downsampler"], x.reshape(b, c2, f * t)).reshape(b, -1, f, t)
    xt = nn.conv1d(p["channel_downsampler_t"], xt)
    return x, xt, saved, saved_t, lengths, lengths_t


def forward(p: Params, mix: jnp.ndarray,
            compute_dtype=None) -> jnp.ndarray:
    """Full frozen HTDemucs: ``(B, 2, T) -> (B, 4 sources, 2, T)``.

    Used by the benchmark's HTDemucs baseline (reference `benchmark.py:222-266`
    runs this via ``demucs.apply_model``).  ``compute_dtype`` (e.g. bf16 on
    TPU) casts the tower inputs after the f32 DSP front-end, mirroring
    ``atht.encode_mixture``; the DSP/normalisation stays f32 either way.
    """
    length = mix.shape[-1]
    z, mag, x, xt, mean, std, meant, stdt = normalize_inputs(mix)
    b, _, fq, tspec = x.shape

    if compute_dtype is not None:
        x, xt = x.astype(compute_dtype), xt.astype(compute_dtype)
    x, xt, saved, saved_t, lengths, lengths_t = encode(p, x, xt)

    n_layers = len(p["decoder"])
    for idx in range(n_layers):
        last = idx == n_layers - 1
        x, _ = hdec_layer_apply(p["decoder"][idx], x, saved.pop(), lengths.pop(),
                                freq=True, last=last)
        xt, _ = hdec_layer_apply(p["tdecoder"][idx], xt, saved_t.pop(),
                                 lengths_t.pop(), freq=False, last=last)

    n_src = len(SOURCES)
    x = x.reshape(b, n_src, CAC_CHANNELS, fq, tspec)
    x = x * std[:, None] + mean[:, None]
    zout = dsp.mask_cac(x)                              # (B, S, 2, Fq, T) complex
    wav_f = dsp.ispec(zout, length, NFFT, HOP)          # (B, S, 2, length)

    xt = xt.reshape(b, n_src, AUDIO_CHANNELS, length)
    xt = xt * stdt[:, None] + meant[:, None]
    return (wav_f + xt).astype(mix.dtype)
