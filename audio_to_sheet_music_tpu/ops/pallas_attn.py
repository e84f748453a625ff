"""Fused attention-block Pallas kernel for the cross-domain transformer.

Motivation (docs/PERFORMANCE.md "dead ends" + roofline): the transformer's
dim-512 matmuls run at ~16-27% MXU utilisation under XLA, and the dominant
*traffic* term is the materialised score matrix — XLA cannot fuse two dots
through a softmax, so each layer writes + reads ``(B, H, L, S)`` f32 scores
through HBM (~5.5 GB for the 12-chunk freq branch at L=S=2688).  Stock
flash attention measured slower here (small-L overheads); this kernel keeps
the *whole tail* of the attention block on-chip instead:

    scores -> softmax -> @V -> concat heads -> out-proj -> LayerScale
    -> +residual

in one VMEM-resident pass per (batch row, 128-row query tile).  K and V
stay resident across query tiles of the same batch row (their block index
does not change, so Mosaic does not re-fetch).  The QKV projections and the
FF block stay in XLA — single fused LN+matmul programs XLA already runs
near the conv roofline.

The attention-block kernel is opt-in via ``ATSM_PALLAS_ATTN=1``; the fully
fused *layer* kernel (``layer_tail`` / ``fused_self_layer`` /
``fused_cross_layer``) is the measured round-4 winner (+7% forward on the
real chip, scripts/bench_forward_loop.py) and is ON BY DEFAULT on the TPU
backend — tri-state ``ATSM_PALLAS_LAYER`` (unset=auto, 0=off, 1=force; see
``models.htdemucs._use_pallas_layer``).  Matches
``nn.attention.mha`` + LayerScale + residual semantics bit-for-bit in
structure: softmax in f32, bf16 MXU operands, per-head scale 1/sqrt(dh).

Reference contract: the reference runs torch ``nn.MultiheadAttention``
inside ``MyTransformerEncoderLayer`` (demucs transformer, reference module
dump `AudioTextHTDemucs_Full.txt:467-628`); this kernel is a TPU-native
fusion of the same math, not a translation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Query rows per grid step (MXU-aligned).  Env-tunable for A/B sweeps
# (`ATSM_PALLAS_QT`, read once at import): 128 measured best at the
# production shapes (scripts/bench_pallas_attn.py --sweep-qt).
QT = int(_os.environ.get("ATSM_PALLAS_QT", "128"))
LANE = 128        # last-dim tile


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _attn_kernel(q_ref, k_ref, v_ref, x_ref, wo_ref, bo_ref, g_ref, o_ref,
                 *, num_heads: int, s_true: int, scale: float):
    """One (batch row, query tile) step.

    q_ref  (1, QT, D)   bf16 — query tile
    k_ref  (1, S, D)    bf16 — full keys for this batch row (resident)
    v_ref  (1, S, D)    bf16
    x_ref  (1, QT, D)   bf16 — residual input tile
    wo_ref (D, D)       bf16 — out_proj.weight (torch layout: y = h @ W.T)
    bo_ref (1, D)       f32
    g_ref  (1, D)       f32  — LayerScale gamma
    o_ref  (1, QT, D)   bf16 — x + gamma * (attn @ W.T + b)
    """
    d = q_ref.shape[-1]
    dh = d // num_heads
    s_pad = k_ref.shape[1]
    q = q_ref[0]                                   # (QT, D)
    k = k_ref[0]                                   # (S, D)
    v = v_ref[0]

    # Padded key positions must not receive probability mass.
    col = jax.lax.broadcasted_iota(jnp.int32, (QT, s_pad), 1)
    neg = jnp.float32(-1e30)

    heads = []
    for h in range(num_heads):
        qh = q[:, h * dh:(h + 1) * dh]             # (QT, dh)
        kh = k[:, h * dh:(h + 1) * dh]             # (S, dh)
        vh = v[:, h * dh:(h + 1) * dh]
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(col < s_true, scores, neg)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        heads.append(jnp.dot(probs.astype(q.dtype), vh,
                             preferred_element_type=jnp.float32))
    attn = jnp.concatenate(heads, axis=-1)         # (QT, D) f32
    # out-proj (torch Linear: y = h @ W.T + b) + LayerScale + residual
    out = jax.lax.dot_general(
        attn.astype(q.dtype), wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + bo_ref[0]
    y = x_ref[0].astype(jnp.float32) + g_ref[0] * out
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def attn_block(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               x: jnp.ndarray, wo: jnp.ndarray, bo: jnp.ndarray,
               gamma: jnp.ndarray, num_heads: int,
               interpret: bool = False) -> jnp.ndarray:
    """``x + gamma * (softmax(q kᵀ/√dh) v  @ woᵀ + bo)`` per head.

    q/x: (B, L, D); k/v: (B, S, D); wo: (D, D); bo/gamma: (D,).
    Shapes are padded to 128 multiples internally; output is (B, L, D).
    """
    b, l, d = q.shape
    s = k.shape[1]
    dh = d // num_heads
    assert num_heads * dh == d and d % LANE == 0, (d, num_heads)
    dtype = q.dtype

    qp = _pad_to(q, 1, QT)
    xp = _pad_to(x, 1, QT)
    kp = _pad_to(k, 1, LANE)
    vp = _pad_to(v, 1, LANE)
    lp, sp = qp.shape[1], kp.shape[1]

    kernel = functools.partial(
        _attn_kernel, num_heads=num_heads, s_true=s,
        scale=1.0 / math.sqrt(dh))
    grid = (b, lp // QT)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, QT, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, QT, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((d, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, QT, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lp, d), dtype),
        # K/V (up to ~2.8 MB each at S=2688) + Wo + q/x/out tiles + the
        # f32 score tile + double buffering can exceed the compiler's
        # default ~16 MB VMEM budget; raise the cap toward the chip's
        # 128 MiB physical VMEM so the resident-K/V schedule compiles.
        # Batch rows are independent -> "parallel" lets the megacores
        # split them; query tiles share resident K/V -> "arbitrary".
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp, xp,
      wo.astype(dtype), bo.astype(jnp.float32).reshape(1, d),
      gamma.astype(jnp.float32).reshape(1, d))
    return out[:, :l]


def supports(d: int, num_heads: int) -> bool:
    """Kernel constraints: lane-aligned model dim, equal head split."""
    return d % LANE == 0 and d % num_heads == 0 and (d // num_heads) >= 8


# ---------------------------------------------------------------------------
# Fully fused transformer layer tail: Q-proj + attention + out-proj +
# LayerScale + residual + pre-FF LayerNorm + FF (linear/GELU/linear) +
# LayerScale + residual — one VMEM pass per (batch row, query tile).
#
# Beyond ``attn_block`` this also keeps the post-attention stream ``y1`` and
# the (QT, FF)=128x2048 FF activation on-chip: per 5-layer crosstransformer
# pass at the 6 s bottleneck shapes that removes ~0.5 GB of HBM round-trips
# (bf16) on top of the score-matrix traffic the attention tail already
# saves.  K/V projection (needs the full sequence), the LN1/LN2(mem) input
# norms and the full-sequence GroupNorm-out stay in XLA.
# ---------------------------------------------------------------------------


def _gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-GELU for Mosaic: ``lax.erf_p`` has no TPU-kernel lowering rule,
    so erf is computed via Abramowitz & Stegun 7.1.26 (max abs error
    1.5e-7 — three orders below the bf16 ulp at these magnitudes)."""
    inv_sqrt2 = 0.7071067811865476
    z = x * inv_sqrt2
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-az * az))
    return 0.5 * x * (1.0 + erf)


def _layer_kernel(h_ref, k_ref, v_ref, x_ref,
                  wq_ref, bq_ref, wo_ref, bo_ref, g1_ref,
                  lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref,
                  o_ref, *, num_heads: int, s_true: int, scale: float,
                  eps: float = 1e-5):
    """One (batch row, query tile) step of a full pre-LN transformer layer.

    h_ref  (1, QT, D)  bf16 — LN1-normed query-stream tile
    k_ref  (1, S, D)   bf16 — projected keys, full row (resident)
    v_ref  (1, S, D)   bf16 — projected values
    x_ref  (1, QT, D)  bf16 — residual input tile (pre-norm stream)
    wq_ref (D, D); wo_ref (D, D)            bf16 (torch layout, y = x@W.T)
    w1_ref (FF, D); w2_ref (D, FF)          bf16
    bq/bo/b2/g1/g2/lnw/lnb (1, D), b1 (1, FF)   f32
    o_ref  (1, QT, D)  — layer output before the GroupNorm-out
    """
    d = h_ref.shape[-1]
    dh = d // num_heads
    s_pad = k_ref.shape[1]
    h = h_ref[0]                                   # (QT, D)
    q = jax.lax.dot_general(
        h, wq_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    q = (q + bq_ref[0]).astype(h.dtype)
    k = k_ref[0]
    v = v_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (QT, s_pad), 1)
    neg = jnp.float32(-1e30)
    heads = []
    for hh in range(num_heads):
        qh = q[:, hh * dh:(hh + 1) * dh]
        kh = k[:, hh * dh:(hh + 1) * dh]
        vh = v[:, hh * dh:(hh + 1) * dh]
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(col < s_true, scores, neg)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        heads.append(jnp.dot(probs.astype(h.dtype), vh,
                             preferred_element_type=jnp.float32))
    attn = jnp.concatenate(heads, axis=-1)         # (QT, D) f32
    out = jax.lax.dot_general(
        attn.astype(h.dtype), wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y1 = x_ref[0].astype(jnp.float32) + g1_ref[0] * (out + bo_ref[0])

    # pre-FF LayerNorm (torch semantics: f32 stats over channels)
    mean = jnp.mean(y1, axis=-1, keepdims=True)
    var = jnp.mean((y1 - mean) ** 2, axis=-1, keepdims=True)
    ln = ((y1 - mean) * jax.lax.rsqrt(var + eps)
          * lnw_ref[0] + lnb_ref[0]).astype(h.dtype)

    f1 = jax.lax.dot_general(
        ln, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    f1 = _gelu_erf(f1 + b1_ref[0]).astype(h.dtype)
    f2 = jax.lax.dot_general(
        f1, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y2 = y1 + g2_ref[0] * (f2 + b2_ref[0])
    o_ref[0] = y2.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def layer_tail(h: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               x: jnp.ndarray, wq: jnp.ndarray, bq: jnp.ndarray,
               wo: jnp.ndarray, bo: jnp.ndarray, g1: jnp.ndarray,
               lnw: jnp.ndarray, lnb: jnp.ndarray,
               w1: jnp.ndarray, b1: jnp.ndarray,
               w2: jnp.ndarray, b2: jnp.ndarray, g2: jnp.ndarray,
               num_heads: int, interpret: bool = False) -> jnp.ndarray:
    """Fused layer tail; see ``_layer_kernel`` for the math.

    h/x: (B, L, D) (normed queries / residual stream); k/v: (B, S, D)
    already projected; weights in torch layout.  Returns the layer output
    *before* the GroupNorm-out, shape (B, L, D).
    """
    b, l, d = h.shape
    s = k.shape[1]
    ff = w1.shape[0]
    dh = d // num_heads
    assert num_heads * dh == d and d % LANE == 0, (d, num_heads)
    dtype = h.dtype

    hp = _pad_to(h, 1, QT)
    xp = _pad_to(x, 1, QT)
    kp = _pad_to(k, 1, LANE)
    vp = _pad_to(v, 1, LANE)
    lp, sp = hp.shape[1], kp.shape[1]

    kernel = functools.partial(
        _layer_kernel, num_heads=num_heads, s_true=s,
        scale=1.0 / math.sqrt(dh))
    grid = (b, lp // QT)
    row = lambda arr, n: arr.astype(jnp.float32).reshape(1, n)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, QT, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, QT, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((d, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((d, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((ff, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, ff), lambda i, j: (0, 0)),
            pl.BlockSpec((d, ff), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, QT, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lp, d), dtype),
        # Resident per row: K/V (2x2.75 MB at S=2688) + weights (~5 MB bf16
        # at D=512/FF=2048) + f32 score and FF tiles; same budget rationale
        # as attn_block.  Batch rows are independent (megacore-parallel);
        # query tiles share resident K/V.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(hp, kp, vp, xp,
      wq.astype(dtype), row(bq, d),
      wo.astype(dtype), row(bo, d), row(g1, d),
      row(lnw, d), row(lnb, d),
      w1.astype(dtype), row(b1, ff),
      w2.astype(dtype), row(b2, d), row(g2, d))
    return out[:, :l]


def supports_layer(d: int, num_heads: int, ff: int) -> bool:
    """Fused-layer constraints: lane-aligned model and FF dims."""
    return supports(d, num_heads) and ff % LANE == 0


def _layer_tail_from_params(p, attn_key: str, ln_key: str, x_res, h_q, kv,
                            num_heads: int, interpret: bool) -> jnp.ndarray:
    """Project K/V in XLA (one packed matmul over the full memory stream),
    then run the fused layer tail.  ``h_q`` is the LN1-normed query stream,
    ``kv`` the normed memory stream (== h_q for self-attention)."""
    e = h_q.shape[-1]
    pa = p[attn_key]
    w = pa["in_proj_weight"].astype(h_q.dtype)
    bias = pa["in_proj_bias"].astype(h_q.dtype)
    kvp = kv @ w[e:].T + bias[e:]                  # (B, S, 2D)
    k, v = jnp.split(kvp, 2, axis=-1)
    return layer_tail(
        h_q, k, v, x_res,
        w[:e], pa["in_proj_bias"][:e],
        pa["out_proj"]["weight"], pa["out_proj"]["bias"],
        p["gamma_1"]["scale"],
        p[ln_key]["weight"], p[ln_key]["bias"],
        p["linear1"]["weight"], p["linear1"]["bias"],
        p["linear2"]["weight"], p["linear2"]["bias"],
        p["gamma_2"]["scale"],
        num_heads, interpret=interpret)


def fused_self_layer(p, x, num_heads: int, interpret: bool = False):
    """Pre-LN self-attention layer (minus GroupNorm-out), fully fused.

    Matches ``htdemucs._self_layer_apply`` up to the final
    ``_group_norm_tokens`` (which needs full-sequence stats and stays in
    XLA).  ``p`` is a ``_transformer_layer_init(cross=False)`` pytree.
    """
    from ..nn import core as nn

    h = nn.layer_norm(p["norm1"], x)
    return _layer_tail_from_params(p, "self_attn", "norm2", x, h, h,
                                   num_heads, interpret)


def fused_cross_layer(p, q, mem, num_heads: int, interpret: bool = False):
    """Pre-LN cross-attention layer (minus GroupNorm-out), fully fused.

    Matches ``htdemucs._cross_layer_apply`` up to ``_group_norm_tokens``;
    ``p`` is a ``_transformer_layer_init(cross=True)`` pytree (FF pre-norm
    is ``norm3``).
    """
    from ..nn import core as nn

    qn = nn.layer_norm(p["norm1"], q)
    mn = nn.layer_norm(p["norm2"], mem)
    return _layer_tail_from_params(p, "cross_attn", "norm3", q, qn, mn,
                                   num_heads, interpret)


def mha_residual(p_attn, gamma, x_res, q_in, kv_in, num_heads: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused tail for ``x_res + layer_scale(gamma, mha(...))``.

    ``p_attn`` is an ``nn.attention.mha_init`` pytree (torch packed layout);
    the QKV projections run in XLA (one fused matmul), the attention tail in
    the Pallas kernel.  q_in/kv_in are the *normed* token streams.
    """
    e = q_in.shape[-1]
    w = p_attn["in_proj_weight"].astype(q_in.dtype)
    bias = p_attn["in_proj_bias"].astype(q_in.dtype)
    if q_in is kv_in:
        qkv = q_in @ w.T + bias
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = q_in @ w[:e].T + bias[:e]
        k = kv_in @ w[e:2 * e].T + bias[e:2 * e]
        v = kv_in @ w[2 * e:].T + bias[2 * e:]
    return attn_block(q, k, v, x_res,
                      p_attn["out_proj"]["weight"],
                      p_attn["out_proj"]["bias"],
                      gamma["scale"], num_heads, interpret=interpret)
