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

Opt-in via ``ATSM_PALLAS_ATTN=1`` (measured on TPU before being made a
default; see scripts/bench_pallas_attn.py).  Matches
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

QT = 128          # query rows per grid step (MXU-aligned)
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
