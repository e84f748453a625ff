"""Fused Pallas kernel for the HTDemucs DConv residual branch.

The DConv branch (reference architecture dump `AudioTextHTDemucs_Full.txt:
10-31`; JAX twin `models.htdemucs.dconv_apply`) is two residual blocks of

    conv1d(C -> C/8, k=3, dil 2^d) -> GroupNorm(1) -> GELU ->
    conv1d(C/8 -> 2C, k=1) -> GroupNorm(1) -> GLU -> LayerScale -> +x

Its matmuls are *skinny* (hidden = C/8 is 6..48), so as separate XLA convs
each op costs an HBM round trip and an awkward lowering — measured far off
roofline on the folded encoder shapes.  This kernel runs the ENTIRE branch
in VMEM per block of rows:

- layout ``(C, RB, TP)`` with T zero-padded to a lane-aligned ``TP``
  (multiple of 128): the per-tap contractions flatten to
  ``(H, C) @ (C, RB*TP)`` / ``(2C, H) @ (H, RB*TP)`` MXU matmuls with the
  huge dimension on lanes;
- GroupNorm(1) stats per row over the *valid* ``(C_out, T)`` positions in
  f32 (the pad region is masked; each depth block re-zeroes its pad so the
  next block's dilated taps read true zeros);
- exact-erf GELU (A&S 7.1.26 polynomial — the erf/erfc primitives are not
  lowered by Mosaic) and sigmoid GLU on the VPU;
- one HBM read of ``x`` and one write of the result.

Used for the *frequency* branches, where the fold gives many rows with a
short T (`models.htdemucs._dconv_freq`): rows = B*F in {96..6144},
T = spectrogram frames.  Opt-in via ``ATSM_PALLAS_DCONV=1`` until the
measured win is recorded in docs/PERFORMANCE.md (same policy as
``ops.pallas_stft``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _erf(x):
    """erf for the Mosaic kernel (erf/erfc primitives are unimplemented).

    Abramowitz & Stegun 7.1.26 — max abs error 1.5e-7, far below the bf16
    output rounding the XLA path also applies.
    """
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    """torch GELU(approximate='none'): x * Phi(x)."""
    return x * 0.5 * (1.0 + _erf(x * (1.0 / np.sqrt(2.0))))


def _pad_t(t: int) -> int:
    return -(-t // 128) * 128


def _row_block(n_rows: int, t: int, c: int) -> int | None:
    """Largest row block RB dividing n_rows within the 16 MB scoped-VMEM
    budget.  The coefficient is empirical: the Mosaic stack allocation for
    this kernel measures ~80 bytes per (C, RB, TP) element (x f32, three
    shifted tap copies, y1/y2, double-buffered in/out blocks)."""
    tp = _pad_t(t)
    for rb in (32, 16, 8, 4, 2, 1):
        if n_rows % rb != 0:
            continue
        if 80 * c * rb * tp <= 14 * 2 ** 20:
            return rb
    return None


def supports(n_rows: int, t: int, c: int) -> bool:
    return c % 8 == 0 and _row_block(n_rows, t, c) is not None


def _shift_rows(x, off: int):
    """Shift ``(C, RB, TP)`` along T by ``off`` with zero fill (per row)."""
    c, r, tp = x.shape
    if off == 0:
        return x
    zeros = jnp.zeros((c, r, abs(off)), x.dtype)
    if off > 0:      # output[t] = x[t - off]
        return jnp.concatenate([zeros, x[:, :, :-off]], axis=-1)
    return jnp.concatenate([x[:, :, -off:], zeros], axis=-1)


def _block_body(x, blk, dilation: int, mask, n_valid: float,
                dot_dtype=jnp.float32):
    """One DConv depth block on a ``(C, RB, TP)`` f32 tile.

    ``x`` must be zero in the pad region; the result is too.
    ``mask``: (1, 1, TP) 1/0 validity; ``n_valid``: valid element count per
    row for the respective GroupNorm (set per tensor below).
    ``dot_dtype``: matmul *input* precision (accumulation stays f32).  The
    fused encoder kernel passes bf16 here when its own inputs are bf16 —
    matching the per-op XLA path's precision at the MXU's native rate;
    normalisation statistics and activations stay f32 either way.
    """
    c, rb, tp = x.shape
    h = blk["w1"].shape[1]              # w1 ref: (3, H, C)
    flat = (lambda a: a.reshape(a.shape[0], rb * tp))
    unflat = (lambda a: a.reshape(a.shape[0], rb, tp))
    # conv1: 3 dilated taps, each an (H, C) @ (C, RB*TP) matmul.  Shifts
    # stay 3-D (per-row zero fill); the pad region of x is zero, so taps
    # reading past t=T-1 correctly see zeros.  Tap weights come from the
    # ref (2-D slice of the (3, H, C) block) — loaded-array rank changes
    # are rejected by Mosaic.
    xc = x.astype(dot_dtype)
    y1 = jnp.zeros((h, rb * tp), jnp.float32)
    for k in range(3):
        xs = _shift_rows(xc, (1 - k) * dilation)
        y1 = y1 + jax.lax.dot_general(
            blk["w1"][k].astype(dot_dtype), flat(xs),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y1 = (unflat(y1) + blk["b1"][:]) * mask   # bias leaks into pad: mask
    # GroupNorm(1, H): stats per row over the valid (H, T) positions
    nv1 = h * n_valid
    mean = jnp.sum(y1, axis=(0, 2), keepdims=True) / nv1
    d = (y1 - mean) * mask
    var = jnp.sum(d * d, axis=(0, 2), keepdims=True) / nv1
    y1 = d * jax.lax.rsqrt(var + EPS)
    y1 = y1 * blk["g1"][:] + blk["bt1"][:]
    y1 = _gelu_exact(y1) * mask
    # conv2: (2C, H) @ (H, RB*TP) pointwise
    y2 = jax.lax.dot_general(
        blk["w2"][:].astype(dot_dtype), flat(y1).astype(dot_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y2 = (unflat(y2) + blk["b2"][:]) * mask
    nv2 = 2 * c * n_valid
    mean = jnp.sum(y2, axis=(0, 2), keepdims=True) / nv2
    d = (y2 - mean) * mask
    var = jnp.sum(d * d, axis=(0, 2), keepdims=True) / nv2
    y2 = d * jax.lax.rsqrt(var + EPS)
    y2 = y2 * blk["g2"][:] + blk["bt2"][:]
    # GLU + LayerScale + residual.  The affine norm bias reaches the pad
    # region, so the result MUST be re-masked: the next depth block's
    # dilated taps read these positions as the per-row zero padding.
    a, b = y2[:c], y2[c:]
    y = a * jax.nn.sigmoid(b)
    return (x + blk["s"][:] * y) * mask


_WNAMES = ["w1", "b1", "g1", "bt1", "w2", "b2", "g2", "bt2", "s"]


def _kernel(x_ref, *refs, t_valid: int, rb: int, tp: int):
    out_ref = refs[-1]
    blocks = []
    for d in range(2):
        base = d * len(_WNAMES)
        blocks.append({n: refs[base + i] for i, n in enumerate(_WNAMES)})
    c = x_ref.shape[0]
    # blocks arrive flat (C, RB*TP); the lane split (RB, TP) is tile-aligned
    # (TP % 128 == 0), which Mosaic supports
    x = x_ref[:].astype(jnp.float32).reshape(c, rb, tp)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, tp), 2)
            < t_valid).astype(jnp.float32)
    x = x * mask                      # defensive: guarantee zero pad region
    for d, blk in enumerate(blocks):
        x = _block_body(x, blk, 2 ** d, mask, float(t_valid))
    out_ref[:] = x.reshape(c, rb * tp).astype(out_ref.dtype)


def _flatten_params(p) -> list[jnp.ndarray]:
    """dconv param pytree (models.htdemucs.dconv_init) -> flat f32 arrays,
    pre-shaped so the kernel never reshapes small vectors (Mosaic rejects
    rank-changing reshapes of 1-D vectors): per-channel vectors become
    ``(N, 1, 1)``, conv weights ``(3, H, C)`` / ``(2C, H)``."""
    out = []
    v3 = (lambda a: jnp.asarray(a, jnp.float32)[:, None, None])
    for blk in p["layers"]:
        out += [
            blk["conv1"]["weight"].astype(jnp.float32).transpose(2, 0, 1),
            v3(blk["conv1"]["bias"]),
            v3(blk["norm1"]["weight"]),
            v3(blk["norm1"]["bias"]),
            blk["conv2"]["weight"].astype(jnp.float32)[:, :, 0],  # (2C, H)
            v3(blk["conv2"]["bias"]),
            v3(blk["norm2"]["weight"]),
            v3(blk["norm2"]["bias"]),
            v3(blk["scale"]["scale"]),
        ]
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def dconv_rows(p, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """DConv branch over ``(R, C, T)`` rows (same contract as
    ``models.htdemucs.dconv_apply``), computed by the fused kernel.

    Call ``supports(R, T, C)`` first (``_dconv_freq`` does).
    """
    r, c, t = x.shape
    rb = _row_block(r, t, c)
    if rb is None:
        raise ValueError(f"unsupported dconv shape {(r, c, t)}")
    tp = _pad_t(t)
    weights = _flatten_params(p)
    xt = jnp.pad(x.transpose(1, 0, 2), ((0, 0), (0, 0), (0, tp - t)))
    xt = xt.reshape(c, r * tp)

    w_specs = [
        pl.BlockSpec(w.shape, functools.partial(lambda nd, i: (0,) * nd,
                                                w.ndim),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, t_valid=t, rb=rb, tp=tp),
        grid=(r // rb,),
        in_specs=[pl.BlockSpec((c, rb * tp), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((c, rb * tp), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, r * tp), x.dtype),
        interpret=interpret,
    )(xt, *weights)
    return out.reshape(c, r, tp)[:, :, :t].transpose(1, 0, 2)
