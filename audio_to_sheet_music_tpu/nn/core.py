"""Functional NN primitives with explicit param pytrees.

Design: every layer is a pair of pure functions — ``*_init(key, ...) ->
params`` and an apply function ``f(params, x, ...) -> y``.  Params are plain
nested dicts of ``jnp`` arrays stored in **torch layouts** (Linear ``(out,
in)``, Conv ``(out, in, *k)``, ConvTranspose ``(in, out, *k)``) so the
PyTorch-checkpoint converter (`convert/torch_import.py`) is a pure
name-mapping with zero transposes.  XLA folds the transposes into the
matmuls/convs at compile time, so this costs nothing on TPU.

Numerical contracts match torch: exact (erf) GELU, GroupNorm/LayerNorm eps
conventions, ``F.interpolate(align_corners=False)`` == half-pixel
``jax.image.resize`` (all parity-tested in ``tests/test_nn.py``).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


Params = dict


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"weight": _uniform(kw, (out_dim, in_dim), bound)}
    if bias:
        p["bias"] = _uniform(kb, (out_dim,), bound)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["weight"].astype(x.dtype).T
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Convolutions (torch NC{T,HW} data layout, torch weight layouts)
# ---------------------------------------------------------------------------

def conv1d_init(key, in_ch, out_ch, kernel, bias=True) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel)
    p = {"weight": _uniform(kw, (out_ch, in_ch, kernel), bound)}
    if bias:
        p["bias"] = _uniform(kb, (out_ch,), bound)
    return p


def conv1d(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0,
           dilation: int = 1) -> jnp.ndarray:
    """x: (B, C, T); weight: (O, I, K)."""
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None]
    return y


def conv2d_init(key, in_ch, out_ch, kernel: Sequence[int], bias=True) -> Params:
    kw, kb = jax.random.split(key)
    kh, kw_ = kernel
    bound = 1.0 / math.sqrt(in_ch * kh * kw_)
    p = {"weight": _uniform(kw, (out_ch, in_ch, kh, kw_), bound)}
    if bias:
        p["bias"] = _uniform(kb, (out_ch,), bound)
    return p


def conv2d(p: Params, x: jnp.ndarray, stride=(1, 1), padding=(0, 0),
           dilation=(1, 1)) -> jnp.ndarray:
    """x: (B, C, H, W); weight: (O, I, KH, KW)."""
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype),
        window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None, None]
    return y


def conv_transpose1d_init(key, in_ch, out_ch, kernel, bias=True) -> Params:
    kw, kb = jax.random.split(key)
    # torch ConvTranspose fan_in = weight.size(1) * kernel = OUT_ch * k
    # (the (in, out, k) layout's dim 1), not in_ch * k as for Conv
    bound = 1.0 / math.sqrt(out_ch * kernel)
    p = {"weight": _uniform(kw, (in_ch, out_ch, kernel), bound)}
    if bias:
        p["bias"] = _uniform(kb, (out_ch,), bound)
    return p


def _subpixel_kernel_1d(w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(I, O, K) transpose-conv weight -> (O*stride, I, K//stride) phase bank.

    Sub-pixel identity: ``out[j] = sum_d x[a-d] * w[r + stride*d]`` with
    ``a=(j+p)//s, r=(j+p)%s`` — each output phase r is a small stride-1
    correlation.  Tap d reads ``x[a - (taps-1) + d']`` so the conv kernel
    position d' maps to weight index ``r + stride*(taps-1-d')``.
    """
    i_ch, o_ch, k = w.shape
    taps = k // stride
    # bank[(o, r), i, d'] = w[i, o, r + stride*(taps-1-d')]
    idx = jnp.arange(stride)[:, None] + stride * (taps - 1 - jnp.arange(taps))[None, :]
    bank = w[:, :, idx]                         # (I, O, r, d')
    return bank.transpose(1, 2, 0, 3).reshape(o_ch * stride, i_ch, taps)


def _conv_transpose1d_subpixel(w: jnp.ndarray, x: jnp.ndarray, stride: int,
                               padding: int) -> jnp.ndarray:
    """Exact ConvTranspose1d via phase decomposition (requires K % s == 0).

    Avoids the input-dilated conv (3/4 of whose MACs multiply inserted
    zeros): one stride-1 conv with ``K/s``-tap filters and ``s``x output
    channels, then a time-phase interleave.
    """
    i_ch, o_ch, k = w.shape
    taps = k // stride
    t = x.shape[-1]
    bank = _subpixel_kernel_1d(w.astype(x.dtype), stride)
    y = jax.lax.conv_general_dilated(
        x, bank, window_strides=(1,),
        padding=[(taps - 1, taps - 1)],          # a ranges over [0, T+taps-2]
        dimension_numbers=("NCH", "OIH", "NCH"),
    )                                            # (B, O*s, A)
    b = x.shape[0]
    a_len = y.shape[-1]
    z = y.reshape(b, o_ch, stride, a_len).transpose(0, 1, 3, 2)
    z = z.reshape(b, o_ch, stride * a_len)       # z[s*a + r]
    out_len = (t - 1) * stride - 2 * padding + k
    return z[..., padding : padding + out_len]


def conv_transpose1d(p: Params, x: jnp.ndarray, stride: int = 1,
                     padding: int = 0) -> jnp.ndarray:
    """torch ConvTranspose1d semantics: out = (T-1)*s - 2p + k.

    Uses the exact sub-pixel (phase) decomposition when ``K % stride == 0``
    (all decoders here: k=8, s=4) — ~4x fewer MACs than the input-dilated
    form and measurably faster on the MXU; falls back to input dilation
    otherwise.
    """
    w = p["weight"].astype(x.dtype)          # (I, O, K)
    k = w.shape[-1]
    if stride > 1 and k % stride == 0:
        y = _conv_transpose1d_subpixel(w, x, stride, padding)
    else:
        wf = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (O, I, K)
        y = jax.lax.conv_general_dilated(
            x, wf,
            window_strides=(1,),
            padding=[(k - 1 - padding, k - 1 - padding)],
            lhs_dilation=(stride,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None]
    return y


def conv_transpose2d_init(key, in_ch, out_ch, kernel: Sequence[int], bias=True) -> Params:
    kw, kb = jax.random.split(key)
    kh, kw_ = kernel
    # torch ConvTranspose fan_in = out_ch * receptive field (see 1d init)
    bound = 1.0 / math.sqrt(out_ch * kh * kw_)
    p = {"weight": _uniform(kw, (in_ch, out_ch, kh, kw_), bound)}
    if bias:
        p["bias"] = _uniform(kb, (out_ch,), bound)
    return p


def conv_transpose2d(p: Params, x: jnp.ndarray, stride=(1, 1),
                     padding=(0, 0)) -> jnp.ndarray:
    """torch ConvTranspose2d semantics (per-dim): out = (L-1)*s - 2p + k.

    Fast path for the HTDemucs-style (K, 1) kernels with stride (s, 1) and
    K % s == 0: sub-pixel phase decomposition along H (see
    ``_conv_transpose1d_subpixel``); input-dilated conv otherwise.
    """
    w = p["weight"].astype(x.dtype)          # (I, O, KH, KW)
    i_ch, o_ch, kh, kw_ = w.shape
    sh, sw = stride
    if sh > 1 and sw == 1 and kw_ == 1 and kh % sh == 0:
        taps = kh // sh
        bank = _subpixel_kernel_1d(w[..., 0], sh)[..., None]  # (O*s, I, taps, 1)
        y = jax.lax.conv_general_dilated(
            x, bank, window_strides=(1, 1),
            padding=[(taps - 1, taps - 1), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )                                     # (B, O*s, A, W)
        b, _, a_len, wdt = y.shape
        z = y.reshape(b, o_ch, sh, a_len, wdt).transpose(0, 1, 3, 2, 4)
        z = z.reshape(b, o_ch, sh * a_len, wdt)
        out_h = (x.shape[2] - 1) * sh - 2 * padding[0] + kh
        y = z[:, :, padding[0] : padding[0] + out_h, :]
        if padding[1]:   # kw=1, sw=1: torch out_w = W - 2*pw (crop)
            y = y[:, :, :, padding[1] : wdt - padding[1]]
    else:
        wf = jnp.flip(w, axis=(-2, -1)).transpose(1, 0, 2, 3)  # (O, I, KH, KW)
        y = jax.lax.conv_general_dilated(
            x, wf,
            window_strides=(1, 1),
            padding=[(kh - 1 - padding[0], kh - 1 - padding[0]),
                     (kw_ - 1 - padding[1], kw_ - 1 - padding[1])],
            lhs_dilation=tuple(stride),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None, None]
    return y


# ---------------------------------------------------------------------------
# Normalisation
# ---------------------------------------------------------------------------

def norm_affine_init(dim: int) -> Params:
    return {"weight": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def group_norm(p: Params, x: jnp.ndarray, num_groups: int,
               eps: float = 1e-5) -> jnp.ndarray:
    """torch GroupNorm over (B, C, *spatial): normalise within each group of
    channels jointly with all spatial dims.  Stats in f32."""
    orig_dtype = x.dtype
    b, c = x.shape[:2]
    spatial = x.shape[2:]
    xf = x.astype(jnp.float32).reshape(b, num_groups, -1)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, c, *spatial)
    shape = (1, c) + (1,) * len(spatial)
    xf = xf * p["weight"].reshape(shape) + p["bias"].reshape(shape)
    return xf.astype(orig_dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch LayerNorm over the last dim.  Stats in f32."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * p["weight"] + p["bias"]
    return xf.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Activations / misc
# ---------------------------------------------------------------------------

def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch ``GELU(approximate='none')``."""
    return jax.nn.gelu(x, approximate=False)


def glu(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """torch GLU: split in half along ``axis``, a * sigmoid(b)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def layer_scale_init(channels: int, init: float = 0.0) -> Params:
    return {"scale": jnp.full((channels,), init, jnp.float32)}


def layer_scale(p: Params, x: jnp.ndarray, channel_last: bool = False) -> jnp.ndarray:
    """demucs LayerScale: per-channel learned scale."""
    s = p["scale"].astype(x.dtype)
    if channel_last:
        return s * x
    return s[:, None] * x if x.ndim == 3 else s.reshape(-1, *([1] * (x.ndim - 2))) * x


def embedding_init(key, num: int, dim: int) -> Params:
    return {"weight": jax.random.normal(key, (num, dim), jnp.float32)}


def embedding(p: Params, idx: jnp.ndarray) -> jnp.ndarray:
    return p["weight"][idx]


def dropout(key, x: jnp.ndarray, rate: float, deterministic: bool = True) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Interpolation (torch F.interpolate, align_corners=False)
# ---------------------------------------------------------------------------

_RESIZE_MATMUL_MAX = 1 << 22   # in*out elements; 16 MB f32 weight ceiling


def _lerp_src(in_size: int, size: int):
    """torch align_corners=False source positions, edge clamped (numpy,
    trace time — sizes are static)."""
    src = (np.arange(size) + 0.5) * (in_size / size) - 0.5
    i0f = np.floor(src)
    frac = (src - i0f).astype(np.float32)
    i0 = np.clip(i0f.astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0f.astype(np.int64) + 1, 0, in_size - 1)
    return i0, i1, frac


@functools.lru_cache(maxsize=64)
def _lerp_weight(in_size: int, size: int) -> np.ndarray:
    """Dense ``(in, out)`` linear-interpolation matrix (2 taps per column)."""
    i0, i1, frac = _lerp_src(in_size, size)
    w = np.zeros((in_size, size), np.float32)
    cols = np.arange(size)
    np.add.at(w, (i0, cols), 1.0 - frac)
    np.add.at(w, (i1, cols), frac)
    return w


def _lerp_resize_axis(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Linear resize of one axis; torch ``F.interpolate(mode='linear'/
    'bilinear', align_corners=False, antialias=False)`` semantics.

    Two lowerings, picked by axis size (both exact):

    - small axes -> one MXU matmul against the dense 2-tap interpolation
      matrix (measured faster than gathers at decoder-skip sizes);
    - large axes -> gather the two source neighbours and lerp, O(elements).
      ``jax.image.resize`` is dense always, which made the time decoder's
      66152 -> 66150 adjustment a ~10-TMAC matmul with a multi-GB operand.
    """
    in_size = x.shape[axis]
    if in_size == size:
        return x
    if in_size % size == 0:
        # Exact integer decimation: src = (j+0.5)*s - 0.5 lands on sample
        # s*j + (s-1)/2 (odd s, frac 0) or between s*j + s/2 - 1 and
        # s*j + s/2 (even s, frac exactly 0.5) — a strided-slice blend,
        # no matmul or gather (the freq decoder's 1344 -> 336 resizes).
        s = in_size // size
        moved = jnp.moveaxis(x, axis, -1)
        phases = moved.reshape(*moved.shape[:-1], size, s)
        if s % 2:
            out = phases[..., (s - 1) // 2]
        else:
            out = 0.5 * (phases[..., s // 2 - 1].astype(jnp.float32)
                         + phases[..., s // 2].astype(jnp.float32))
        return jnp.moveaxis(out.astype(x.dtype), -1, axis)
    i0, i1, frac = _lerp_src(in_size, size)
    if axis == x.ndim - 1 and size < in_size:
        # Near-identity shrink on the minor axis (the time decoder's
        # 4T -> 4T-k frame adjustments, k tiny): i0[j] - j takes only a
        # few values, so the 2-tap gather lowers to <=8 contiguous
        # minor-axis slices + a static-weight lerp.  jnp.take here forced
        # an axis-first gather plus relayout copies (~10 ms/stem chain).
        offs0, offs1 = i0 - np.arange(size), i1 - np.arange(size)
        if (offs0.min() >= 0 and np.unique(offs0).size <= 8
                and np.all(np.diff(offs0) >= 0)
                and np.all(np.diff(offs1) >= 0)):

            def take_slices(od):
                bounds = ([0] + list(np.nonzero(np.diff(od))[0] + 1)
                          + [size])
                parts = [x[..., a + int(od[a]) : b + int(od[a])]
                         for a, b in zip(bounds[:-1], bounds[1:])]
                return (jnp.concatenate(parts, axis=-1)
                        if len(parts) > 1 else parts[0])

            f = jnp.asarray(frac)
            return (take_slices(offs0).astype(jnp.float32) * (1.0 - f)
                    + take_slices(offs1).astype(jnp.float32) * f
                    ).astype(x.dtype)
    if in_size * size <= _RESIZE_MATMUL_MAX:
        w = jnp.asarray(_lerp_weight(in_size, size), x.dtype)
        if axis == x.ndim - 2:
            # contract the axis in place (dot_general on dim -2) instead
            # of moveaxis + matmul + moveaxis: two full-tensor relayout
            # transposes become one swap of the small result
            out = jax.lax.dot_general(
                x, w, (((axis,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (..., minor, out)
            return jnp.swapaxes(out, -1, -2).astype(x.dtype)
        moved = jnp.moveaxis(x, axis, -1)
        out = jnp.matmul(moved, w, preferred_element_type=jnp.float32)
        return jnp.moveaxis(out.astype(x.dtype), -1, axis)
    x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = size
    f = jnp.asarray(frac).reshape(shape)
    return (x0.astype(jnp.float32) * (1.0 - f)
            + x1.astype(jnp.float32) * f).astype(x.dtype)


def interpolate_linear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B, C, T) -> (B, C, size); torch 'linear', align_corners=False."""
    return _lerp_resize_axis(x, size, x.ndim - 1)


def interpolate_bilinear(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """(B, C, H, W) -> (B, C, *size); torch 'bilinear', align_corners=False.

    Separable: each axis resizes independently (skipping same-size axes —
    ``jax.image.resize`` would contract an identity matrix there)."""
    x = _lerp_resize_axis(x, size[0], x.ndim - 2)
    return _lerp_resize_axis(x, size[1], x.ndim - 1)
