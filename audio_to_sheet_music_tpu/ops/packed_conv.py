"""Channel-packed lowering for small-channel strided convolutions.

The frequency encoder's layer-0 conv (4 -> 48 channels, k=(8,1), s=(4,1)
over 2048 bins; reference `AudioTextHTDemucs_Full.txt:6-9`) has a
contraction depth of only C*k = 32 — a ~9% MXU tile ceiling — and XLA's
conv lowering runs such shapes far below even that (measured ~2.7 TFLOP/s
on the analogous ConvTranspose before the phase decomposition,
docs/PERFORMANCE.md).  This module re-expresses the conv as ONE dense
matmul over *groups of G output rows*:

* space-to-depth by the stride: the padded frequency axis (F+2p, a multiple
  of s) folds into (blocks of s) x (s*C channels) — a free reshape;
* G consecutive output rows share a window of ``G-1 + k/s`` blocks, so the
  whole group is one (C*(s*(G-1)+k), G*Co) matmul — contraction 80 and
  output width 192 for layer 0 at G=4, vs 32 x 48 unpacked: the same MXU
  pass count covers 4x the true FLOPs (2x fewer padded passes), and the
  dot lowering streams rows instead of the conv pipeline's small-channel
  scheduling.

The packed weight is a pure relayout (zeros + copies) of the exact conv
weight, built inline from the same param tree — the exact path stays the
default; this is the ``ATSM_FAST_ENC=1`` opt-in measured by
``scripts/profile_enc_ablate.py`` before adoption.
"""

from __future__ import annotations

import jax.numpy as jnp


def supports(cin: int, kernel: int, stride: int, f: int, pad: int,
             group: int = 4) -> bool:
    """Packing applies to stride-divisible kernels on group-divisible
    grids, and only pays where the unpacked contraction underfills a
    128-deep MXU tile."""
    if kernel % stride != 0:
        return False
    if (f + 2 * pad) % stride != 0:
        return False
    fout = (f + 2 * pad - kernel) // stride + 1
    return fout % group == 0 and cin * kernel < 128


def pack_weight(w: jnp.ndarray, group: int, stride: int) -> jnp.ndarray:
    """(Co, C, k, 1) torch conv weight -> (C*(s*(G-1)+k), G*Co) block-
    Toeplitz matmul operand.  Row index = (block_tap, s_phase, channel)
    matching the space-to-depth layout; col index = (g, co)."""
    co, c, k, _ = w.shape
    win = stride * (group - 1) + k                  # input rows per group
    packed = jnp.zeros((win, c, group, co), w.dtype)
    for g in range(group):
        packed = packed.at[g * stride:g * stride + k, :, g, :].set(
            w[:, :, :, 0].transpose(2, 1, 0))       # (k, C, Co)
    return packed.reshape(win * c, group * co)


def supports_time_pack(c: int, t: int, dilation: int,
                       block: int = 16) -> bool:
    """Time-packing pays where the output width underfills a 128-wide MXU
    tile (the DConv compress conv: N = C/8 = 6..48) and the time axis
    divides into blocks."""
    return (c // 8) < 128 and t % block == 0 and block > 2 * dilation


def pack_time_weight(w: jnp.ndarray, block: int, dilation: int
                     ) -> jnp.ndarray:
    """(H, C, k) torch conv1d weight (k=3 here) -> block-Toeplitz
    ((block + 2*dilation*(k//2)) * C, block * H) operand: output phase p of
    a block reads window taps p + j*dilation, j in [0, k)."""
    h, c, k = w.shape
    halo = dilation * (k - 1) // 2
    win = block + 2 * halo
    packed = jnp.zeros((win, c, block, h), w.dtype)
    for p in range(block):
        for j in range(k):
            packed = packed.at[p + j * dilation, :, p, :].set(w[:, :, j].T)
    return packed.reshape(win * c, block * h)


def packed_time_conv(p, x: jnp.ndarray, dilation: int,
                     block: int = 16) -> jnp.ndarray:
    """Dilated k=3 'same' conv1d (R, C, T) -> (R, H, T) as one matmul over
    blocks of ``block`` output positions (the DConv compress stage,
    ``models.htdemucs.dconv_apply`` conv1).

    Matches ``nn.conv1d(p, x, padding=dilation, dilation=dilation)``
    exactly in f32; validated in tests/test_packed_conv.py.
    """
    w = p["weight"]                                  # (H, C, 3)
    h, c, k = w.shape
    r, _, t = x.shape
    halo = dilation * (k - 1) // 2
    nblk = t // block
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo)))
    win = block + 2 * halo
    views = [xp[:, :, i:i + (nblk - 1) * block + 1:block]   # (R, C, nblk)
             for i in range(win)]
    lhs = jnp.stack(views, axis=2)                   # (R, C, win, nblk)
    lhs = lhs.transpose(0, 3, 2, 1).reshape(r * nblk, win * c)
    rhs = pack_time_weight(w, block, dilation).astype(x.dtype)
    y = lhs @ rhs                                    # (R*nblk, block*H)
    y = y + jnp.tile(p["bias"].astype(x.dtype), block)
    return y.reshape(r, nblk, block, h).transpose(0, 3, 1, 2).reshape(r, h, t)


def supports_time_stride(cin: int, kernel: int, stride: int, t: int,
                         pad: int) -> bool:
    """Packing applies to the strided *time-branch* entry convs exactly
    where the freq rule applies: stride-divisible kernel, tile-starved
    contraction (the 2 -> 48 layer-0 conv1d has depth C*k = 16).  The
    output-group remainder is handled by padding + slice, so no grid
    divisibility constraint beyond the stride (which ``henc_layer_apply``
    already guarantees by padding T)."""
    return (kernel % stride == 0 and (t + 2 * pad) % stride == 0
            and cin * kernel < 128)


def packed_time_stride_conv(p, x: jnp.ndarray, kernel: int, stride: int,
                            pad: int, group: int = 32) -> jnp.ndarray:
    """Strided time conv (B, C, T) -> (B, Co, T') as one block-Toeplitz
    matmul over groups of ``group`` output positions (the time encoder's
    layer-0 conv; same construction as ``packed_freq_conv`` with the time
    axis playing the frequency role, and a pad+slice remainder so T' need
    not divide by the group).

    Matches ``nn.conv1d(p, x, stride=stride, padding=pad)`` exactly in f32;
    validated in tests/test_packed_conv.py.  Contraction depth for layer 0
    at G=32: (31 + k/s)*s*C = 264 vs the unpacked 16 — past a full MXU
    tile, with a 32*Co-wide output.
    """
    w = p["weight"]                                  # (Co, C, k)
    co, c, k = w.shape
    b, _, t = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    tp = t + 2 * pad
    nblk = tp // stride
    tout = (tp - k) // stride + 1
    ngrp = -(-tout // group)                         # ceil: pad + slice
    kblk = group - 1 + k // stride                   # window blocks per group
    need = (ngrp - 1) * group + kblk
    if need > nblk:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, (need - nblk) * stride)))
        nblk = need
    xb = xp.reshape(b, c, nblk, stride)
    views = [xb[:, :, i:i + (ngrp - 1) * group + 1:group]   # (B, C, ngrp, s)
             for i in range(kblk)]
    win = jnp.stack(views, axis=2)                   # (B, C, kblk, ngrp, s)
    lhs = win.transpose(0, 3, 2, 4, 1).reshape(b * ngrp, kblk * stride * c)
    rhs = pack_weight(w[..., None], group, stride).astype(x.dtype)
    y = lhs @ rhs                                    # (B*ngrp, G*Co)
    y = y + jnp.tile(p["bias"].astype(x.dtype), group)
    y = y.reshape(b, ngrp, group, co).transpose(0, 3, 1, 2)
    return y.reshape(b, co, ngrp * group)[:, :, :tout]


def packed_freq_conv(p, x: jnp.ndarray, kernel: int, stride: int, pad: int,
                     group: int = 4) -> jnp.ndarray:
    """Strided freq conv (B, C, F, T) -> (B, Co, F', T) as one matmul.

    Matches ``nn.conv2d(p, x, stride=(s,1), padding=(pad,0))`` exactly in
    f32 (pure relayout + dot); validated in tests/test_packed_conv.py.
    """
    w = p["weight"]
    co, c = w.shape[0], w.shape[1]
    b, _, f, t = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    fp = f + 2 * pad
    nblk = fp // stride
    fout = (fp - kernel) // stride + 1
    ngrp = fout // group
    kblk = group - 1 + kernel // stride             # window blocks per group

    # space-to-depth: (B, C, nblk, s, T); window gather = kblk strided views
    xb = xp.reshape(b, c, nblk, stride, t)
    views = [
        xb[:, :, i:i + (ngrp - 1) * group + 1:group]   # (B, C, ngrp, s, T)
        for i in range(kblk)
    ]
    win = jnp.stack(views, axis=2)                  # (B, C, kblk, ngrp, s, T)
    # row index (block_tap, s_phase, channel) -> flatten (kblk, s, C)
    lhs = win.transpose(0, 3, 5, 2, 4, 1).reshape(b * ngrp * t,
                                                  kblk * stride * c)
    rhs = pack_weight(w, group, stride).astype(x.dtype)
    y = lhs @ rhs                                   # (B*ngrp*T, G*Co)
    y = y + jnp.tile(p["bias"].astype(x.dtype), group)
    y = y.reshape(b, ngrp, t, group, co)
    # out freq index = g*group + phase
    return y.transpose(0, 4, 1, 3, 2).reshape(b, co, fout, t)
