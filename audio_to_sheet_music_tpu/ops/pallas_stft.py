"""Fused STFT kernel (Pallas/TPU): framing + window + DFT in one pass.

The XLA spec path materialises the framed signal — ``(rows, n_frames,
n_fft)`` f32, ~n_fft/hop x the input size (~550 MB per 16-chunk sweep) — and
round-trips it through HBM between framing, windowing and the FFT.  This
kernel keeps each frame in VMEM for its whole life.

Layout (everything 128-lane aligned, zero relayouts): the signal is viewed
as ``(rows, T/128, 128)``.  Factoring the DFT as ``N = N1*N2`` with
``N1 = 128`` (lane) and ``N2 = n_fft/128`` (sublane), frame ``f`` is a pure
**sublane slice** — an (N2, 128) tile whose element ``[n2, n1]`` is sample
``128*n2 + n1``.  The four-step DFT (`ops.dsp` module docs) runs entirely in
transposed form so every operand keeps 128 lanes:

    B^T[k2, n1] = sum_n2 W2[n2, k2] * tile[n2, n1]      # (N2, 128)
    C^T         = B^T ⊙ twiddle^T[k2, n1]
    X^T[k2, k1] = C^T @ W1[n1, k1]                       # (N2, 128)

with spectrum index ``k = N2*k1 + k2`` (un-transposed host-side).  Per grid
step (row, frame-block): one async HBM->VMEM copy of the block's span, then
FRAME_BLOCK unrolled window-multiply + 6 MXU matmuls.  f32 throughout.
Parity tested in interpret mode (CPU) and compiled on TPU
(``tests/test_pallas_stft.py``).

Geometry: ``n_fft % 128 == 0`` and ``hop % 128 == 0`` — true for the demucs
spec (4096/1024).  Other sizes use the XLA matmul-DFT path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAME_BLOCK = 8
LANE = 128


def supports(n_fft: int, hop: int) -> bool:
    return n_fft % LANE == 0 and hop % LANE == 0 and n_fft // LANE >= 2


@functools.lru_cache(maxsize=4)
def _consts(n_fft: int):
    """W1 (128,128), W2 (N2,N2), twiddle^T (N2,128), window tile (N2,128)."""
    n1, n2 = LANE, n_fft // LANE
    sign = -2j
    w1 = np.exp(sign * np.pi / n1 * np.outer(np.arange(n1), np.arange(n1)))
    w2 = np.exp(sign * np.pi / n2 * np.outer(np.arange(n2), np.arange(n2)))
    tw_t = np.exp(sign * np.pi / n_fft
                  * np.outer(np.arange(n2), np.arange(n1)))   # [k2, n1]
    win = 0.5 * (1.0 - np.cos(2.0 * math.pi * np.arange(n_fft) / n_fft))
    c64 = np.complex64
    return (w1.astype(c64), w2.astype(c64), tw_t.astype(c64),
            win.reshape(n2, n1).astype(np.float32))


def _dg0(a, b):
    """dot_general contracting dim 0 of both operands: (n,m),(n,k)->(m,k).

    HIGHEST precision: true f32 MXU passes — audio spectra are too lossy at
    the default bf16 multiply (2.7e-3 relative vs 2e-5).
    """
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _kernel(hop, n_fft, x2d_hbm, w2r, w2i, twr, twi, w1r, w1i, win, out_re,
            out_im, scratch, sem):
    fb = FRAME_BLOCK
    hop_rows = hop // LANE
    frame_rows = n_fft // LANE
    span_rows = (fb - 1) * hop_rows + frame_rows
    r = pl.program_id(0)
    f0 = pl.program_id(1) * fb

    copy = pltpu.make_async_copy(
        x2d_hbm.at[r, pl.ds(f0 * hop_rows, span_rows), :], scratch, sem)
    copy.start()
    copy.wait()

    for f in range(fb):                    # static unroll
        frame = scratch[f * hop_rows : f * hop_rows + frame_rows, :] * win[:]
        btr = _dg0(w2r[:], frame)          # B^T real: (k2, n1)
        bti = _dg0(w2i[:], frame)
        ctr = btr * twr[:] - bti * twi[:]
        cti = btr * twi[:] + bti * twr[:]
        out_re[0, f] = _mm(ctr, w1r[:]) - _mm(cti, w1i[:])   # X^T: (k2, k1)
        out_im[0, f] = _mm(ctr, w1i[:]) + _mm(cti, w1r[:])


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames",
                                             "interpret"))
def stft_pallas(x: jnp.ndarray, n_fft: int = 4096, hop: int = 1024,
                n_frames: int | None = None,
                interpret: bool = False) -> jnp.ndarray:
    """Fused STFT: ``(rows, T) -> complex64 (rows, n_fft//2+1, n_frames)``.

    ``x`` must already be center-padded (the caller applies the torch-style
    reflect padding); frame i covers ``x[i*hop : i*hop + n_fft]``.  Matches
    the XLA path (normalized=False) up to f32 rounding.
    """
    assert supports(n_fft, hop), (n_fft, hop)
    rows, t = x.shape
    if n_frames is None:
        n_frames = (t - n_fft) // hop + 1
    fb = FRAME_BLOCK
    n_blocks = -(-n_frames // fb)
    padded_frames = n_blocks * fb
    needed = (padded_frames - 1) * hop + n_fft
    if t < needed:
        x = jnp.pad(x, ((0, 0), (0, needed - t)))
    elif t > needed:
        x = x[:, :needed]
    n2 = n_fft // LANE
    x2d = x.astype(jnp.float32).reshape(rows, needed // LANE, LANE)

    w1, w2, tw_t, win = _consts(n_fft)
    hop_rows = hop // LANE
    span_rows = (fb - 1) * hop_rows + n2

    kernel = functools.partial(_kernel, hop, n_fft)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(rows, n_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] + [const_spec] * 7,
        out_specs=[
            pl.BlockSpec((1, fb, n2, LANE), lambda r, f: (r, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fb, n2, LANE), lambda r, f: (r, f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, padded_frames, n2, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, padded_frames, n2, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((span_rows, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x2d, jnp.asarray(w2.real), jnp.asarray(w2.imag),
      jnp.asarray(tw_t.real), jnp.asarray(tw_t.imag), jnp.asarray(w1.real),
      jnp.asarray(w1.imag), jnp.asarray(win))

    h = n_fft // 2 + 1
    # stored X^T[k2, k1]; spectrum k = N2*k1 + k2 -> transpose + flatten
    re = out_re.transpose(0, 1, 3, 2).reshape(rows, padded_frames, n_fft)
    im = out_im.transpose(0, 1, 3, 2).reshape(rows, padded_frames, n_fft)
    z = jax.lax.complex(re[:, :n_frames, :h], im[:, :n_frames, :h])
    return jnp.moveaxis(z, -1, -2)        # (rows, F, n_frames)
