"""Fused Pallas kernel for a frequency ``HEncLayer`` (shallow encoder).

The HTDemucs frequency encoder layer (reference architecture dump
`AudioTextHTDemucs_Full.txt:4-117`; JAX twin `models.htdemucs.
henc_layer_apply`) is

    Conv2d(Cin -> C, k=(8,1), s=(4,1), p=(2,0)) -> GELU ->
    DConv residual (2 dilated compress-expand blocks along T per (b,f) row)
    -> Conv2d 1x1 (C -> 2C) -> GLU

At the shallow layers the channel counts are tiny (4->48, 48->96): the
strided conv's contraction depth is Cin*k = 32..384 and XLA lowers the
whole stack at a ~9% MXU tile ceiling with an HBM round trip between every
op (docs/PERFORMANCE.md roofline: ~28 ms per layer of a 216 ms forward).
Two earlier *repacking* attempts (``ATSM_FAST_ENC``/``ATSM_FAST_DCONV``,
ops/packed_conv.py) won standalone but lost end-to-end because the
rearranges broke XLA's surrounding conv+stats mega-fusion.  This kernel is
the round-4 verdict's named fix: put the WHOLE layer in one VMEM pass, so
the packed-matmul win and the fusion both live inside the kernel where XLA
cannot unfuse them.

Design (one grid step = one (batch item, block of FB output-frequency
rows)):

- the strided conv is re-expressed as ONE dense matmul via space-to-depth
  (done once in XLA, a free relayout fused into the producer): the padded
  frequency axis folds into blocks of stride=4 rows x (4*Cin) features;
  output row f reads s2d blocks f and f+1, so a block of FB rows needs FB+1
  s2d blocks — delivered as two BlockSpec views of the same array (main
  tile + one overlap row), which Mosaic double-buffers like any other
  block;
- conv + bias + exact-erf GELU on the (Cout, FB, TP) tile in f32;
- the full DConv branch reuses ``ops.pallas_dconv._block_body`` (per-row
  GroupNorm stats over the valid (C, T) positions — identical semantics to
  the folded-rows XLA path in ``models.htdemucs._dconv_freq``);
- rewrite 1x1 as a (2C, C) matmul + sigmoid GLU;
- one HBM read of the s2d input, one write of the (B, C, F/4, T) output.

Time-branch HEncLayers are NOT fused here: their DConv GroupNorm statistics
span the full 66k-sample sequence (global per chunk), which breaks the
single-pass block locality this kernel depends on.

Measured on the real chip (docs/PERFORMANCE.md round 5): the kernel wins
only at **layer 0** (4->48, F=2048: 22.0 ms per-op -> 15.6 ms at FB>=8) —
the one layer whose contraction depth (Cin*k = 32) leaves the MXU almost
empty under XLA.  Layers 1+ have enough channel depth that XLA's own conv
fusion is faster (48->96: 8.0 ms per-op vs 11.1 ms kernel), so
``profitable`` gates the production path to layer 0 and
``ATSM_PALLAS_ENC=all`` keeps the every-layer config reproducible as the
recorded negative result.

Enabled by ``models.htdemucs._pallas_enc_mode`` (``ATSM_PALLAS_ENC``; auto
= profitable layers on the TPU backend) and covered by the on-hardware
parity gate in ``ops/kernel_gate.py`` together with the fused
transformer-layer kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_dconv
from .pallas_dconv import _WNAMES, _block_body, _gelu_exact, _pad_t

KERNEL = 8
STRIDE = 4
PAD = 2

# Empirical VMEM bytes per (Cout, FB, TP) f32 element for the whole fused
# body: the peak LIVE set is roughly rewrite-z (2C) + dconv y2 (2C) + the
# conv/GELU tile (C) + scheduling slack — Mosaic frees dead intermediates,
# so the naive sum-of-tensors model (110 B/elem) overestimates ~5x and
# starved layer 0 down to FB=4 (measured 20.75 ms vs 15.6 ms at the
# FB=8..32 plateau, all of which compile and fit).  22 B/elem reproduces
# the measured-feasible block sizes; same methodology as
# ops/pallas_dconv._row_block.
_BYTES_PER_ELEM = 22
_VMEM_BUDGET = 14 * 2 ** 20


def _freq_block(nb_out: int, t: int, cin: int, cout: int) -> int | None:
    """Largest FB dividing ``nb_out`` whose working set fits VMEM.

    ``ATSM_PALLAS_ENC_FB`` overrides the model (tile-size experiments; the
    on-hardware parity gate runs at the active value, kernel_gate.py).
    """
    import os

    forced = os.environ.get("ATSM_PALLAS_ENC_FB")
    if forced:
        fb = int(forced)
        return fb if nb_out % fb == 0 else None
    tp = _pad_t(t)
    for fb in (64, 32, 16, 8, 4, 2, 1):
        if nb_out % fb != 0:
            continue
        if (_BYTES_PER_ELEM * cout + 8 * 4 * cin) * fb * tp <= _VMEM_BUDGET:
            return fb
    return None


def supports(cin: int, cout: int, f: int, t: int) -> bool:
    """Fused path applies to the production stride-4 grid (F divisible by
    the stride) when one output-row block fits the VMEM budget and the
    DConv hidden width C/8 is whole.  This is the *correctness* gate; the
    production default additionally requires ``profitable``."""
    if f % STRIDE != 0 or f < STRIDE:
        return False
    if cout % 8 != 0:
        return False
    return _freq_block(f // STRIDE, t, cin, cout) is not None


def profitable(cin: int) -> bool:
    """Measured-win gate: only the first encoder layer (Cin=4, contraction
    depth 32) beats XLA's per-op fusion on hardware — 22.0 -> 15.6 ms;
    layer 1 (48->96) measured 11.1 ms kernel vs 8.0 ms per-op, layer 2
    worse (see module docstring / docs/PERFORMANCE.md)."""
    return cin <= 4


def _kernel(xm_ref, xn_ref, wc_ref, bc_ref, wr_ref, br_ref, *refs,
            t_valid: int, fb: int, tp: int, cin4: int, cout: int,
            dot_dtype):
    out_ref = refs[-1]
    dblocks = []
    for d in range(2):
        base = d * len(_WNAMES)
        dblocks.append({n: refs[base + i] for i, n in enumerate(_WNAMES)})

    # blocks arrive flat (1, 4Cin, FB*TP) — the f-block lives in the lane
    # dim so Mosaic's (8, 128) block-shape rule is met by TP % 128 == 0
    # (same layout trick as ops.pallas_dconv); the lane split (FB, TP) is
    # tile-aligned and free
    xm = xm_ref[...].reshape(cin4, fb, tp)
    xn = xn_ref[...].reshape(cin4, 1, tp)
    # output row f consumes s2d blocks f (taps 0-3) and f+1 (taps 4-7);
    # at fb == 1 the shifted view is exactly the overlap block (Mosaic
    # rejects the zero-size slice xm[:, 1:, :])
    xs = xn if fb == 1 else jnp.concatenate([xm[:, 1:, :], xn], axis=1)
    feat = jnp.concatenate([xm, xs], axis=0)          # (8Cin, FB, TP)

    # strided conv as one matmul: (Cout, 8Cin) @ (8Cin, FB*TP)
    y = jax.lax.dot_general(
        wc_ref[:].astype(feat.dtype), feat.reshape(2 * cin4, fb * tp),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y = y.reshape(cout, fb, tp) + bc_ref[:]
    mask = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, tp), 2)
            < t_valid).astype(jnp.float32)
    y = _gelu_exact(y) * mask          # bias leaks into the T pad: mask

    for d, blk in enumerate(dblocks):
        y = _block_body(y, blk, 2 ** d, mask, float(t_valid),
                        dot_dtype=dot_dtype)

    # rewrite 1x1 + GLU; the T-pad region is garbage after the biases but
    # is dropped by the caller's final slice
    z = jax.lax.dot_general(
        wr_ref[:].astype(dot_dtype),
        y.reshape(cout, fb * tp).astype(dot_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    z = z.reshape(2 * cout, fb, tp) + br_ref[:]
    out = z[:cout] * jax.nn.sigmoid(z[cout:])
    out_ref[...] = out.reshape(1, cout, fb * tp).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def henc_freq_fused(p, x: jnp.ndarray, interpret: bool = False
                    ) -> jnp.ndarray:
    """Fused frequency HEncLayer: ``(B, Cin, F, T) -> (B, Cout, F/4, T)``.

    Same contract as the per-op composition in
    ``models.htdemucs.henc_layer_apply`` (freq=True, no inject).  Call
    ``supports(...)`` first.
    """
    b, cin, f, t = x.shape
    cout = p["conv"]["weight"].shape[0]
    nb_out = f // STRIDE
    fb = _freq_block(nb_out, t, cin, cout)
    if fb is None:
        raise ValueError(f"unsupported henc shape {(b, cin, f, t)}")
    tp = _pad_t(t)

    # space-to-depth relayout (XLA, fused into the producer copy):
    # pad F by the conv padding, fold stride-4 phases into channels
    nb = nb_out + 1                                  # f/4 + 1 s2d blocks
    xp = jnp.pad(x, ((0, 0), (0, 0), (PAD, PAD + (nb * STRIDE - f - 2 * PAD)),
                     (0, tp - t)))
    # flatten (nb, tp) into one lane axis: Mosaic requires block last-two
    # dims divisible by (8, 128) or equal to the array dims, and the
    # f-block (fb as low as 1) cannot sit in the sublane dim — so blocks
    # are (1, 4Cin, fb*tp) over a (B, 4Cin, nb*tp) array, exactly the
    # ops.pallas_dconv layout
    x_s2d = (xp.reshape(b, cin, nb, STRIDE, tp)
             .transpose(0, 3, 1, 2, 4)
             .reshape(b, STRIDE * cin, nb * tp))

    # weights, pre-shaped so the kernel never rank-changes small vectors
    w = p["conv"]["weight"].astype(jnp.float32)      # (Cout, Cin, 8, 1)
    wc = w[:, :, :, 0].transpose(0, 2, 1).reshape(cout, KERNEL * cin)
    bc = p["conv"]["bias"].astype(jnp.float32)[:, None, None]
    wr = p["rewrite"]["weight"].astype(jnp.float32)[:, :, 0, 0]  # (2C, C)
    br = p["rewrite"]["bias"].astype(jnp.float32)[:, None, None]
    dweights = pallas_dconv._flatten_params(p["dconv"])
    weights = [wc, bc, wr, br] + dweights

    w_specs = [
        pl.BlockSpec(wt.shape,
                     functools.partial(lambda nd, bi, i: (0,) * nd, wt.ndim),
                     memory_space=pltpu.VMEM)
        for wt in weights
    ]
    cin4 = STRIDE * cin
    # Matmul input precision follows the input dtype, exactly like the
    # per-op XLA path it replaces: bf16 inputs ride the MXU's native bf16
    # rate (4x the emulated-f32 rate), f32 inputs stay f32 (the interpret
    # equality tests).  Accumulation and every intermediate stay f32.
    dot_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel, t_valid=t, fb=fb, tp=tp, cin4=cin4,
                          cout=cout, dot_dtype=dot_dtype),
        grid=(b, nb_out // fb),
        in_specs=[
            pl.BlockSpec((1, cin4, fb * tp), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            # one-s2d-block overlap view (output row f reads blocks f, f+1):
            # block length tp, indexed in units of tp
            pl.BlockSpec((1, cin4, tp),
                         lambda bi, i, fb=fb: (bi, 0, i * fb + fb),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((1, cout, fb * tp),
                               lambda bi, i: (bi, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, nb_out * tp), x.dtype),
        interpret=interpret,
    )(x_s2d, x_s2d, *weights)
    return out.reshape(b, cout, nb_out, tp)[:, :, :, :t]
