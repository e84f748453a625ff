"""Per-layer lowering shootout for the freq-decoder ConvTranspose2d.

    python scripts/bench_convT_ablate.py [--chunks 12] [--loop 20]

The convT chain is the single largest head cost (~42 ms/stem at 12
chunks) yet runs ~10x off its memory roofline.  For EACH decoder layer,
loop-in-graph (floor-free) timing of:

- ``subpix``   : current ``nn.conv_transpose2d`` (phase bank, NCHW conv)
- ``nointer``  : the phase conv only, WITHOUT the (s, A) interleave
                 transpose (isolates the interleave/relayout cost)
- ``nhwc_mm``  : channels-last dot_general — taps as two shifted
                 (B*A*W, I) @ (I, s*O) matmuls, interleave on minor dims
- ``dilated``  : input-dilated conv (the naive lowering, for reference)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from audio_to_sheet_music_tpu.models import atht
from audio_to_sheet_music_tpu.nn import core as nn
from audio_to_sheet_music_tpu.nn.core import _subpixel_kernel_1d
from audio_to_sheet_music_tpu.utils.profiling import loop_cost


def convT_nhwc(p, x_nhwc, stride=4, padding=2):
    """x: (B, F, W, I) channels-last; returns (B, F_out, W, O)."""
    w = p["weight"]                       # (I, O, K, 1)
    i_ch, o_ch, kh, _ = w.shape
    bank = _subpixel_kernel_1d(w[..., 0].astype(x_nhwc.dtype), stride)
    # bank: (O*s, I, taps) with out[(o, r)] reading tap d' at x[a-1+d']
    b, f, wd, _ = x_nhwc.shape
    zrow = jnp.zeros((b, 1, wd, i_ch), x_nhwc.dtype)
    acc = None
    for d in range(2):                    # taps = 2 for K=8, s=4
        if d == 0:
            xs = jnp.concatenate([zrow, x_nhwc], axis=1)   # x[a-1]
        else:
            xs = jnp.concatenate([x_nhwc, zrow], axis=1)   # x[a]
        y = jax.lax.dot_general(
            xs, bank[:, :, d], (((3,), (1,)), ((), ())),
            preferred_element_type=x_nhwc.dtype)           # (B, A, W, s*O)
        acc = y if acc is None else acc + y
    a_len = f + 1
    # last dim is (o, r): (B, A, W, O, s) -> (B, A, s, W, O) -> (B, A*s, W, O)
    z = acc.reshape(b, a_len, wd, o_ch, 4).transpose(0, 1, 4, 2, 3)
    z = z.reshape(b, a_len * 4, wd, o_ch)
    out_h = (f - 1) * 4 - 2 * padding + kh
    z = z[:, padding : padding + out_h]
    if "bias" in p:
        z = z + p["bias"].astype(z.dtype)
    return z


def convT_dilated(p, x, stride=(4, 1), padding=(2, 0)):
    w = p["weight"].astype(x.dtype)
    i_ch, o_ch, kh, kw_ = w.shape
    wf = jnp.flip(w, axis=(-2, -1)).transpose(1, 0, 2, 3)
    y = jax.lax.conv_general_dilated(
        x, wf, window_strides=(1, 1),
        padding=[(kh - 1 - padding[0], kh - 1 - padding[0]), (0, 0)],
        lhs_dilation=tuple(stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)[None, :, None, None]
    return y


def convT_nointerleave(p, x, stride=(4, 1)):
    w = p["weight"].astype(x.dtype)
    bank = _subpixel_kernel_1d(w[..., 0], stride[0])[..., None]
    return jax.lax.conv_general_dilated(
        x, bank, window_strides=(1, 1), padding=[(1, 1), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    dtype = jnp.bfloat16
    b = args.chunks

    params = atht.init(jax.random.PRNGKey(0))
    layers = params["head"]["freq_decoder"]["layers"]
    rng = np.random.default_rng(0)
    fs = [8, 32, 128, 512]
    wd = 336

    print(f"(slope 4->24, chunks={b}) per-eval ms; W={wd}")
    for li, layer in enumerate(layers):
        conv = layer["conv"]
        i_ch = conv["weight"].shape[0]
        f = fs[li]
        x = jnp.asarray(rng.standard_normal((b, i_ch, f, wd)),
                        jnp.float32).astype(dtype)
        x_nhwc = jax.device_put(x.transpose(0, 2, 3, 1))
        cases = [
            ("subpix", x, lambda p, a, s: jnp.sum(nn.conv_transpose2d(
                p, a + s.astype(dtype) * 1e-30, (4, 1), (2, 0)
            ).astype(jnp.float32))),
            ("nointer", x, lambda p, a, s: jnp.sum(convT_nointerleave(
                p, a + s.astype(dtype) * 1e-30).astype(jnp.float32))),
            ("nhwc_mm", x_nhwc, lambda p, a, s: jnp.sum(convT_nhwc(
                p, a + s.astype(dtype) * 1e-30).astype(jnp.float32))),
            ("dilated", x, lambda p, a, s: jnp.sum(convT_dilated(
                p, a + s.astype(dtype) * 1e-30).astype(jnp.float32))),
        ]
        o_ch = conv["weight"].shape[1]
        gflop = 2 * b * (f + 1) * wd * (i_ch * 2) * (o_ch * 4) / 1e9
        line = [f"L{li} {i_ch:>3}->{o_ch:<3} F{f:<4} ({gflop:6.1f} GFLOP):"]
        for name, arr, body in cases:
            per = loop_cost(lambda s, p, a, _b=body: _b(p, a, s),
                            conv, arr, iters=args.iters)
            line.append(f"{name}={per*1e3:6.2f}ms")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
