"""Sub-op ablation of one frequency HEncLayer (the measured encode hotspot).

    python scripts/profile_enc_ablate.py [--layer 0] [--chunks 12]

The marginal profiler (`profile_marginal.py`) showed enc0/enc1 at ~28 ms
each per 12 chunks while their FLOP content at even 10% MXU utilisation
would be ~2 ms — something in the lowering dominates.  This script times a
ladder of variants of the SAME layer-0 program, each with one sub-op
removed/replaced, so the difference isolates where the time goes:

- full            : conv -> (+emb) -> GELU -> DConv -> rewrite -> GLU
- no_dconv        : DConv branch replaced by identity
- no_rewrite      : rewrite+GLU removed
- conv_only       : just the strided conv
- conv_as_matmul  : the strided conv expressed as an explicit unfold+matmul
                    (the Pallas-kernel candidate lowering)
- dconv_only      : just the folded DConv stack on a conv-shaped input
- gelu_only       : conv + GELU (vs conv_only isolates the activation)

Each variant is its own jitted program; the ~65 ms dispatch floor is common
to all, so *differences* are meaningful (same method as profile_marginal).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from audio_to_sheet_music_tpu.models import atht, htdemucs
from audio_to_sheet_music_tpu.nn import core as nn
from audio_to_sheet_music_tpu.utils.profiling import (flops_estimate,
                                                      peak_tflops, timed)


def conv_as_matmul(p, x, stride=4, kernel=8, pad=2):
    """The freq strided conv as unfold+one-matmul (B,C,F,T)->(B,Co,F',T).

    Output freq rows are ``(F+2*pad - kernel)//stride + 1``; each gathers
    ``kernel`` input rows x ``C`` channels -> a (B*T*F', C*kernel) @
    (C*kernel, Co) matmul.
    """
    w = p["weight"]                       # (Co, C, k, 1) torch layout
    co, ci, k, _ = w.shape
    b, c, f, t = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    fo = (f + 2 * pad - kernel) // stride + 1
    # gather strided windows: (B, C, fo, k, T)
    idx = (jnp.arange(fo)[:, None] * stride + jnp.arange(k)[None, :])
    win = xp[:, :, idx, :]                 # (B, C, fo, k, T)
    lhs = win.transpose(0, 4, 2, 1, 3).reshape(b * t * fo, c * k)
    rhs = w[:, :, :, 0].reshape(co, ci * k).T.astype(x.dtype)
    y = lhs @ rhs + p["bias"].astype(x.dtype)
    return y.reshape(b, t, fo, co).transpose(0, 3, 2, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layer", type=int, default=0)
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = atht.init(jax.random.PRNGKey(0))
    lp = params["htdemucs"]["encoder"][args.layer]
    chans = [4] + htdemucs.CHANNELS
    cin = chans[args.layer]
    f_in = 2048 // (4 ** args.layer)
    b, t = args.chunks, 336
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, cin, f_in, t)), jnp.float32
                    ).astype(dtype)

    def full(lp, x):
        return htdemucs.henc_layer_apply(lp, x, freq=True).sum()

    def no_dconv(lp, x):
        y = nn.conv2d(lp["conv"], x, stride=(4, 1), padding=(2, 0))
        y = nn.gelu(y)
        z = nn.conv2d(lp["rewrite"], y)
        return nn.glu(z, axis=1).sum()

    def no_rewrite(lp, x):
        y = nn.conv2d(lp["conv"], x, stride=(4, 1), padding=(2, 0))
        y = nn.gelu(y)
        return htdemucs._dconv_freq(lp["dconv"], y).sum()

    def conv_only(lp, x):
        return nn.conv2d(lp["conv"], x, stride=(4, 1), padding=(2, 0)).sum()

    def gelu_only(lp, x):
        return nn.gelu(
            nn.conv2d(lp["conv"], x, stride=(4, 1), padding=(2, 0))).sum()

    def conv_mm(lp, x):
        return conv_as_matmul(lp["conv"], x).sum()

    def dconv_only(lp, x):
        y = nn.conv2d(lp["conv"], x, stride=(4, 1), padding=(2, 0))
        return (htdemucs._dconv_freq(lp["dconv"], y) - y).sum()

    def rewrite_only(lp, x):
        y = nn.conv2d(lp["conv"], x, stride=(4, 1), padding=(2, 0))
        z = nn.conv2d(lp["rewrite"], y)
        return nn.glu(z, axis=1).sum()

    peak = peak_tflops()
    print(f"freq HEncLayer {args.layer}: in (B={b}, C={cin}, F={f_in}, "
          f"T={t}), dtype {args.dtype}")
    for name, fn in [("full", full), ("no_dconv", no_dconv),
                     ("no_rewrite", no_rewrite), ("rewrite_only", rewrite_only),
                     ("dconv_only", dconv_only), ("gelu_only", gelu_only),
                     ("conv_only", conv_only), ("conv_as_matmul", conv_mm)]:
        r = timed(fn, lp, x, warmup=1, iters=3)
        fl = flops_estimate(fn, lp, x)
        tfs = fl / r["best_s"] / 1e12 if fl > 0 else float("nan")
        print(f"  {name:>15}: {r['best_s']*1e3:7.1f} ms  {fl/1e9:7.1f} GFLOP  "
              f"{tfs:6.2f} TFLOP/s ({100*tfs/peak:5.2f}% peak)", flush=True)

    # parity check of the matmul lowering (future Pallas kernel contract)
    a = nn.conv2d(lp["conv"], x.astype(jnp.float32), stride=(4, 1),
                  padding=(2, 0))
    m = conv_as_matmul(lp["conv"], x.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(a - m)))
    print(f"conv_as_matmul max|err| vs XLA conv (f32): {err:.2e}")


if __name__ == "__main__":
    main()
