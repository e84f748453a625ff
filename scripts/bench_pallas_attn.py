"""A/B benchmark: fused Pallas attention block vs XLA einsum attention.

    python scripts/bench_pallas_attn.py [--iters 7] [--chunks 12]

Times the FULL cross-domain transformer (5 layers x 2 branches, dim 512) at
the real 6 s bottleneck shapes — freq tokens 2688, time tokens 1344 at 12
chunks (`HTDemucs_Fwd_Pass.txt:69-71`) — with the attention tail running
(A) through XLA's einsum path and (B) through `ops.pallas_attn.attn_block`
(scores/softmax/AV/out-proj/residual fused on-chip).  Interleaved runs so
tunnel weather cancels; best-of per variant; bf16 parity check.

The decision rule (VERDICT r3 #4): whichever measures faster becomes the
TPU default; a loss is recorded in docs/PERFORMANCE.md with the others.
"""

from __future__ import annotations

import argparse
import os
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

from audio_to_sheet_music_tpu.models import htdemucs as H
from audio_to_sheet_music_tpu.utils.profiling import _sync


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--fr", type=int, default=8)
    ap.add_argument("--t1", type=int, default=336)
    ap.add_argument("--t2", type=int, default=1344)
    args = ap.parse_args()

    b, c = args.chunks, H.BOTTOM_CHANNELS
    rng = np.random.default_rng(0)
    p = H.crosstransformer_init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((b, c, args.fr, args.t1)),
                    jnp.float32).astype(jnp.bfloat16)
    xt = jnp.asarray(rng.standard_normal((b, c, args.t2)),
                     jnp.float32).astype(jnp.bfloat16)

    def trace(attn: str, layer: str):
        os.environ["ATSM_PALLAS_ATTN"] = attn
        os.environ["ATSM_PALLAS_LAYER"] = layer
        fn = jax.jit(lambda p, x, xt: H.crosstransformer_apply(p, x, xt))
        out = fn(p, x, xt)          # compile with the gates as set
        _sync(out)
        return fn, out

    variants = [("xla", "0", "0"),
                ("pallas-attn", "1", "0"),      # fused attention tail
                ("pallas-layer", "0", "1")]     # fully fused layer
    fns, outs = {}, {}
    for name, attn, layer in variants:
        fns[name], outs[name] = trace(attn, layer)

    ref = outs["xla"]
    scale = max(float(jnp.max(jnp.abs(u.astype(jnp.float32)))) for u in ref)
    errs = {
        name: max(float(jnp.max(jnp.abs(u.astype(jnp.float32)
                                        - v.astype(jnp.float32))))
                  for u, v in zip(ref, outs[name]))
        for name, _, _ in variants[1:]
    }

    times = {name: [] for name, _, _ in variants}
    for _ in range(args.iters):       # interleaved so weather cancels
        for name, _, _ in variants:
            t0 = time.perf_counter(); _sync(fns[name](p, x, xt))
            times[name].append(time.perf_counter() - t0)
    base = min(times["xla"])
    print(f"crosstransformer (B={b}, freq {args.fr}x{args.t1}="
          f"{args.fr * args.t1} tok, time {args.t2} tok, dim {c}, "
          f"output scale {scale:.1f}):")
    for name, _, _ in variants:
        ts = times[name]
        err = f"  max|diff|={errs[name]:.3e}" if name in errs else ""
        print(f"  {name:12s} best {min(ts)*1e3:7.1f} ms  "
              f"speedup {base/min(ts):.3f}x  runs "
              f"{[round(t*1e3) for t in ts]}{err}")


if __name__ == "__main__":
    main()
