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

    def trace(flag: str):
        os.environ["ATSM_PALLAS_ATTN"] = flag
        fn = jax.jit(lambda p, x, xt: H.crosstransformer_apply(p, x, xt))
        out = fn(p, x, xt)          # compile with the gate as set
        _sync(out)
        return fn, out

    xla_fn, a = trace("0")
    pl_fn, bb = trace("1")
    err = max(float(jnp.max(jnp.abs(u.astype(jnp.float32)
                                    - v.astype(jnp.float32))))
              for u, v in zip(a, bb))
    scale = max(float(jnp.max(jnp.abs(u.astype(jnp.float32)))) for u in a)

    ta, tb = [], []
    for _ in range(args.iters):
        t0 = time.perf_counter(); _sync(xla_fn(p, x, xt))
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(pl_fn(p, x, xt))
        tb.append(time.perf_counter() - t0)
    print(f"crosstransformer (B={b}, freq {args.fr}x{args.t1}="
          f"{args.fr * args.t1} tok, time {args.t2} tok, dim {c}):")
    print(f"  xla    best {min(ta)*1e3:7.1f} ms  runs "
          f"{[round(t*1e3) for t in ta]}")
    print(f"  pallas best {min(tb)*1e3:7.1f} ms  runs "
          f"{[round(t*1e3) for t in tb]}")
    print(f"  speedup {min(ta)/min(tb):.3f}x   max|diff|={err:.3e} "
          f"(output scale {scale:.1f})")


if __name__ == "__main__":
    main()
