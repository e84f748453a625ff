"""A/B benchmark: fused Pallas DConv vs XLA per-op lowering (same process).

    python scripts/bench_pallas_dconv.py [--iters 5]

Interleaves the two variants (A, B, A, B, ...) so tunnel/dispatch weather
cancels; reports best-of per variant per shape.  Shapes are the real folded
frequency-encoder DConv shapes at 12 chunks (`models.htdemucs._dconv_freq`).
Also checks compiled-on-TPU parity (bf16 tolerance).
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

from audio_to_sheet_music_tpu.models import htdemucs as H
from audio_to_sheet_music_tpu.ops import pallas_dconv
from audio_to_sheet_music_tpu.utils.profiling import _sync


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    shapes = [(6144, 48, 336), (1536, 96, 336), (384, 192, 336),
              (96, 384, 336)]
    for r, c, t in shapes:
        p = H.dconv_init(jax.random.PRNGKey(0), c)
        x = jnp.asarray(rng.standard_normal((r, c, t)), jnp.float32
                        ).astype(dtype)
        xla_fn = jax.jit(lambda p, x: H.dconv_apply(p, x))
        pl_fn = jax.jit(lambda p, x: pallas_dconv.dconv_rows(p, x))
        a = xla_fn(p, x)
        b = pl_fn(p, x)
        _sync((a, b))
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        ta, tb = [], []
        for _ in range(args.iters):
            t0 = time.perf_counter(); _sync(xla_fn(p, x))
            ta.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); _sync(pl_fn(p, x))
            tb.append(time.perf_counter() - t0)
        gf = 2 * 2e-9 * r * t * (c * (c // 8) * 3 + (c // 8) * 2 * c)
        print(f"(R={r:5d}, C={c:3d}, T={t}) ~{gf:5.1f} GFLOP  "
              f"xla best {min(ta)*1e3:7.1f} ms | pallas best "
              f"{min(tb)*1e3:7.1f} ms  ({min(ta)/min(tb):4.2f}x)  "
              f"err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
