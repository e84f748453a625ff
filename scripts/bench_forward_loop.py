"""Floor-free device timing: N chained forwards inside ONE XLA program.

    python scripts/bench_forward_loop.py [--chunks 12] [--loop 8]

Per-dispatch timings on this environment carry a ~54 ms (and
weather-dependent) dispatch/sync floor, which buried every sub-100 ms
comparison today.  This benchmark runs forwards chained through a data
dependency inside one jitted program at TWO loop counts and reports the
slope ``(T(n2) - T(n1)) / (n2 - n1)`` — the floor cancels exactly
(see ``utils.profiling.loop_cost``).

Variants (``--variants``, comma-separated): ``baseline`` and any of the
opt-in fast paths — ``pallas_dconv`` (fused VMEM DConv kernel),
``fast_enc`` (channel-packed layer-0 conv), ``fast_dconv`` (time-packed
DConv compress dot), ``pallas_attn`` (fused attention block),
``pallas_layer`` (fused transformer layer), ``pallas_enc`` (fused freq
encoder kernel at its profitable layer 0), ``pallas_enc_all`` (the kernel
forced on EVERY supported layer — the recorded negative config),
``pallas_enc_layer`` (both default-on kernels), ``all_fast`` (the three
round-4 opt-in gates together).  Env gates are read at trace time, so
each variant jits its own program pair.

Interleaves variant dispatches A/B/A/B to cancel residual weather.
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

from audio_to_sheet_music_tpu.models import atht
from audio_to_sheet_music_tpu.utils.profiling import _sync, peak_tflops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--loop", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--encode-only", action="store_true")
    ap.add_argument("--variants", default="baseline,all_fast")
    args = ap.parse_args()
    dtype = jnp.bfloat16

    params = atht.init(jax.random.PRNGKey(0))
    b, t = args.chunks, 264600
    rng = np.random.default_rng(0)
    wav = jnp.asarray(0.1 * rng.standard_normal((b, 2, t)), jnp.float32)
    embs4 = jnp.zeros((4, 512), jnp.float32)
    n = args.loop

    def make(loop_body, n):
        def fn(params, wav, embs):
            def body(_, w):
                out = loop_body(params, w, embs)
                # thread a negligible dependency so iterations chain
                return w + 1e-30 * out
            return jax.lax.fori_loop(0, n, body, wav)
        return jax.jit(fn)

    def four_stem(params, w, embs):
        enc = atht.encode_mixture(params, w, dtype)
        stacked = atht.apply_head_multi(params, enc, embs)   # (S, B, 2, L)
        return stacked[0].astype(jnp.float32)

    def encode(params, w, embs):
        enc = atht.encode_mixture(params, w, dtype)
        return enc["x_enc"].sum() * jnp.ones_like(w)

    body = encode if args.encode_only else four_stem
    n1, n2 = 2, 2 + n

    GATES = ("ATSM_PALLAS_DCONV", "ATSM_FAST_ENC", "ATSM_FAST_DCONV",
             "ATSM_PALLAS_ATTN", "ATSM_PALLAS_LAYER", "ATSM_PALLAS_ENC")
    OFF = {"ATSM_PALLAS_LAYER": "0", "ATSM_PALLAS_ENC": "0"}
    VARIANTS = {
        # ATSM_PALLAS_LAYER / ATSM_PALLAS_ENC are tri-state with auto-ON
        # for TPU, so the XLA baseline must pin them off explicitly.
        "baseline": dict(OFF),
        "default": {},           # whatever the backend's auto gates choose
        "pallas_dconv": {"ATSM_PALLAS_DCONV": "1", **OFF},
        "fast_enc": {"ATSM_FAST_ENC": "1", **OFF},
        "fast_dconv": {"ATSM_FAST_DCONV": "1", **OFF},
        "pallas_attn": {"ATSM_PALLAS_ATTN": "1", **OFF},
        "pallas_layer": {"ATSM_PALLAS_LAYER": "1", "ATSM_PALLAS_ENC": "0"},
        "pallas_enc": {"ATSM_PALLAS_ENC": "1", "ATSM_PALLAS_LAYER": "0"},
        "pallas_enc_all": {"ATSM_PALLAS_ENC": "all",
                           "ATSM_PALLAS_LAYER": "0"},
        "pallas_enc_layer": {"ATSM_PALLAS_ENC": "1",
                             "ATSM_PALLAS_LAYER": "1"},
        "all_fast": {"ATSM_FAST_ENC": "1", "ATSM_FAST_DCONV": "1",
                     "ATSM_PALLAS_ATTN": "1", **OFF},
        "all_fast_layer": {"ATSM_FAST_ENC": "1", "ATSM_FAST_DCONV": "1",
                           "ATSM_PALLAS_LAYER": "1", "ATSM_PALLAS_ENC": "0"},
    }
    variants = []
    for name in args.variants.split(","):
        env = VARIANTS[name.strip()]
        for g in GATES:
            os.environ.pop(g, None)
        os.environ.update(env)
        # trace now (env is read at trace time), under a distinct wrapper
        f1, f2 = make(body, n1), make(body, n2)
        _sync(f1(params, wav, embs4))          # compile + warm
        _sync(f2(params, wav, embs4))
        variants.append((name, f1, f2))
    for g in GATES:
        os.environ.pop(g, None)

    times = {name: ([], []) for name, _, _ in variants}
    for _ in range(args.iters):
        for name, f1, f2 in variants:
            for slot, fn in ((0, f1), (1, f2)):
                t0 = time.perf_counter()
                _sync(fn(params, wav, embs4))
                times[name][slot].append(time.perf_counter() - t0)

    audio = b * 6.0 * (1 if args.encode_only else 4)
    print(f"{'variant':>14}  per-fwd(ms)  stem-audio-sec/s   "
          f"(slope {n1}->{n2}, chunks={b})")
    for name, _, _ in variants:
        per = (min(times[name][1]) - min(times[name][0])) / (n2 - n1)
        print(f"{name:>14}  {per*1e3:10.1f}  {audio/per:15.1f}", flush=True)


if __name__ == "__main__":
    main()
