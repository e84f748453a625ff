"""Training-step throughput on the current device (reference anchor:
~15 h/epoch on CPU for the full MusDB18 train set, config.yaml:5).

    python scripts/train_throughput.py [--batch 8] [--steps 5]

Reports steps/s and audio-hours of training data consumed per wall-hour for
full-size AudioTextHTDemucs 6 s segments (forward + backward + AdamW update,
bf16 compute, head-only grads).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from pathlib import Path as _P
jax.config.update("jax_compilation_cache_dir",
                  str(_P(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np


def _measure(step, frozen, head, opt, batch_size: int, seg_t: int,
             steps: int, with_flops: bool = True) -> dict:
    from audio_to_sheet_music_tpu.train import TrainState
    from audio_to_sheet_music_tpu.utils.profiling import (flops_estimate,
                                                          peak_tflops)

    rng = np.random.default_rng(0)
    batch = {
        "mixture": jnp.asarray(
            rng.standard_normal((batch_size, 2, seg_t)), jnp.float32),
        "target": jnp.asarray(
            rng.standard_normal((batch_size, 2, seg_t)), jnp.float32),
        "input_ids": jnp.asarray(np.tile([0, 100, 2], (batch_size, 1)),
                                 jnp.int32),
        "attention_mask": jnp.ones((batch_size, 3), jnp.int32),
    }
    state = TrainState.create(head, opt)

    t0 = time.perf_counter()
    state, metrics = step(state, frozen, batch)
    _ = float(metrics["loss/total"])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, frozen, batch)
    _ = float(metrics["loss/total"])   # host sync
    dt = (time.perf_counter() - t0) / steps

    fl = flops_estimate(step, state, frozen, batch) if with_flops else -1.0
    tfs = fl / dt / 1e12 if fl > 0 else float("nan")
    return {"dt": dt, "compile_s": compile_s, "flops": fl, "tflops": tfs,
            "mfu_pct": 100.0 * tfs / peak_tflops()}


def _split(args) -> None:
    """Train-step composition: ladder of fwd-only -> fwd+bwd -> full step.

    Each rung is its own jitted program; successive differences attribute
    wall time to the backward pass and the AdamW update (the shared rungs
    amortise the dispatch floor the same way).  Interleaves rung dispatches
    to cancel weather.
    """
    import jax

    from audio_to_sheet_music_tpu.models import atht
    from audio_to_sheet_music_tpu.train import (TrainState, make_optimizer,
                                                make_train_step)
    from audio_to_sheet_music_tpu.train.step import _loss

    params = atht.init(jax.random.PRNGKey(0))
    frozen = {"htdemucs": params["htdemucs"], "clap": params["clap"]}
    opt = make_optimizer(total_steps=1000)
    seg_t = int(args.segment_seconds * 44100)
    b = args.batch
    rng = np.random.default_rng(0)
    batch = {
        "mixture": jnp.asarray(
            rng.standard_normal((b, 2, seg_t)), jnp.float32),
        "target": jnp.asarray(
            rng.standard_normal((b, 2, seg_t)), jnp.float32),
        "input_ids": jnp.asarray(np.tile([0, 100, 2], (b, 1)), jnp.int32),
        "attention_mask": jnp.ones((b, 3), jnp.int32),
    }
    state = TrainState.create(params["head"], opt)

    # frozen/batch must be ARGUMENTS, not closure constants: closed-over
    # arrays bake into the HLO as literals (~670 MB of towers), which the
    # tunnel's remote-compile endpoint rejects with HTTP 413.
    fwd = jax.jit(lambda h, fr, ba: _loss(h, fr, ba, {}, jnp.bfloat16)[0])
    # grads must be program OUTPUTS or XLA dead-code-eliminates the whole
    # backward pass (first run of this script measured bwd at -2 ms).
    fwd_bwd = jax.jit(lambda h, fr, ba: jax.value_and_grad(
        lambda hh: _loss(hh, fr, ba, {}, jnp.bfloat16)[0])(h))
    step = make_train_step(opt)

    def run_full(s=state):
        new_state, metrics = step(s, frozen, batch)
        return float(metrics["loss/total"])

    rungs = [("fwd only", lambda: float(fwd(state.head, frozen, batch))),
             ("fwd+bwd",
              lambda: float(fwd_bwd(state.head, frozen, batch)[0])),
             ("full step (fwd+bwd+AdamW)", run_full)]
    for name, f in rungs:
        t0 = time.perf_counter()
        f()                                    # compile
        print(f"compiled {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    times = {name: [] for name, _ in rungs}
    for _ in range(max(args.steps, 5)):
        for name, f in rungs:
            t0 = time.perf_counter()
            f()
            times[name].append(time.perf_counter() - t0)

    meds = {n: float(np.median(ts)) for n, ts in times.items()}

    # Cost analysis off the already-jitted wrappers: .lower().compile()
    # round-trips the in-process/persistent compile cache instead of
    # building a fresh program like flops_estimate(fn, ...) would.
    def _flops(jitted, *a) -> float:
        analysis = jitted.lower(*a).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", -1.0)) if analysis else -1.0

    fl_fwd = _flops(fwd, state.head, frozen, batch)
    fl_full = _flops(step, state, frozen, batch)
    print(f"batch {b} x {args.segment_seconds:.0f} s  (median of "
          f"{max(args.steps, 5)}; XLA-counted GFLOP — pallas_call bodies "
          f"are invisible to the counter)")
    prev = 0.0
    for name, _ in rungs:
        t = meds[name]
        print(f"  {name:<26} {t * 1e3:7.1f} ms   (+{(t - prev) * 1e3:6.1f} ms)")
        prev = t
    print(f"  fwd GFLOP {fl_fwd / 1e9:.0f}, full-step GFLOP {fl_full / 1e9:.0f} "
          f"(bwd+opt = {(fl_full - fl_fwd) / 1e9:.0f})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--segment-seconds", type=float, default=6.0)
    ap.add_argument("--sweep", action="store_true",
                    help="measure batch 4/8/16/32 and print the scaling "
                    "table (device saturation knee)")
    ap.add_argument("--split", action="store_true",
                    help="time fwd-only / fwd+bwd / full-step programs and "
                    "print the composition (fwd vs bwd vs optimizer)")
    args = ap.parse_args()

    if args.split:
        _split(args)
        return

    from audio_to_sheet_music_tpu.models import atht
    from audio_to_sheet_music_tpu.train import make_optimizer, make_train_step

    params = atht.init(jax.random.PRNGKey(0))
    frozen = {"htdemucs": params["htdemucs"], "clap": params["clap"]}
    opt = make_optimizer(total_steps=1000)
    step = make_train_step(opt)

    seg_t = int(args.segment_seconds * 44100)
    batches = [4, 8, 16, 32] if args.sweep else [args.batch]
    epoch_audio_sec = 100 * 240 * 4   # MusDB18 train: ~26.7 h of (seg, stem)
    print(f"{'batch':>5} {'steps/s':>8} {'audio-sec/s':>11} "
          f"{'TFLOP/s':>8} {'MFU%':>6} {'epoch-min':>9}")
    for b in batches:
        r = _measure(step, frozen, params["head"], opt, b, seg_t, args.steps)
        audio_rate = b * args.segment_seconds / r["dt"]
        print(f"{b:>5} {1.0 / r['dt']:>8.2f} {audio_rate:>11.1f} "
              f"{r['tflops']:>8.2f} {r['mfu_pct']:>6.2f} "
              f"{epoch_audio_sec / audio_rate / 60:>9.1f}",
              flush=True)
    print("(reference anchor: ~900 epoch-min on CPU, config.yaml:5; "
          "epoch-min = full-MusDB18 epoch at this rate)")


if __name__ == "__main__":
    main()
