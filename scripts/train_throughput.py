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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--segment-seconds", type=float, default=6.0)
    ap.add_argument("--sweep", action="store_true",
                    help="measure batch 4/8/16/32 and print the scaling "
                    "table (device saturation knee)")
    args = ap.parse_args()

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
