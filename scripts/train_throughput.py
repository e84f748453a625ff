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
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--segment-seconds", type=float, default=6.0)
    args = ap.parse_args()

    from audio_to_sheet_music_tpu.models import atht
    from audio_to_sheet_music_tpu.train import (TrainState, make_optimizer,
                                                make_train_step)

    params = atht.init(jax.random.PRNGKey(0))
    frozen = {"htdemucs": params["htdemucs"], "clap": params["clap"]}
    opt = make_optimizer(total_steps=1000)
    state = TrainState.create(params["head"], opt)
    step = make_train_step(opt)

    t = int(args.segment_seconds * 44100)
    rng = np.random.default_rng(0)
    batch = {
        "mixture": jnp.asarray(rng.standard_normal((args.batch, 2, t)), jnp.float32),
        "target": jnp.asarray(rng.standard_normal((args.batch, 2, t)), jnp.float32),
        "input_ids": jnp.asarray(np.tile([0, 100, 2], (args.batch, 1)), jnp.int32),
        "attention_mask": jnp.ones((args.batch, 3), jnp.int32),
    }

    t0 = time.perf_counter()
    state, metrics = step(state, frozen, batch)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss/total']):.3f}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, frozen, batch)
    _ = float(metrics["loss/total"])   # host sync
    dt = (time.perf_counter() - t0) / args.steps

    audio_sec_per_step = args.batch * args.segment_seconds
    print(f"steps/s: {1.0 / dt:.2f}  "
          f"audio-hours/hour: {audio_sec_per_step / dt / 3600 * 3600:.0f}  "
          f"(batch {args.batch}, {args.segment_seconds:.0f}s segments)")
    # MusDB18 train: 100 tracks x ~4 min x 4 stems ~= 26.7 h of (segment,
    # stem) audio per epoch; the reference needed ~15 h/epoch on CPU.
    epoch_audio_sec = 100 * 240 * 4
    print(f"est. full-MusDB18 epoch: {epoch_audio_sec / (audio_sec_per_step / dt) / 60:.1f} min "
          f"(reference anchor: ~900 min on CPU)")


if __name__ == "__main__":
    main()
