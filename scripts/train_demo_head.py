"""Train the committed demo head with the REAL orchestrator.

    python scripts/train_demo_head.py [--steps 2000] [--fresh]

Round-4 verdict #7: the previous committed head came from
``scripts/learning_proof.py``'s raw step loop (240 steps).  This script runs
``train.trainer.train`` itself — auto-resume, per-stem validation SDR,
best/latest/epoch Orbax checkpoints, JSONL metric logging — on the synthetic
fixture family, then exports the **best-validation** head as the committed
demo artifact plus its training log:

    artifacts/trained_head.npz       (grafted by default, atht.load_params)
    artifacts/train_metrics.jsonl    (the orchestrator's own metric log)

Data: 16 synthetic fixture tracks x 48 s (seed 0) for training, 3 held-out
tracks x 12 s (seed 99) for validation — same generator family as the eval
artifact (data/synth.py), disjoint tracks.  64 steps/epoch at batch 8.

The run exercises resume too: re-invoking after an interrupt continues from
``latest`` (trainer auto-resume); ``--fresh`` clears the checkpoint dir.
"""
import argparse
import json
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402

from audio_to_sheet_music_tpu.config import Config  # noqa: E402
from audio_to_sheet_music_tpu.data import synthetic_tracks  # noqa: E402
from audio_to_sheet_music_tpu.models import atht  # noqa: E402
from audio_to_sheet_music_tpu.train import (TrainState,  # noqa: E402
                                            checkpoint as ckpt,
                                            make_optimizer, trainer)

WORK = pathlib.Path("/tmp/atsm_demo_head")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2048,
                    help="total train steps (rounded up to whole epochs)")
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--fresh", action="store_true",
                    help="clear the checkpoint dir instead of auto-resuming")
    args = ap.parse_args()

    if args.fresh and (WORK / "ckpt").exists():
        shutil.rmtree(WORK / "ckpt")
    synthetic_tracks(16, seconds=48.0, cache_dir=WORK / "train", seed=0)
    synthetic_tracks(3, seconds=12.0, cache_dir=WORK / "val", seed=99)

    # 16 tracks x 4 stems x 8 segments / batch 8 = 64 steps/epoch
    steps_per_epoch = 64
    epochs = -(-args.steps // steps_per_epoch)
    cfg = Config.from_dict({
        "data": {"train_dir": str(WORK / "train"),
                 "test_dir": str(WORK / "val"),
                 "segment_seconds": 6.0},
        "model": {"compute_dtype": "bfloat16"},
        "training": {"batch_size": 8, "num_epochs": epochs,
                     "optimizer": {"lr": 3e-4, "weight_decay": 1e-2,
                                   "grad_clip": 5.0}},
        "wandb": {"use_wandb": False, "log_every": 16,
                  "validate_every": 4, "save_every": 8,
                  "checkpoint_dir": str(WORK / "ckpt"),
                  "output_dir": str(WORK / "results")},
    })

    t0 = time.time()
    result = trainer.train(cfg)
    dt = time.time() - t0
    total = epochs * steps_per_epoch
    print(f"trainer.train: {total} steps in {dt:.0f}s "
          f"({total / dt:.2f} steps/s incl. val/ckpt), "
          f"best val SDR {result['best_sdr']:.2f} dB")

    # Export the BEST-validation head (not the last) as the demo artifact.
    params = atht.init(jax.random.PRNGKey(0))
    opt = make_optimizer(total_steps=1)
    best_dir = WORK / "ckpt" / "best"
    state, epoch, metrics = ckpt.load_checkpoint(
        best_dir, TrainState.create(params["head"], opt))
    print(f"best checkpoint: epoch {epoch}, metrics {metrics}")

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    ckpt.save_params_npz(out / "trained_head.npz",
                         jax.tree.map(np.asarray, state.head))
    shutil.copyfile(WORK / "results" / "metrics.jsonl",
                    out / "train_metrics.jsonl")
    (out / "trained_head.json").write_text(json.dumps({
        "steps": total, "epochs": epochs, "best_epoch": epoch,
        "best_val_sdr_db": metrics.get("val_sdr"),
        "wall_seconds": round(dt, 1),
        "trainer": "train.trainer.train (orchestrator: auto-resume, "
                   "per-stem val SDR, best/latest/epoch checkpoints)",
        "data": "16x48s synthetic fixture tracks (seed 0) train, "
                "3x12s held-out (seed 99) val",
    }, indent=2) + "\n")
    print(f"exported {out / 'trained_head.npz'} + train_metrics.jsonl")


if __name__ == "__main__":
    main()
