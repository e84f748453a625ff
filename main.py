"""Training entry point: ``python main.py [--config config.yaml]``.

Reference counterpart: `main.py:327` -> `src/train.py:274`.  (The reference's
own ``main.py`` crashes on a stale import, SURVEY §2a "known defects" — this
one is tested.)
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description="Train AudioTextHTDemucs (TPU)")
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--max-steps-per-epoch", type=int, default=None)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard the batch over all local devices")
    args = ap.parse_args()

    from audio_to_sheet_music_tpu.config import Config
    from audio_to_sheet_music_tpu.train.trainer import train

    cfg = Config.from_yaml(args.config)
    mesh = None
    if args.data_parallel:
        from audio_to_sheet_music_tpu.parallel import make_mesh

        mesh = make_mesh()
    result = train(cfg, mesh=mesh,
                   max_steps_per_epoch=args.max_steps_per_epoch)
    print(result)


if __name__ == "__main__":
    main()
