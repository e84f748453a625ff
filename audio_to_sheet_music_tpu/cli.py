"""Installed console entry points (``pyproject.toml [project.scripts]``).

The repo-root ``main.py`` / ``benchmark.py`` delegate here so the same CLIs
work both from a checkout (``python main.py``) and from an installed wheel
(``atsm-train`` / ``atsm-benchmark``).  Reference counterparts:
`main.py:327` -> `src/train.py:274` and `benchmark.py:895-1016`.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def train_main() -> None:
    ap = argparse.ArgumentParser(description="Train AudioTextHTDemucs (TPU)")
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--max-steps-per-epoch", type=int, default=None)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard the batch over all local devices")
    args = ap.parse_args()

    from .config import Config
    from .train.trainer import train

    cfg = Config.from_yaml(args.config)
    mesh = None
    if args.data_parallel:
        from .parallel import make_mesh

        mesh = make_mesh()
    result = train(cfg, mesh=mesh,
                   max_steps_per_epoch=args.max_steps_per_epoch)
    print(result)


def benchmark_main() -> None:
    ap = argparse.ArgumentParser(description="MusDB18 separation benchmark")
    ap.add_argument("--models", nargs="+", default=["ours"],
                    choices=["ours", "ours-random", "htdemucs", "clapsep"])
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--test-dir", default=None)
    ap.add_argument("--output-dir", default="results")
    ap.add_argument("--max-tracks", type=int, default=None)
    ap.add_argument("--checkpoint", default=None,
                    help=".pt (converted) or params .npz for 'ours'")
    ap.add_argument("--synthetic", action="store_true",
                    help="run on the synthetic fixture instead of a dataset")
    ap.add_argument("--synthetic-tracks", type=int, default=5,
                    help="number of synthetic fixture tracks")
    ap.add_argument("--plot-spectrograms", action="store_true",
                    help="write per-track all-stems spectrogram PNGs")
    ap.add_argument("--use-wandb", action="store_true",
                    help="log aggregates to Weights & Biases")
    args = ap.parse_args()

    import jax

    from .config import Config
    from .data import discover_tracks, synthetic_tracks
    from .eval import evaluate_model, format_results_table, save_results
    from .eval.models import CLAPSepModel, HTDemucsBaseline, OursModel
    from .models import atht

    cfg = Config.from_yaml(args.config) if Path(args.config).exists() else Config()
    if args.synthetic:
        tracks = synthetic_tracks(args.synthetic_tracks, seconds=12.0)
    else:
        tracks = discover_tracks(args.test_dir or cfg.data.test_dir)
    if not tracks:
        raise SystemExit("no test tracks found")

    params, pretrained = atht.load_params(args.checkpoint,
                                          jax.random.PRNGKey(0))
    if not pretrained:
        print("benchmark: no converted checkpoint loaded — models run with "
              "random/npz weights; scores are NOT pretrained-baseline numbers")

    registry = {}
    for name in args.models:
        try:
            if name == "ours":
                registry["AudioTextHTDemucs (Ours)"] = OursModel(
                    params, pretrained=pretrained)
            elif name == "ours-random":
                # ablation row: same model, random head (no committed demo
                # head, no checkpoint) — the trained-vs-random delta is the
                # artifact's learning evidence
                rnd = atht.init_from_env(jax.random.PRNGKey(0))
                registry["AudioTextHTDemucs (Ours, random head)"] = OursModel(
                    rnd, pretrained=False)
            elif name == "htdemucs":
                m = HTDemucsBaseline(params["htdemucs"],
                                     pretrained=pretrained)
                registry[m.name] = m
            elif name == "clapsep":
                m = CLAPSepModel(clap_params=params["clap"],
                                 pretrained=pretrained)
                registry[m.name] = m
        except RuntimeError as e:   # graceful skip (reference :977-980)
            print(f"skipping {name}: {e}")

    out_dir = Path(args.output_dir)
    all_results = {}
    for name, model in registry.items():
        print(f"evaluating {name} on {len(tracks)} tracks")
        separate_all = model.separate_all
        if args.plot_spectrograms:
            from .utils import plotting

            def separate_all(mixture, _inner=model.separate_all, _name=name):
                stems = _inner(mixture)
                fig = plotting.plot_all_stems(mixture, dict(stems))
                spec_dir = out_dir / "spectrograms" / _name.replace(" ", "_")
                spec_dir.mkdir(parents=True, exist_ok=True)
                n = len(list(spec_dir.glob("*.png")))
                plotting.save_figure(fig, spec_dir / f"track_{n:03d}.png")
                return stems

        all_results[name] = evaluate_model(separate_all, tracks, name,
                                           max_tracks=args.max_tracks)

    print(format_results_table(all_results))
    out = out_dir / "evaluation_results.json"
    save_results(all_results, out)
    print(f"\nresults written to {out}")

    if args.use_wandb:
        try:
            import wandb

            from .eval import aggregate_results

            run = wandb.init(project="audio-text-htdemucs-benchmark")
            for name, results in all_results.items():
                agg = aggregate_results(results)
                run.log({f"{name}/sdr_{k}": v for k, v in agg["sdr"].items()})
                run.log({f"{name}/sisdr_{k}": v
                         for k, v in agg["sisdr"].items()})
            run.finish()
        except Exception as e:  # noqa: BLE001
            print(f"wandb logging skipped: {e}")
