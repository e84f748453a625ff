"""Spectrogram report tool (reference `generate_spectrogram.py:30-179`).

    python -m audio_to_sheet_music_tpu.apps.spectrogram_tool \
        --test-dir <tracks> [--tracks name1 name2] [--checkpoint ...] \
        [--output-dir spectrograms]

Reruns the separator on the named tracks (default: every discovered track)
and writes an all-stems overview PNG plus per-stem comparison PNGs.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description="Generate spectrogram reports")
    ap.add_argument("--test-dir", required=True)
    ap.add_argument("--tracks", nargs="*", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output-dir", default="spectrograms")
    args = ap.parse_args()

    import jax

    from ..data import discover_tracks
    from ..infer import Separator
    from ..models import atht
    from ..text.prompts import STEM_NAMES
    from ..utils import plotting

    params, pretrained = atht.load_params(args.checkpoint,
                                          jax.random.PRNGKey(0))
    sep = Separator(params, pretrained=pretrained)

    tracks = discover_tracks(args.test_dir)
    if args.tracks:
        tracks = [t for t in tracks if t.name in set(args.tracks)]
    if not tracks:
        # a --tracks typo (or an empty dir) must not exit 0 having
        # silently written nothing
        raise SystemExit(f"no matching tracks under {args.test_dir!r}"
                         + (f" for names {args.tracks}" if args.tracks
                            else ""))
    out_root = Path(args.output_dir)
    for track in tracks:
        arr = track.load(mmap=False)
        mixture = arr[0]
        gt = {s: arr[1 + i] for i, s in enumerate(STEM_NAMES)}
        est = sep.separate_all(mixture)
        out_dir = out_root / track.name
        out_dir.mkdir(parents=True, exist_ok=True)
        plotting.save_figure(plotting.plot_all_stems(mixture, est),
                             out_dir / "all_stems.png")
        for stem in STEM_NAMES:
            fig = plotting.plot_separation_comparison(mixture, gt[stem],
                                                      est[stem], stem)
            plotting.save_figure(fig, out_dir / f"{stem}.png")
        print(f"{track.name}: wrote {1 + len(STEM_NAMES)} figures")


if __name__ == "__main__":
    main()
