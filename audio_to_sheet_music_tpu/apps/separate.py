"""Single-song stem extraction CLI (reference `test_inference.py:21-205`).

    python -m audio_to_sheet_music_tpu.apps.separate \
        --track <track.npy | track_dir | mixture.wav> \
        [--checkpoint ckpt.pt|params.npz] [--stems drums bass other vocals piano] \
        [--output-dir out] [--plots]

Extracts every requested stem (free text — zero-shot stems like "piano" or
"guitar" work exactly like the reference's STEMS extras, test_inference.py:19),
reports SDR against ground truth when the track provides stems, writes
``extracted_<stem>.wav`` + ``mixture.wav`` and optional spectrogram PNGs.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np



def load_track(path: Path):
    """-> (mixture (2,T), stems dict or None)."""
    from ..data.musdb import Track
    from ..text.prompts import STEM_NAMES
    from ..utils import audio_io

    if path.suffix == ".npy":
        arr = Track(path.stem, path, "npy").load(mmap=False)
        return arr[0], {s: arr[1 + i] for i, s in enumerate(STEM_NAMES)}
    if path.is_dir() and (path / "mixture.wav").exists():
        arr = Track(path.name, path, "wav_dir").load(mmap=False)
        return arr[0], {s: arr[1 + i] for i, s in enumerate(STEM_NAMES)}
    if path.suffix == ".wav":
        # 16-bit 44.1 kHz stereo (the common case) stays int16: half the
        # upload bytes and the int16->float conversion runs on DEVICE
        # (Separator accepts int16 mixtures) — this host's single core
        # makes a float pass the dominant pre-separation cost
        sr, pcm = audio_io.read_wav_pcm(path)
        if sr == 44100 and pcm.dtype == np.int16 and pcm.shape[0] == 2:
            return pcm, None
        sr, wav = audio_io.read_wav(path)
        wav = audio_io.to_stereo(audio_io.resample(wav, sr))
        return wav, None
    if path.suffixes[-2:] == [".stem", ".mp4"]:
        arr = Track(path.name, path, "stem_mp4").load(mmap=False)
        return arr[0], {s: arr[1 + i] for i, s in enumerate(STEM_NAMES)}
    raise SystemExit(f"unsupported track format: {path}")


def main() -> None:
    ap = argparse.ArgumentParser(description="Extract stems from one song")
    ap.add_argument("--track", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--stems", nargs="+",
                    default=["drums", "bass", "other", "vocals"])
    ap.add_argument("--output-dir", default="inference_results")
    ap.add_argument("--segment-seconds", type=float, default=6.0)
    ap.add_argument("--overlap-seconds", type=float, default=1.5)
    ap.add_argument("--plots", action="store_true")
    args = ap.parse_args()

    import jax

    from ..eval.harness import compute_sdr
    from ..infer import Separator
    from ..models import atht
    from ..utils import audio_io

    mixture, gt_stems = load_track(Path(args.track))

    params, pretrained = atht.load_params(args.checkpoint,
                                          jax.random.PRNGKey(0))
    sep = Separator(params, args.segment_seconds, args.overlap_seconds,
                    pretrained=pretrained)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if mixture.dtype == np.int16:     # int16 fast path: bytes verbatim
        audio_io.write_wav_pcm(out_dir / "mixture.wav", mixture, 1.0)
    else:
        audio_io.write_wav(out_dir / "mixture.wav", mixture)

    report = {}
    if gt_stems is None and not args.plots:
        # Fast serving path: PCM bytes straight from the device to the
        # WAVs.  absolute=True quantises at absolute level on device, so
        # these WAVs play at the SAME loudness as the float path below
        # (and as the reference's soundfile outputs) — the flag must not
        # change audio levels.
        pcm, scales = sep.separate_all_pcm(mixture, stems=args.stems,
                                           absolute=True)
        for i, stem in enumerate(args.stems):
            audio_io.write_wav_pcm(out_dir / f"extracted_{stem}.wav",
                                   pcm[i], float(scales[i]))
    else:
        if mixture.dtype == np.int16:
            mixture = mixture.astype(np.float32) / 32768.0
        outs = sep.separate_all(mixture, stems=args.stems)
        for stem, est in outs.items():
            audio_io.write_wav(out_dir / f"extracted_{stem}.wav", est)
            if gt_stems and stem in gt_stems:
                t = min(est.shape[-1], gt_stems[stem].shape[-1])
                sdr = compute_sdr(est[:, :t], gt_stems[stem][:, :t])
                report[stem] = sdr
                print(f"{stem:>10}: SDR {sdr:6.2f} dB")
            if args.plots:
                from ..utils import plotting

                tgt = gt_stems[stem] if gt_stems and stem in gt_stems else est
                fig = plotting.plot_separation_comparison(mixture, tgt, est,
                                                          stem)
                plotting.save_figure(fig, out_dir / f"spectrogram_{stem}.png")

    (out_dir / "sdr_report.json").write_text(json.dumps(report, indent=2))
    print(f"outputs written to {out_dir}")


if __name__ == "__main__":
    main()
