"""Data-loader throughput: C++ segment loader vs the Python fallback.

    python scripts/loader_throughput.py [--tracks 8] [--seconds 60]

The reference's loader decoded the full track per sample (~15 h/epoch,
reference config.yaml:5); both of ours read a decode-once npy cache — this
measures the remaining host cost of slicing+augmenting+batching, which must
outrun the TPU step (4+ steps/s) on one core.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from audio_to_sheet_music_tpu.data import (BatchLoader, StemSegmentDataset,
                                               synthetic_tracks)
    from audio_to_sheet_music_tpu.data.native_loader import (NativeBatchLoader,
                                                             native_available)
    from audio_to_sheet_music_tpu.text.tokenizer import HashTokenizer

    with tempfile.TemporaryDirectory() as tmp:
        tracks = synthetic_tracks(args.tracks, seconds=args.seconds,
                                  cache_dir=tmp)
        seg = 264600
        tok = HashTokenizer()

        ds = StemSegmentDataset(tracks, seg, random_segments=True, augment=True)
        py_loader = BatchLoader(ds, args.batch, tok)
        t0 = time.perf_counter()
        n = sum(1 for _ in py_loader)
        py_dt = time.perf_counter() - t0
        print(f"python loader: {n} batches in {py_dt:.2f}s "
              f"({n / py_dt:.1f} batches/s)")

        if native_available():
            for n_threads in (1, 2, 4):
                nat = NativeBatchLoader([t.path for t in tracks], seg,
                                        args.batch, tok, n_threads=n_threads,
                                        augment=True, random_segments=True)
                t0 = time.perf_counter()
                n = sum(1 for _ in nat)
                nat_dt = time.perf_counter() - t0
                print(f"native loader ({n_threads} thread"
                      f"{'s' if n_threads > 1 else ''}): {n} batches in "
                      f"{nat_dt:.2f}s ({n / nat_dt:.1f} batches/s, "
                      f"{py_dt / nat_dt:.1f}x python)")
        else:
            print("native loader unavailable")


if __name__ == "__main__":
    main()
