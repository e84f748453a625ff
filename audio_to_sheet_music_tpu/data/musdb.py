"""MusDB18 host-side pipeline (reference `src/dataloader.py` redesigned).

The reference re-decodes the entire ``.stem.mp4`` with ffmpeg for **every
sample** (`src/dataloader.py:139-140`) — the acknowledged reason one epoch
took ~15 h (reference config.yaml:5).  Here decoding happens **once**:
``build_cache`` writes each track as a ``float32 .npy`` of shape
``(5, channels, T)`` (mixture, drums, bass, other, vocals), and training
memory-maps segments out of it — a pure ``np.load(mmap_mode='r')`` slice per
sample, no codec in the hot path.

Track sources, in order of preference:

- a cache directory of ``*.npy`` (decode-once artifacts),
- ``musdb18-hq``-style WAV folders (``track/{mixture,drums,...}.wav``) read
  with scipy,
- original ``*.stem.mp4`` via ``stempeg`` when that dependency exists
  (gated import; not present in every environment).

Dataset semantics match the reference: index map = (track, stem, segment)
over all 4 stems x ceil(T/segment) segments (`src/dataloader.py:61-74`),
deterministic or random segment choice (:86-121), random prompt per sample
(:15-17), joint gain augment p=0.5 in U(0.7, 1.3) and channel swap p=0.3
(:123-134), mono->stereo duplication (:156-158).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Sequence

import numpy as np

from ..text.prompts import STEM_NAME_TO_INDEX, STEM_NAMES, STEM_PROMPTS

WAV_STEM_FILES = ["mixture", "drums", "bass", "other", "vocals"]


@dataclasses.dataclass
class Track:
    """One MusDB track; ``load()`` returns float32 ``(5, C, T)``."""

    name: str
    path: Path
    kind: str               # "npy" | "wav_dir" | "stem_mp4"
    _length: int | None = None

    def load(self, mmap: bool = True) -> np.ndarray:
        if self.kind == "npy":
            return np.load(self.path, mmap_mode="r" if mmap else None)
        if self.kind == "wav_dir":
            from scipy.io import wavfile

            stems = []
            for stem in WAV_STEM_FILES:
                _, data = wavfile.read(self.path / f"{stem}.wav")
                if data.dtype == np.uint8:     # 8-bit PCM is offset-binary
                    data = (data.astype(np.float32) - 128.0) / 128.0
                elif data.dtype.kind in "iu":
                    data = data.astype(np.float32) / np.iinfo(data.dtype).max
                elif data.dtype != np.float32:  # float64 WAVs
                    data = data.astype(np.float32)
                stems.append(data.T if data.ndim == 2 else data[None, :])
            t = min(s.shape[-1] for s in stems)
            return np.stack([s[:, :t] for s in stems]).astype(np.float32)
        if self.kind == "stem_mp4":
            import stempeg  # gated: not installed everywhere

            audio, _ = stempeg.read_stems(str(self.path))
            return np.ascontiguousarray(audio.transpose(0, 2, 1), np.float32)
        raise ValueError(self.kind)

    @property
    def length(self) -> int:
        if self._length is None:
            self._length = int(self.load(mmap=True).shape[-1])
        return self._length


def discover_tracks(root: str | Path) -> List[Track]:
    """Find tracks under ``root`` (cache npy > wav dirs > stem.mp4)."""
    root = Path(root)
    tracks: List[Track] = []
    for p in sorted(root.glob("*.npy")):
        tracks.append(Track(p.stem, p, "npy"))
    if tracks:
        return tracks
    for d in sorted(p for p in root.iterdir() if p.is_dir()) if root.is_dir() else []:
        if (d / "mixture.wav").exists():
            tracks.append(Track(d.name, d, "wav_dir"))
    if tracks:
        return tracks
    for p in sorted(root.glob("*.stem.mp4")):
        tracks.append(Track(p.name.replace(".stem.mp4", ""), p, "stem_mp4"))
    return tracks


def build_cache(src_dir: str | Path, cache_dir: str | Path) -> List[Track]:
    """Decode every track once into ``cache_dir/*.npy`` (the 15 h/epoch fix)."""
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    out = []
    for track in discover_tracks(src_dir):
        dst = cache_dir / f"{track.name}.npy"
        if not dst.exists():
            # atomic: an interrupted save must not leave a truncated file
            # that later runs treat as a valid cache
            tmp = dst.with_suffix(f".{os.getpid()}.tmp.npy")
            np.save(tmp, track.load(mmap=False))
            os.replace(tmp, dst)
        out.append(Track(track.name, dst, "npy"))
    return out


class StemSegmentDataset:
    """(track, stem, segment) sample map over MusDB tracks."""

    def __init__(
        self,
        tracks: Sequence[Track],
        segment_samples: int = 264600,
        random_segments: bool = False,
        augment: bool = False,
        seed: int = 0,
    ):
        self.tracks = list(tracks)
        self.segment = segment_samples
        self.random_segments = random_segments
        self.augment = augment
        self.rng = np.random.default_rng(seed)
        self.index_map: List[tuple] = []
        for fi, tr in enumerate(self.tracks):
            n_seg = max(1, int(np.ceil(tr.length / self.segment)))
            for stem in STEM_NAMES:
                for seg in range(n_seg):
                    self.index_map.append((fi, stem, seg))

    def __len__(self) -> int:
        return len(self.index_map)

    def _slice(self, arr: np.ndarray, start: int) -> np.ndarray:
        seg = np.asarray(arr[..., start : start + self.segment], np.float32)
        if seg.shape[-1] < self.segment:
            pad = self.segment - seg.shape[-1]
            seg = np.pad(seg, [(0, 0)] * (seg.ndim - 1) + [(0, pad)])
        if seg.shape[0] == 1:  # mono -> stereo (reference :156-158)
            seg = np.repeat(seg, 2, axis=0)
        return seg

    def __getitem__(self, idx: int) -> Dict:
        fi, stem, seg_idx = self.index_map[idx]
        track = self.tracks[fi]
        stems = track.load(mmap=True)
        t = stems.shape[-1]
        if self.random_segments and t > self.segment:
            # inclusive upper bound: reference `random.randint(0, total -
            # segment)` includes the final window (dataloader.py:97), as
            # does the C++ loader's uniform_int_distribution
            start = int(self.rng.integers(0, t - self.segment + 1))
        else:
            start = min(seg_idx * self.segment, max(0, t - 1))
        mixture = self._slice(stems[0], start)
        target = self._slice(stems[STEM_NAME_TO_INDEX[stem] + 1], start)
        if self.augment:
            if self.rng.random() < 0.5:  # joint gain (reference :126-129)
                gain = self.rng.uniform(0.7, 1.3)
                mixture, target = mixture * gain, target * gain
            if self.rng.random() < 0.3:  # channel swap (:131-133)
                mixture, target = mixture[::-1].copy(), target[::-1].copy()
        prompt = STEM_PROMPTS[stem][int(self.rng.integers(len(STEM_PROMPTS[stem])))]
        return {
            "mixture": mixture,
            "target": target,
            "prompt": prompt,
            "stem_name": stem,
            "file_idx": fi,
            "segment_idx": seg_idx,
        }


class BatchLoader:
    """Shuffled, prefetching batch iterator with static shapes.

    Tokenises prompts host-side so the jitted step sees only arrays
    (SURVEY §7 hard part #4).  ``drop_last`` keeps the batch shape static —
    one compile for the whole run.  A background thread keeps ``prefetch``
    batches ready (the async pipeline the reference configured to 0 workers,
    `config.yaml:23`).
    """

    def __init__(self, dataset: StemSegmentDataset, batch_size: int,
                 tokenizer, shuffle: bool = True, seed: int = 0,
                 prefetch: int = 2, max_token_len: int = 16):
        self.dataset = dataset
        self.batch_size = batch_size
        self.tokenizer = tokenizer
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.max_token_len = max_token_len

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _make_batch(self, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        items = [self.dataset[int(i)] for i in idxs]
        ids, mask = self.tokenizer([it["prompt"] for it in items])
        l = self.max_token_len
        ids = np.pad(ids[:, :l], ((0, 0), (0, l - min(l, ids.shape[1]))),
                     constant_values=1)
        mask = np.pad(mask[:, :l], ((0, 0), (0, l - min(l, mask.shape[1]))))
        return {
            "mixture": np.stack([it["mixture"] for it in items]),
            "target": np.stack([it["target"] for it in items]),
            "input_ids": ids.astype(np.int32),
            "attention_mask": mask.astype(np.int32),
            "stem_index": np.array(
                [STEM_NAME_TO_INDEX[it["stem_name"]] for it in items], np.int32),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        if n_batches == 0:
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()   # set when the consumer abandons the
        # iterator (e.g. max_steps_per_epoch) so the producer exits instead
        # of blocking on a full queue forever (thread + batch leak)

        error: list[BaseException] = []

        def producer():
            try:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    idxs = order[b * self.batch_size
                                 : (b + 1) * self.batch_size]
                    batch = self._make_batch(idxs)
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.2)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # noqa: BLE001 - re-raised in consumer
                error.append(e)
            finally:
                # sentinel must ALWAYS be delivered (a dataset/tokenizer
                # failure without it would leave the consumer in q.get()
                # forever) and must stay abortable: the consumer may
                # abandon the iterator while the queue is full
                while not stop.is_set():
                    try:
                        q.put(None, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    if error:
                        raise RuntimeError(
                            "BatchLoader producer failed") from error[0]
                    break
                yield batch
        finally:
            stop.set()
