"""Native C++ segment loader: parity with the Python dataset + threading."""

import numpy as np
import pytest

from audio_to_sheet_music_tpu.data import StemSegmentDataset, synthetic_tracks
from audio_to_sheet_music_tpu.data.native_loader import (NativeBatchLoader,
                                                         native_available)
from audio_to_sheet_music_tpu.text.prompts import STEM_NAMES
from audio_to_sheet_music_tpu.text.tokenizer import HashTokenizer

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


@pytest.fixture(scope="module")
def tracks(tmp_path_factory):
    return synthetic_tracks(2, seconds=3.0,
                            cache_dir=tmp_path_factory.mktemp("native_synth"))


def make_loader(tracks, **kw):
    return NativeBatchLoader([t.path for t in tracks], segment_samples=22050,
                             batch_size=4, tokenizer=HashTokenizer(), **kw)


class TestNativeLoader:
    def test_epoch_size_matches_python_dataset(self, tracks):
        ds = StemSegmentDataset(tracks, segment_samples=22050)
        loader = make_loader(tracks)
        assert len(loader) == len(ds) // 4

    def test_segments_match_source_arrays(self, tracks):
        """Every served (mixture, target) pair must be an exact slice of the
        right stem of some track (no augmentation, sequential segments)."""
        loader = make_loader(tracks, n_threads=2)
        arrs = [t.load(mmap=False) for t in tracks]
        n_checked = 0
        for batch in loader:
            assert batch["mixture"].shape == (4, 2, 22050)
            for i in range(4):
                mix = batch["mixture"][i]
                tgt = batch["target"][i]
                stem = int(batch["stem_index"][i]) + 1
                found = False
                for arr in arrs:
                    t_len = arr.shape[-1]
                    for start in range(0, t_len, 22050):
                        avail = min(22050, t_len - start)
                        if np.array_equal(mix[:, :avail],
                                          arr[0, :, start:start + avail]):
                            np.testing.assert_array_equal(
                                tgt[:, :avail],
                                arr[stem, :, start:start + avail])
                            found = True
                            break
                    if found:
                        break
                assert found, f"sample {n_checked} not a valid segment"
                n_checked += 1
        assert n_checked >= 8

    def test_full_epoch_and_reshuffle(self, tracks):
        loader = make_loader(tracks, n_threads=3)
        e1 = [b["stem_index"].copy() for b in loader]
        e2 = [b["stem_index"].copy() for b in loader]
        assert len(e1) == len(e2) == len(loader)
        # different epoch seeds -> different order (overwhelmingly likely)
        assert any(not np.array_equal(a, b) for a, b in zip(e1, e2))

    def test_prompt_tokens_match_stem(self, tracks):
        loader = make_loader(tracks)
        tok = HashTokenizer()
        batch = next(iter(loader))
        for i in range(4):
            stem = STEM_NAMES[int(batch["stem_index"][i])]
            from audio_to_sheet_music_tpu.text.prompts import STEM_PROMPTS

            candidates = []
            for p in STEM_PROMPTS[stem]:
                ids, _ = tok([p])
                row = np.full(16, 1, np.int32)
                row[: min(16, ids.shape[1])] = ids[0, :16]
                candidates.append(row)
            assert any(np.array_equal(batch["input_ids"][i], c)
                       for c in candidates)

    def test_augmented_loader_runs(self, tracks):
        loader = make_loader(tracks, augment=True, random_segments=True)
        batch = next(iter(loader))
        assert np.isfinite(batch["mixture"]).all()
