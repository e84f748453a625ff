"""Data pipeline + training-step tests on the synthetic MusDB fixture."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_to_sheet_music_tpu.data import (BatchLoader, StemSegmentDataset,
                                           synthetic_tracks)
from audio_to_sheet_music_tpu.text.prompts import PROMPT_TO_STEM, STEM_NAMES
from audio_to_sheet_music_tpu.text.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def tracks(tmp_path_factory):
    return synthetic_tracks(2, seconds=4.0,
                            cache_dir=tmp_path_factory.mktemp("synth"))


class TestDataset:
    def test_index_map_covers_all_stems_and_segments(self, tracks):
        ds = StemSegmentDataset(tracks, segment_samples=44100)
        # 2 tracks x 4 stems x ceil(4 s / 1 s) segments
        assert len(ds) == 2 * 4 * 4
        stems = {s for _, s, _ in ds.index_map}
        assert stems == set(STEM_NAMES)

    def test_item_contract(self, tracks):
        ds = StemSegmentDataset(tracks, segment_samples=44100)
        item = ds[0]
        assert item["mixture"].shape == (2, 44100)
        assert item["target"].shape == (2, 44100)
        assert item["prompt"] in PROMPT_TO_STEM
        assert PROMPT_TO_STEM[item["prompt"]] == item["stem_name"]

    def test_mixture_is_sum_of_stems(self, tracks):
        """Synthetic fixture invariant: mixture == sum(stems)."""
        arr = tracks[0].load(mmap=False)
        np.testing.assert_allclose(arr[0], arr[1:].sum(axis=0), atol=1e-5)

    def test_last_segment_zero_padded(self, tracks):
        ds = StemSegmentDataset(tracks, segment_samples=30000)
        last = max(range(len(ds)), key=lambda i: ds.index_map[i][2])
        item = ds[last]
        assert item["mixture"].shape == (2, 30000)

    def test_augment_keeps_mixture_target_aligned(self, tracks):
        ds = StemSegmentDataset(tracks, segment_samples=44100, augment=True,
                                random_segments=True, seed=1)
        base = StemSegmentDataset(tracks, segment_samples=44100)
        # Gain applies jointly: target/mixture ratio where both nonzero stays
        # bounded by the augmentation range applied to both.
        item = ds[0]
        assert np.isfinite(item["mixture"]).all()
        assert np.isfinite(item["target"]).all()
        assert item["mixture"].shape == base[0]["mixture"].shape


class TestBatchLoader:
    def test_batches_static_shapes(self, tracks):
        ds = StemSegmentDataset(tracks, segment_samples=22050)
        loader = BatchLoader(ds, batch_size=4, tokenizer=HashTokenizer())
        batches = list(loader)
        assert len(batches) == len(ds) // 4
        for b in batches:
            assert b["mixture"].shape == (4, 2, 22050)
            assert b["input_ids"].shape == (4, 16)
            assert b["attention_mask"].shape == b["input_ids"].shape
            assert b["stem_index"].shape == (4,)

    def test_shuffle_deterministic_per_seed(self, tracks):
        ds = StemSegmentDataset(tracks, segment_samples=22050)
        tok = HashTokenizer()
        a = next(iter(BatchLoader(ds, 4, tok, seed=7)))
        b = next(iter(BatchLoader(ds, 4, tok, seed=7)))
        np.testing.assert_array_equal(a["stem_index"], b["stem_index"])

    def test_tokenizer_truncates_to_position_table(self):
        """Prompts longer than RoBERTa's 512 usable positions must truncate
        (HF model_max_length behaviour) — out-of-range position ids would
        silently gather the clamped last embedding row on TPU."""
        from audio_to_sheet_music_tpu.text.tokenizer import EOS, MAX_TOKENS

        ids, mask = HashTokenizer()([" ".join(["word"] * 1000), "drums"])
        assert ids.shape[1] <= MAX_TOKENS
        assert mask.shape == ids.shape
        assert int(ids[0, -1]) == EOS     # framing preserved after truncation


class TestTrainStep:
    def test_loss_decreases_on_overfit(self, tracks):
        """A few steps on one tiny batch must reduce the loss (head learns)."""
        from audio_to_sheet_music_tpu.models import atht
        from audio_to_sheet_music_tpu.train import (TrainState, make_optimizer,
                                                    make_train_step)

        ds = StemSegmentDataset(tracks, segment_samples=11025)
        loader = BatchLoader(ds, batch_size=2, tokenizer=HashTokenizer(), seed=0)
        batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}

        params = atht.init_tiny(jax.random.PRNGKey(0))
        frozen = {"htdemucs": params["htdemucs"], "clap": params["clap"]}
        opt = make_optimizer(lr=3e-4, total_steps=None)
        state = TrainState.create(params["head"], opt)
        step = make_train_step(opt, compute_dtype=jnp.float32)

        losses = []
        for _ in range(4):
            state, metrics = step(state, frozen, batch)
            losses.append(float(metrics["loss/total"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 4

    def test_checkpoint_roundtrip(self, tracks, tmp_path):
        from audio_to_sheet_music_tpu.models import atht
        from audio_to_sheet_music_tpu.train import (TrainState, checkpoint,
                                                    make_optimizer)

        head = atht.head_init(jax.random.PRNGKey(1))
        opt = make_optimizer()
        state = TrainState.create(head, opt)
        checkpoint.save_checkpoint(tmp_path, state, epoch=3,
                                   metrics={"sdr": 4.2}, is_best=True)
        assert checkpoint.latest_checkpoint(tmp_path) is not None
        restored, epoch, metrics = checkpoint.load_checkpoint(
            tmp_path / "best", state)
        assert epoch == 3
        assert metrics["sdr"] == pytest.approx(4.2)
        for a, b in zip(jax.tree.leaves(state.head),
                        jax.tree.leaves(restored.head)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_params_npz_roundtrip(self, tmp_path):
        from audio_to_sheet_music_tpu.models import atht
        from audio_to_sheet_music_tpu.train import checkpoint

        head = atht.head_init(jax.random.PRNGKey(2))
        checkpoint.save_params_npz(tmp_path / "head.npz", head)
        restored = checkpoint.load_params_npz(tmp_path / "head.npz", head)
        for a, b in zip(jax.tree.leaves(head), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
