"""Trainer orchestration end-to-end on the synthetic fixture: train ->
validate -> checkpoint -> resume."""

import dataclasses

import numpy as np
import pytest

from audio_to_sheet_music_tpu.config import Config, DataConfig, TrainingConfig, WandbConfig, ModelConfig, OptimizerConfig
from audio_to_sheet_music_tpu.data import synthetic_tracks


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("train_data")
    synthetic_tracks(2, seconds=1.0, cache_dir=data_dir)
    work = tmp_path_factory.mktemp("work")
    cfg = Config(
        data=DataConfig(train_dir=str(data_dir), test_dir=str(data_dir),
                        segment_seconds=0.25, augment=True,
                        random_segments=True, pct_test=0.3),
        model=ModelConfig(compute_dtype="float32"),
        training=TrainingConfig(
            batch_size=2, num_epochs=2,
            optimizer=OptimizerConfig(lr=3e-4)),
        wandb=WandbConfig(use_wandb=False, log_every=1, validate_every=1,
                          save_every=1,
                          checkpoint_dir=str(work / "ckpt"),
                          output_dir=str(work / "out")),
    )
    return cfg, work


class TestTrainer:
    def test_train_validate_checkpoint(self, env):
        import jax

        from audio_to_sheet_music_tpu.models import atht
        from audio_to_sheet_music_tpu.train.trainer import train

        cfg, work = env
        result = train(cfg, params=atht.init_tiny(jax.random.PRNGKey(0)),
                       max_steps_per_epoch=2)
        assert np.isfinite(result["final_loss"])
        assert np.isfinite(result["best_sdr"])
        assert (work / "ckpt" / "latest").exists()
        assert (work / "ckpt" / "best").exists()
        assert (work / "ckpt" / "epoch_0001").exists()
        assert (work / "out" / "metrics.jsonl").stat().st_size > 0

    def test_resume_from_latest(self, env):
        """Second train() call resumes from epoch 2 and is a no-op loop."""
        import jax

        from audio_to_sheet_music_tpu.models import atht
        from audio_to_sheet_music_tpu.train.trainer import train

        cfg, work = env
        cfg2 = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, num_epochs=2))
        result = train(cfg2, params=atht.init_tiny(jax.random.PRNGKey(0)),
                       max_steps_per_epoch=2)
        assert result["final_epoch"] == 1


class TestClapSimilarity:
    def test_similarity_shapes_and_scale(self):
        import jax
        import jax.numpy as jnp

        from audio_to_sheet_music_tpu.models import clap

        params = clap.clap_init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        ids = jnp.asarray([[0, 5, 2], [0, 9, 2]])
        mask = jnp.ones_like(ids)
        feats = jnp.asarray(rng.standard_normal((3, 1, 1001, 64)), jnp.float32)
        la, lt = jax.jit(clap.similarity)(params, ids, mask, feats)
        assert la.shape == (3, 2) and lt.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lt).T, atol=1e-4)


class TestConfigParsing:
    def test_grad_clip_null_disables_clipping(self):
        """config.yaml's documented 'set to null to disable' must survive
        parsing (an explicit null is NOT a missing key)."""
        cfg = Config.from_dict(
            {"training": {"optimizer": {"grad_clip": None}}})
        assert cfg.training.optimizer.grad_clip is None
        # missing key keeps the reference default
        assert Config.from_dict({}).training.optimizer.grad_clip == 5.0

    def test_loss_weight_key_aliases(self):
        """Reference schema spells the keys asymmetrically
        (loss_weights.sdr / loss_weights.sisdr_weight); symmetric spellings
        are accepted as aliases."""
        ref = Config.from_dict(
            {"training": {"loss_weights": {"sdr": 0.7, "sisdr_weight": 0.3}}})
        assert (ref.training.sdr_weight, ref.training.sisdr_weight) == (0.7, 0.3)
        alias = Config.from_dict(
            {"training": {"loss_weights": {"sdr_weight": 0.6, "sisdr": 0.4}}})
        assert (alias.training.sdr_weight, alias.training.sisdr_weight) == (0.6, 0.4)
