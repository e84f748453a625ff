"""CLAP audio tower: golden parity vs transformers (random weights) and
mel-frontend parity vs ClapFeatureExtractor."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.convert import torch_import
from audio_to_sheet_music_tpu.models import clap_audio
from audio_to_sheet_music_tpu.ops import mel


class TestMelFrontend:
    def test_parity_vs_hf_feature_extractor(self):
        from transformers import ClapFeatureExtractor

        fe = ClapFeatureExtractor(truncation="rand_trunc")
        rng = np.random.default_rng(0)
        wav = (0.2 * rng.standard_normal(mel.MAX_SAMPLES)).astype(np.float32)
        ref = fe(wav, sampling_rate=48000, truncation="rand_trunc",
                 return_tensors="np")["input_features"]       # (1, 1, 1001, 64)
        ours = mel.prepare_input_features(wav)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=1e-4)

    def test_repeatpad_short_audio(self):
        wav = np.ones(mel.MAX_SAMPLES // 3, np.float32)
        feats = mel.prepare_input_features(wav)
        assert feats.shape == (1, 1, 1001, 64)
        assert np.isfinite(feats).all()


class TestClapAudioParity:
    @pytest.fixture(scope="class")
    def towers(self):
        import torch
        from transformers import ClapAudioConfig, ClapAudioModelWithProjection

        torch.manual_seed(0)
        hf = ClapAudioModelWithProjection(ClapAudioConfig()).eval()
        state = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = torch_import.import_clap_audio_state(state, strict=False)
        return hf, params

    def test_audio_embeds_parity(self, towers):
        import torch

        hf, params = towers
        rng = np.random.default_rng(1)
        feats = rng.standard_normal((2, 1, 1001, 64)).astype(np.float32)
        with torch.no_grad():
            ref = hf(input_features=torch.tensor(feats)).audio_embeds.numpy()
        ours = np.asarray(clap_audio.audio_embeds(params, jnp.asarray(feats)))
        np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-2)

    def test_get_audio_features_normalised(self, towers):
        _, params = towers
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.standard_normal((1, 1, 1001, 64)), jnp.float32)
        emb = clap_audio.get_audio_features(params, feats)
        np.testing.assert_allclose(float(jnp.linalg.norm(emb)), 1.0, atol=1e-5)

    def test_reshape_mel2img_shape(self):
        x = jnp.zeros((1, 1, 1001, 64))
        img = clap_audio.reshape_mel2img(x)
        assert img.shape == (1, 1, 256, 256)
