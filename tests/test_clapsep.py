"""CLAPSep baseline: native model forward + benchmark-protocol wrapper.

Reference contract: `benchmark.py:277-548` (HF-downloaded model, pos/neg text
queries, mono 32 kHz, 10 s/1 s linear OLA, graceful skip when unavailable).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_to_sheet_music_tpu.eval.models import CLAPSepModel
from audio_to_sheet_music_tpu.models import clap_text, clapsep


class TestClapSepForward:
    @pytest.fixture(scope="class")
    def params(self):
        return clapsep.clapsep_init(jax.random.PRNGKey(0), clapsep.TINY)

    def test_forward_shape_and_finiteness(self, params, rng):
        wav = rng.standard_normal((2, 6400)).astype(np.float32) * 0.1
        ep = rng.standard_normal((2, 512)).astype(np.float32)
        en = rng.standard_normal((2, 512)).astype(np.float32)
        out = clapsep.forward(params, jnp.asarray(wav), jnp.asarray(ep),
                              jnp.asarray(en), clapsep.TINY)
        assert out.shape == wav.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_mask_bounded(self, params, rng):
        """The mask network emits a [0,1] sigmoid mask (phase=False contract)
        and the masked output cannot exceed the mixture's energy scale."""
        wav = rng.standard_normal((1, 6400)).astype(np.float32) * 0.1
        ep = rng.standard_normal((1, 512)).astype(np.float32)
        en = np.zeros((1, 512), np.float32)
        from audio_to_sheet_music_tpu.ops import dsp
        cfg = clapsep.TINY
        z = dsp.stft(jnp.asarray(wav), cfg.n_fft, cfg.hop)
        feats = jnp.log1p(jnp.abs(z) * cfg.spec_factor).transpose(0, 2, 1)
        q = jnp.concatenate([jnp.asarray(ep), jnp.asarray(en)], axis=-1)
        mask = np.asarray(clapsep.apply_mask_net(params, feats, q, cfg))
        assert mask.min() >= 0.0 and mask.max() <= 1.0
        out = np.asarray(clapsep.forward(params, jnp.asarray(wav),
                                         jnp.asarray(ep), jnp.asarray(en),
                                         cfg))
        assert (out ** 2).sum() <= 1.2 * (wav ** 2).sum()

    def test_query_conditions_output(self, params, rng):
        wav = rng.standard_normal((1, 6400)).astype(np.float32) * 0.1
        en = np.zeros((1, 512), np.float32)
        e1 = rng.standard_normal((1, 512)).astype(np.float32)
        e2 = rng.standard_normal((1, 512)).astype(np.float32)
        o1 = clapsep.forward(params, jnp.asarray(wav), jnp.asarray(e1),
                             jnp.asarray(en), clapsep.TINY)
        o2 = clapsep.forward(params, jnp.asarray(wav), jnp.asarray(e2),
                             jnp.asarray(en), clapsep.TINY)
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


class TestClapSepBaseline:
    @pytest.fixture(scope="class")
    def model(self):
        clap = clap_text.clap_text_init(jax.random.PRNGKey(1), num_layers=2,
                                        hidden=128, vocab_size=50265)
        return CLAPSepModel(clap_params=clap, cfg=clapsep.TINY,
                            chunk_seconds=0.5, overlap_seconds=0.05)

    def test_reference_protocol_separate(self, model, rng):
        song = (0.1 * rng.standard_normal((2, 44100))).astype(np.float32)
        out = model.separate(song, "vocals")
        assert out.shape == song.shape
        assert np.isfinite(out).all()
        # stereo duplication (reference benchmark.py:537)
        np.testing.assert_array_equal(out[0], out[1])

    def test_harness_runs_on_synthetic_fixture(self, model, tmp_path):
        from audio_to_sheet_music_tpu.data.synth import synthetic_tracks
        from audio_to_sheet_music_tpu.eval.harness import evaluate_model

        tracks = synthetic_tracks(1, seconds=1.0, cache_dir=tmp_path)
        results = evaluate_model(model.separate_all, tracks,
                                 model.name, verbose=False)
        assert len(results) == 1
        assert np.isfinite(results[0].sdr["average"])

    def test_missing_weights_graceful_skip(self):
        with pytest.raises(RuntimeError, match="skipping"):
            CLAPSepModel(weights="/nonexistent/clapsep.ckpt")
