"""Fused Pallas STFT kernel vs the reference framing+rfft (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.ops import dsp
from audio_to_sheet_music_tpu.ops.pallas_stft import stft_pallas


def reference_stft(x, n_fft, hop, n_frames):
    frames = dsp.frame(x, n_fft, hop, n_frames)
    win = dsp.hann_window(n_fft)
    z = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.moveaxis(z, -1, -2)


class TestPallasSTFT:
    @pytest.mark.parametrize("n_fft,hop,n_frames", [(1024, 256, 9),
                                                    (4096, 1024, 10)])
    def test_parity_interpret(self, n_fft, hop, n_frames):
        rng = np.random.default_rng(0)
        t = (n_frames - 1) * hop + n_fft
        x = jnp.asarray(rng.standard_normal((3, t)), jnp.float32)
        ref = np.asarray(reference_stft(x, n_fft, hop, n_frames))
        ours = np.asarray(stft_pallas(x, n_fft, hop, n_frames,
                                      interpret=True))
        assert ours.shape == ref.shape
        scale = np.abs(ref).max()
        np.testing.assert_allclose(ours.real, ref.real, atol=3e-4 * scale)
        np.testing.assert_allclose(ours.imag, ref.imag, atol=3e-4 * scale)

    def test_non_multiple_frame_count(self):
        """n_frames not divisible by the frame block still crops correctly."""
        rng = np.random.default_rng(1)
        n_fft, hop, n_frames = 1024, 256, 11   # 11 % 8 != 0
        t = (n_frames - 1) * hop + n_fft
        x = jnp.asarray(rng.standard_normal((2, t)), jnp.float32)
        ref = np.asarray(reference_stft(x, n_fft, hop, n_frames))
        ours = np.asarray(stft_pallas(x, n_fft, hop, n_frames,
                                      interpret=True))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(ours.real, ref.real, atol=3e-4 * scale)
