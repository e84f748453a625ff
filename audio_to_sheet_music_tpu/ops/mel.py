"""Log-mel spectrogram frontend for the CLAP audio tower.

Matches HF ``ClapFeatureExtractor`` (48 kHz, Hann 1024, hop 480, 64 mels,
0-14 kHz, power 2, dB log): the slaney-norm/slaney-scale filterbank is the
one used for the un-fused (``rand_trunc``) path; the htk/no-norm filterbank
for the fusion path.  The filterbank matmul and the framed FFT both map
straight onto the MXU.  Parity-tested against ``transformers`` in
``tests/test_clap_audio.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import dsp

SAMPLE_RATE = 48_000
N_FFT = 1024
HOP = 480
N_MELS = 64
FREQ_MIN = 0.0
FREQ_MAX = 14_000.0
MAX_SAMPLES = 10 * SAMPLE_RATE


def _hz_to_mel(freq, scale: str):
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    mel = 3.0 * freq / 200.0
    if np.isscalar(freq):
        if freq >= 1000.0:
            mel = 15.0 + np.log(freq / 1000.0) / (np.log(6.4) / 27.0)
        return mel
    log_region = freq >= 1000.0
    mel = np.asarray(mel, dtype=np.float64)
    mel[log_region] = 15.0 + np.log(freq[log_region] / 1000.0) / (np.log(6.4) / 27.0)
    return mel


def _mel_to_hz(mel, scale: str):
    if scale == "htk":
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    freq = 200.0 * mel / 3.0
    log_region = mel >= 15.0
    freq = np.asarray(freq, dtype=np.float64)
    freq[log_region] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (mel[log_region] - 15.0))
    return freq


def mel_filter_bank(n_freqs: int = N_FFT // 2 + 1, n_mels: int = N_MELS,
                    fmin: float = FREQ_MIN, fmax: float = FREQ_MAX,
                    sr: int = SAMPLE_RATE, norm: str | None = "slaney",
                    scale: str = "slaney") -> np.ndarray:
    """Triangular filterbank ``(n_freqs, n_mels)`` (HF ``mel_filter_bank``)."""
    mel_min = _hz_to_mel(fmin, scale)
    mel_max = _hz_to_mel(fmax, scale)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, scale)
    fft_freqs = np.linspace(0, sr / 2, n_freqs)

    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("fusion_filters",))
def log_mel_spectrogram(waveform: jnp.ndarray,
                        fusion_filters: bool = False) -> jnp.ndarray:
    """48 kHz mono ``(..., T)`` -> log-mel ``(..., n_frames, 64)`` in dB.

    ``n_frames = T // 480 + 1`` (center=True reflect framing); 10 s -> 1001.
    """
    fb = mel_filter_bank(norm=None, scale="htk") if fusion_filters else \
        mel_filter_bank()
    z = dsp.stft(waveform, N_FFT, HOP, normalized=False)   # (..., 513, T')
    power = (z.real ** 2 + z.imag ** 2)
    mel = jnp.einsum("...ft,fm->...tm", power, jnp.asarray(fb))
    return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


def prepare_input_features(waveform_48k: np.ndarray) -> np.ndarray:
    """Raw mono 48 kHz audio -> ``(1, 1, frames, 64)`` model input.

    Implements the un-fused preprocessing: ``repeatpad`` short audio up to
    10 s, truncate longer audio to the first 10 s window (the deterministic
    variant of HF's ``rand_trunc``).
    """
    wav = np.asarray(waveform_48k, np.float32).reshape(-1)
    if len(wav) < MAX_SAMPLES:
        n_repeat = max(1, MAX_SAMPLES // max(len(wav), 1))
        wav = np.tile(wav, n_repeat)
        wav = np.pad(wav, (0, MAX_SAMPLES - len(wav)))
    else:
        wav = wav[:MAX_SAMPLES]
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
    return mel[None, None]
