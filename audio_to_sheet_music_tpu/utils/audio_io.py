"""WAV read/write + resampling without ffmpeg (scipy-based).

The reference leans on torchaudio/stempeg/ffmpeg for IO (`app.py:113-126`,
`test_inference.py:157-175`); this module covers the same needs with scipy:
float32 WAV IO, polyphase resampling to 44.1 kHz, mono->stereo.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np


def read_wav_pcm(path: str | Path) -> tuple[int, np.ndarray]:
    """-> (sample_rate, int16 (C, T)) with NO host-side conversion.

    16-bit WAVs (the common case) pass straight through; ``Separator``
    accepts int16 mixtures and converts on device.  Other encodings fall
    back to ``read_wav`` + host quantisation.
    """
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.T if data.ndim == 2 else data[None, :]
        return int(sr), np.ascontiguousarray(wav)
    sr, f32 = read_wav(path)
    return sr, (np.clip(f32, -1, 1) * 32767).astype(np.int16)


def payload_to_float(data: np.ndarray) -> np.ndarray:
    """Any WAV-payload dtype -> float32 in [-1, 1] (single home of the
    dtype-normalisation rules — the file reader, the gradio upload path
    and the HTTP upload path all share it)."""
    if data.dtype == np.float32:
        return data
    if data.dtype == np.uint8:          # 8-bit PCM is offset-binary
        return (data.astype(np.float32) - 128.0) / 128.0
    if np.issubdtype(data.dtype, np.integer):
        return data.astype(np.float32) / np.iinfo(data.dtype).max
    return data.astype(np.float32)


def read_wav(path: str | Path) -> tuple[int, np.ndarray]:
    """-> (sample_rate, float32 (C, T)).  ``path`` may be file-like."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    data = payload_to_float(data)
    wav = data.T if data.ndim == 2 else data[None, :]
    return int(sr), np.ascontiguousarray(wav)


def write_wav(path: str | Path, wav: np.ndarray, sr: int = 44100) -> None:
    """float32 (C, T) -> 16-bit PCM WAV (what the reference's soundfile
    calls produce, `test_inference.py:157-175`)."""
    from scipy.io import wavfile

    data = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    wavfile.write(path, sr, (data.T * 32767.0).astype(np.int16))


def write_wav_pcm(path: str | Path, pcm: np.ndarray, scale: float,
                  sr: int = 44100) -> None:
    """Write a ``separate_all_pcm`` stem: int16 ``(2, T)`` + its peak scale.

    The PCM encodes ``sample = pcm * scale / 32767``, i.e. a peak-normalised
    16-bit master; the bytes are written verbatim — **zero** host-side sample
    passes (this host's single core makes per-sample conversion the dominant
    serving cost).
    """
    from scipy.io import wavfile

    wavfile.write(path, sr, np.ascontiguousarray(pcm.T))


def resample(wav: np.ndarray, sr: int, target_sr: int = 44100) -> np.ndarray:
    """Polyphase resample (C, T) waveforms."""
    if sr == target_sr:
        return wav
    from scipy.signal import resample_poly

    g = math.gcd(sr, target_sr)
    return resample_poly(wav, target_sr // g, sr // g, axis=-1).astype(np.float32)


def to_stereo(wav: np.ndarray) -> np.ndarray:
    """Mono->stereo duplication (reference `app.py:121-125`)."""
    if wav.shape[0] == 1:
        return np.repeat(wav, 2, axis=0)
    return wav[:2]
