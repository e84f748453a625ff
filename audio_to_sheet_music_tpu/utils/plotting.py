"""Spectrogram figure builders (reference `utils.py:30-356`).

Same visual contract: STFT n_fft 2048 / hop 512, power-dB with an 80 dB floor
below the max, magma colormap, time/frequency axes in s/Hz.  The dB
spectrogram itself is computed on device (``ops.dsp.spectrogram_db``);
matplotlib (Agg) only renders.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..ops import dsp  # noqa: E402

SR = 44100


def _db(wav: np.ndarray, n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    mono = np.asarray(wav, np.float32)
    if mono.ndim == 2:
        mono = mono.mean(axis=0)
    return np.asarray(dsp.spectrogram_db(mono, n_fft, hop))


def _imshow(ax, db: np.ndarray, sr: int, hop: int, title: str):
    extent = [0, db.shape[-1] * hop / sr, 0, sr / 2 / 1000]
    im = ax.imshow(db, origin="lower", aspect="auto", cmap="magma",
                   extent=extent)
    ax.set_title(title)
    ax.set_xlabel("time [s]")
    ax.set_ylabel("freq [kHz]")
    return im


def plot_spectrogram(wav: np.ndarray, title: str = "spectrogram",
                     sr: int = SR, hop: int = 512):
    """Single-waveform spectrogram figure (reference ``plot_spectrogram``)."""
    fig, ax = plt.subplots(figsize=(10, 4))
    im = _imshow(ax, _db(wav, hop=hop), sr, hop, title)
    fig.colorbar(im, ax=ax, format="%+2.0f dB")
    fig.tight_layout()
    return fig


def plot_separation_comparison(mixture: np.ndarray, target: np.ndarray,
                               estimate: np.ndarray, stem: str = "stem",
                               sr: int = SR):
    """Mixture / ground-truth / estimate triptych (reference
    ``plot_separation_spectrograms``, `utils.py:200-280`)."""
    fig, axes = plt.subplots(1, 3, figsize=(16, 4))
    for ax, (wav, title) in zip(axes, [
            (mixture, "mixture"),
            (target, f"{stem} (ground truth)"),
            (estimate, f"{stem} (estimated)")]):
        _imshow(ax, _db(wav), sr, 512, title)
    fig.tight_layout()
    return fig


def plot_all_stems(mixture: np.ndarray, stems: Mapping[str, np.ndarray],
                   sr: int = SR):
    """Mixture + every stem grid (reference ``plot_all_stems_spectrograms``)."""
    names = list(stems)
    fig, axes = plt.subplots(1, 1 + len(names),
                             figsize=(4 * (1 + len(names)), 4))
    _imshow(axes[0], _db(mixture), sr, 512, "mixture")
    for ax, name in zip(axes[1:], names):
        _imshow(ax, _db(stems[name]), sr, 512, name)
    fig.tight_layout()
    return fig


def save_figure(fig, path) -> None:
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
