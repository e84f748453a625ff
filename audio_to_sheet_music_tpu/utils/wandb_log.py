"""W&B logging helpers (reference `utils.py:363-500`).

Same surface as the reference's LX observability layer: figure -> wandb.Image,
waveform -> wandb.Audio, separation-triptych logger, all-stems logger.  Every
function no-ops cleanly when wandb is unavailable or no run is active, so the
trainer works identically with logging on or off.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _wandb():
    try:
        import wandb

        return wandb if wandb.run is not None else None
    except ImportError:
        return None


def log_spectrogram_to_wandb(wav: np.ndarray, key: str, step: int | None = None,
                             title: str = "spectrogram") -> None:
    wb = _wandb()
    if wb is None:
        return
    from . import plotting

    fig = plotting.plot_spectrogram(wav, title)
    wb.log({key: wb.Image(fig)}, step=step)
    import matplotlib.pyplot as plt

    plt.close(fig)


def log_audio_to_wandb(wav: np.ndarray, key: str, step: int | None = None,
                       sr: int = 44100) -> None:
    wb = _wandb()
    if wb is None:
        return
    wb.log({key: wb.Audio(np.asarray(wav, np.float32).T, sample_rate=sr)},
           step=step)


def log_separation_to_wandb(mixture: np.ndarray, target: np.ndarray,
                            estimate: np.ndarray, stem: str,
                            step: int | None = None,
                            prefix: str = "separation") -> None:
    """Triptych spectrograms + the three audio clips
    (reference `utils.py:421-453`)."""
    wb = _wandb()
    if wb is None:
        return
    from . import plotting

    fig = plotting.plot_separation_comparison(mixture, target, estimate, stem)
    wb.log({f"{prefix}/{stem}/spectrograms": wb.Image(fig)}, step=step)
    import matplotlib.pyplot as plt

    plt.close(fig)
    for name, wav in (("mixture", mixture), ("target", target),
                      ("estimate", estimate)):
        log_audio_to_wandb(wav, f"{prefix}/{stem}/{name}", step)


def log_all_stems_to_wandb(mixture: np.ndarray,
                           stems: Mapping[str, np.ndarray],
                           step: int | None = None) -> None:
    wb = _wandb()
    if wb is None:
        return
    from . import plotting

    fig = plotting.plot_all_stems(mixture, stems)
    wb.log({"all_stems/spectrograms": wb.Image(fig)}, step=step)
    import matplotlib.pyplot as plt

    plt.close(fig)
