"""Cross-cutting utilities: plotting, logging, profiling, audio IO."""

from . import audio_io, plotting, profiling, wandb_log  # noqa: F401
