"""audio_to_sheet_music_tpu — TPU-native text-conditioned music stem separation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``savage-hacker14/audio-to-sheet-music`` (AudioTextHTDemucs): frozen HTDemucs
dual time/frequency encoders + cross-domain transformer, frozen CLAP text
tower, trainable text cross-attention + single-stem decoders, spectrogram
masking, chunked overlap-add full-song inference, config-driven training and
a MusDB18 benchmark harness.

Subpackages
-----------
- ``ops``      — DSP (STFT/iSTFT/CaC/overlap-add) and loss functions.
- ``nn``       — functional neural-net primitives (explicit param pytrees).
- ``models``   — HTDemucs, CLAP-text, and the AudioTextHTDemucs composition.
- ``text``     — prompt templates and an offline byte-level BPE tokenizer.
- ``convert``  — PyTorch checkpoint → JAX pytree weight converter.
- ``data``     — MusDB18 host-side pipeline + synthetic fixtures.
- ``train``    — jitted train step, optax optimizers, Orbax checkpoints.
- ``infer``    — chunk-grid planner + batched overlap-add separation.
- ``eval``     — benchmark harness emitting the reference JSON schema.
- ``parallel`` — mesh/sharding helpers (pjit over data/chunk axes).
- ``utils``    — config loading, plotting, optional wandb logging.
"""

__version__ = "0.4.0"       # keep in sync with pyproject.toml


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for every entry point.

    Sweep/train-step compiles take minutes on the TPU compile service; the
    cache makes every rerun warm.  Override the location with
    ``ATSM_COMPILE_CACHE``; disable with ``ATSM_COMPILE_CACHE=0``.
    """
    import os
    import pathlib

    loc = os.environ.get("ATSM_COMPILE_CACHE")
    if loc == "0":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return  # caller already configured one
        path = pathlib.Path(loc) if loc else (
            pathlib.Path(__file__).resolve().parent.parent / ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 — cache is an optimisation only
        pass


_enable_compile_cache()

from . import config, convert, data, infer, models, nn, ops, parallel, text, train  # noqa: F401,E402

# the two objects almost every user starts from
from .infer import Separator, StreamingSeparator  # noqa: F401,E402
from .models.atht import load_params  # noqa: F401,E402
