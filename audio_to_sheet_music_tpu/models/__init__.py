"""Model towers: HTDemucs, CLAP text, and the AudioTextHTDemucs composition."""

from . import atht, clap, clap_audio, clap_text, htdemucs  # noqa: F401
