"""Model towers: HTDemucs, CLAP text, and the AudioTextHTDemucs composition."""

from . import atht, clap_text, htdemucs  # noqa: F401
