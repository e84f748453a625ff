from . import dsp, losses  # noqa: F401
