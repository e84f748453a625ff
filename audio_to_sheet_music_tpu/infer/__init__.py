"""Full-song inference: chunk-grid planning + batched overlap-add."""

from .chunked import (  # noqa: F401
    ChunkGrid,
    fade_weights,
    frame_song,
    overlap_add_weighted,
    plan_chunks,
    separate_chunked,
)
from .session import Separator  # noqa: F401
from .streaming import StreamingSeparator  # noqa: F401
