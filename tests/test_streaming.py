"""Streaming separation == offline separation away from stream edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.infer import Separator
from audio_to_sheet_music_tpu.infer.streaming import StreamingSeparator
from audio_to_sheet_music_tpu.models import atht


@pytest.fixture(scope="module")
def separator():
    params = atht.init_tiny(jax.random.PRNGKey(0))
    return Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                     compute_dtype=jnp.float32, wire_dtype=np.float32)


class TestStreaming:
    def test_matches_offline(self, separator):
        rng = np.random.default_rng(0)
        song = (0.1 * rng.standard_normal((2, 36000))).astype(np.float32)
        offline = separator.separate_all(song, stems=("drums", "vocals"))

        stream = StreamingSeparator(separator, stems=("drums", "vocals"),
                                    block_chunks=4)
        pieces = []
        # feed in awkward unaligned sizes
        for start in range(0, song.shape[-1], 13_337):
            pieces.extend(stream.feed(song[:, start : start + 13_337]))
        pieces.append(stream.flush())
        out = np.concatenate(pieces, axis=-1)       # (S, 2, T)

        assert out.shape == (2, 2, song.shape[-1])
        for i, stem in enumerate(("drums", "vocals")):
            np.testing.assert_allclose(out[i, :, 1:-1],
                                       offline[stem][:, 1:-1], atol=2e-3)

    def test_short_stream_flush_only(self, separator):
        rng = np.random.default_rng(1)
        song = (0.1 * rng.standard_normal((2, 7000))).astype(np.float32)
        stream = StreamingSeparator(separator, stems=("bass",), block_chunks=4)
        pieces = list(stream.feed(song))
        tail = stream.flush()
        total = (np.concatenate(pieces + [tail], axis=-1)
                 if pieces else tail)
        assert total.shape == (1, 2, 7000)
        assert np.isfinite(total).all()
