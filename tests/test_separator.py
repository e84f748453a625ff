"""End-to-end Separator tests: fused multi-stem path == per-stem path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.infer import Separator
from audio_to_sheet_music_tpu.models import atht


@pytest.fixture(scope="module")
def separator():
    params = atht.init_tiny(jax.random.PRNGKey(0))
    return Separator(params, segment_seconds=0.25, overlap_seconds=0.05,
                     compute_dtype=jnp.float32, wire_dtype=np.float32)


class TestSeparator:
    def test_separate_shapes_and_cache(self, separator):
        rng = np.random.default_rng(0)
        song = rng.standard_normal((2, 22050)).astype(np.float32) * 0.1
        out = separator.separate(song, "vocals")
        assert out.shape == song.shape
        assert np.isfinite(out).all()
        assert "vocals" in separator._emb_cache

    def test_fused_multi_stem_matches_per_stem(self, separator):
        """separate_all (1 encoder pass) == separate x4 (4 encoder passes)."""
        rng = np.random.default_rng(1)
        song = rng.standard_normal((2, 22050)).astype(np.float32) * 0.1
        fused = separator.separate_all(song, stems=("drums", "vocals"))
        for stem in ("drums", "vocals"):
            single = separator.separate(song, stem)
            np.testing.assert_allclose(fused[stem], single, atol=1e-4)

    def test_distinct_prompts_give_distinct_stems(self, separator):
        rng = np.random.default_rng(2)
        song = rng.standard_normal((2, 22050)).astype(np.float32) * 0.1
        outs = separator.separate_all(song, stems=("drums", "bass"))
        assert np.abs(outs["drums"] - outs["bass"]).max() > 1e-6
