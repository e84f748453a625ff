"""Separator with a real 8-device mesh: the fused sweep's sharded chunk axis
must produce the same stems as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.infer import Separator
from audio_to_sheet_music_tpu.models import atht
from audio_to_sheet_music_tpu.parallel import make_mesh


class TestMeshSeparator:
    @pytest.fixture(scope="class")
    def params(self):
        return atht.init_tiny(jax.random.PRNGKey(0))

    def test_mesh_sweep_matches_single_device(self, params):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        kw = dict(segment_seconds=0.25, overlap_seconds=0.05,
                  compute_dtype=jnp.float32, wire_dtype=np.float32)
        single = Separator(params, **kw)
        sharded = Separator(params, mesh=mesh, **kw)
        assert sharded.bucket % 8 == 0

        rng = np.random.default_rng(0)
        song = (0.1 * rng.standard_normal((2, 30000))).astype(np.float32)
        a = single.separate(song, "vocals")
        b = sharded.separate(song, "vocals")
        np.testing.assert_allclose(a[:, 1:-1], b[:, 1:-1], atol=2e-3)
