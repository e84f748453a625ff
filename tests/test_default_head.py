"""Demo-default trained head: load_params(None) grafts the committed
artifact; env kill-switch and tiny-model guard behave."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from audio_to_sheet_music_tpu.models import atht
from audio_to_sheet_music_tpu.train.checkpoint import save_params_npz


def test_load_params_grafts_default_head(tmp_path, monkeypatch):
    monkeypatch.setenv("ATSM_TINY_MODEL", "1")
    template = atht.init_tiny(jax.random.PRNGKey(0))
    trained_head = jax.tree.map(lambda a: a + 1.0, template["head"])
    art = tmp_path / "trained_head.npz"
    save_params_npz(art, trained_head)

    monkeypatch.setattr(atht, "_default_head_path", lambda: art)
    params, pretrained = atht.load_params(None, jax.random.PRNGKey(0))
    assert not pretrained
    for got, want in zip(jax.tree.leaves(params["head"]),
                         jax.tree.leaves(trained_head)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    # towers untouched
    for got, want in zip(jax.tree.leaves(params["htdemucs"]),
                         jax.tree.leaves(template["htdemucs"])):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_explicit_checkpoint_beats_default_head(tmp_path, monkeypatch):
    monkeypatch.setenv("ATSM_TINY_MODEL", "1")
    template = atht.init_tiny(jax.random.PRNGKey(0))
    art = tmp_path / "trained_head.npz"
    save_params_npz(art, jax.tree.map(lambda a: a + 1.0, template["head"]))
    monkeypatch.setattr(atht, "_default_head_path", lambda: art)

    explicit = tmp_path / "explicit.npz"
    save_params_npz(explicit, template)      # full params, unmodified head
    params, _ = atht.load_params(str(explicit), jax.random.PRNGKey(0))
    for got, want in zip(jax.tree.leaves(params["head"]),
                         jax.tree.leaves(template["head"])):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_default_head_env_guards(monkeypatch):
    monkeypatch.setenv("ATSM_NO_DEFAULT_HEAD", "1")
    assert atht._default_head_path() is None
    monkeypatch.delenv("ATSM_NO_DEFAULT_HEAD")
    monkeypatch.setenv("ATSM_TINY_MODEL", "1")
    assert atht._default_head_path() is None
