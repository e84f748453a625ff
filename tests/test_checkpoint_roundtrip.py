"""Full-width checkpoint round trip against the reference's OWN module shape.

The strongest in-env guarantee that the published checkpoint
(`jacob1576/AudioTextHTDemucs`, README.md:100-101) loads with zero code
changes: build the full composite torch module exactly as the reference does
(`ATHTDemucs_v2.py:142-188` — attributes ``htdemucs``/``clap``/``text_attn``/
``freq_decoder``/``time_decoder``/``freq_out``/``time_out``; head classes are
the reference's own, the tower is the dump-derived golden, CLAP is the real
``transformers`` class), then prove

- ``import_atht_checkpoint`` ingests a reference-style ``.pt`` of it with
  ``strict=True`` (every torch tensor lands on a pytree leaf),
- ``export_atht_checkpoint`` writes back a state dict with the IDENTICAL key
  set and bit-identical tensors (``load_state_dict(strict=True)`` passes),
- import∘export∘import is a bit-exact fixed point.

Covers all three checkpoint families at full width (htdemucs / clap / head),
reference save format per `src/train.py:205-236`.
"""

import numpy as np
import pytest
import torch
from torch import nn

import jax

from audio_to_sheet_music_tpu.convert.torch_import import (
    export_atht_checkpoint, import_atht_checkpoint)
from audio_to_sheet_music_tpu.models import atht, htdemucs as H

from test_htdemucs_golden import GHTDemucs
from torch_golden import load_reference_atht


def _build_composite() -> nn.Module:
    """The reference's AudioTextHTDemucs module tree at full width."""
    from transformers import ClapTextConfig, ClapTextModelWithProjection

    ref = load_reference_atht()
    torch.manual_seed(0)

    class Composite(nn.Module):
        def __init__(self):
            super().__init__()
            self.htdemucs = GHTDemucs(list(H.CHANNELS),
                                      bottom=H.BOTTOM_CHANNELS,
                                      t_layers=H.T_LAYERS)
            self.clap = ClapTextModelWithProjection(ClapTextConfig())
            self.text_attn = ref.TextCrossAttention(
                atht.MODEL_DIM, atht.TEXT_DIM, atht.NUM_HEADS)
            self.freq_decoder = ref.FreqDecoder(list(atht.DECODER_CHANNELS))
            self.time_decoder = ref.TimeDecoder(list(atht.DECODER_CHANNELS))
            self.freq_out = nn.Conv2d(4, 2, 1)
            self.time_out = nn.Conv1d(4, 2, 1)

    return Composite().eval()


@pytest.fixture(scope="module")
def composite():
    return _build_composite()


@pytest.fixture(scope="module")
def ref_ckpt(composite, tmp_path_factory):
    """Reference-style training checkpoint of the composite
    (`src/train.py:205-236` container)."""
    path = tmp_path_factory.mktemp("ckpt") / "best_model.pt"
    torch.save({"epoch": 3, "model_state_dict": composite.state_dict(),
                "metrics": {"val_sdr": 1.0}}, path)
    return path


class TestFullWidthRoundTrip:
    def test_import_is_strict_and_complete(self, ref_ckpt):
        params = import_atht_checkpoint(str(ref_ckpt), strict=True)
        assert set(params) == {"htdemucs", "clap", "head"}
        n_leaves = len(jax.tree.leaves(params))
        sd = torch.load(ref_ckpt, map_location="cpu",
                        weights_only=False)["model_state_dict"]
        # HF buffers (position/token-type ids) are deterministic constants,
        # not params — they have no pytree leaf.
        n_buffers = sum(k.endswith(("position_ids", "token_type_ids"))
                        for k in sd)
        assert n_leaves == len(sd) - n_buffers, (n_leaves, len(sd), n_buffers)

    def test_export_matches_reference_state_dict_bitwise(self, composite,
                                                         ref_ckpt, tmp_path):
        params = import_atht_checkpoint(str(ref_ckpt), strict=True)
        out = tmp_path / "exported.pt"
        export_atht_checkpoint(params, str(out), epoch=3,
                               metrics={"val_sdr": 1.0})
        exported = torch.load(out, map_location="cpu",
                              weights_only=False)["model_state_dict"]
        sd0 = composite.state_dict()
        assert set(exported) == set(sd0), (
            sorted(set(sd0) - set(exported))[:5],
            sorted(set(exported) - set(sd0))[:5])
        for k in sd0:
            a, b = sd0[k].numpy(), exported[k].numpy()
            assert a.shape == b.shape, k
            assert np.array_equal(a, b), f"{k} not bit-identical"

    def test_torch_loads_export_strict(self, ref_ckpt, tmp_path):
        """`load_state_dict(strict=True)` on a fresh reference-shaped module:
        the acceptance the reference's own tooling applies
        (`src/train.py:251-264` uses strict=False only for variant drift —
        our export must not need that tolerance)."""
        params = import_atht_checkpoint(str(ref_ckpt), strict=True)
        out = tmp_path / "exported.pt"
        export_atht_checkpoint(params, str(out))
        exported = torch.load(out, map_location="cpu",
                              weights_only=False)["model_state_dict"]
        fresh = _build_composite()
        missing, unexpected = fresh.load_state_dict(exported, strict=True)
        assert not missing and not unexpected

    def test_reimport_is_fixed_point(self, ref_ckpt, tmp_path):
        params = import_atht_checkpoint(str(ref_ckpt), strict=True)
        out = tmp_path / "exported.pt"
        export_atht_checkpoint(params, str(out))
        params2 = import_atht_checkpoint(str(out), strict=True)
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_flatten_with_path(params)[0],
                jax.tree_util.tree_flatten_with_path(params2)[0]):
            assert p1 == p2
            assert np.array_equal(np.asarray(a), np.asarray(b)), p1
