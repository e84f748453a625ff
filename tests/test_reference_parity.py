"""Golden numerical parity of the trainable head vs the REFERENCE'S OWN code.

The reference's head modules (`ATHTDemucs_v2.py:21-139`) import cleanly with a
one-line ``demucs`` stub, so these tests run the actual reference torch
classes — ``TextCrossAttention``, ``FreqDecoder``, ``TimeDecoder`` — at full
width, push the torch weights through ``convert.torch_import.fill_from_torch``
(the same name map the checkpoint importer uses), and assert the JAX head
matches to ~1e-4.  The final test replays the reference forward composition
(`ATHTDemucs_v2.py:283-325`: cross-attn -> decoders -> sigmoid mask -> phase
multiply -> iSTFT -> + time branch) end-to-end on a 0.25 s input.

This is the SURVEY §7 Milestone A proof for the trainable head: any wiring
drift (GLU halves, resize semantics, skip truncation, MHA V-path closed form)
fails these tests.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from audio_to_sheet_music_tpu.convert.torch_import import fill_from_torch
from audio_to_sheet_music_tpu.models import atht, htdemucs
from audio_to_sheet_music_tpu.ops import dsp

from torch_golden import (load_reference_atht, state_to_numpy,
                          torch_demucs_ispec, torch_demucs_spec)

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref():
    return load_reference_atht()


@pytest.fixture(scope="module")
def head_pair(ref):
    """Reference torch head modules + the JAX head params filled from them."""
    torch.manual_seed(0)
    tca = ref.TextCrossAttention(atht.MODEL_DIM, atht.TEXT_DIM,
                                 atht.NUM_HEADS).eval()
    fd = ref.FreqDecoder(list(atht.DECODER_CHANNELS)).eval()
    td = ref.TimeDecoder(list(atht.DECODER_CHANNELS)).eval()
    freq_out = torch.nn.Conv2d(4, 2, 1).eval()
    time_out = torch.nn.Conv1d(4, 2, 1).eval()

    state = {}
    state.update(state_to_numpy(tca, "text_attn."))
    state.update(state_to_numpy(fd, "freq_decoder."))
    state.update(state_to_numpy(td, "time_decoder."))
    state.update(state_to_numpy(freq_out, "freq_out."))
    state.update(state_to_numpy(time_out, "time_out."))
    params = fill_from_torch(atht.head_init(jax.random.PRNGKey(0)), state,
                             strict=True)
    return {"tca": tca, "fd": fd, "td": td, "freq_out": freq_out,
            "time_out": time_out, "params": params}


class TestTextCrossAttention:
    def test_full_width_parity(self, head_pair, rng):
        tca = head_pair["tca"]
        p = head_pair["params"]["text_attn"]
        x = rng.standard_normal((1, atht.MODEL_DIM, 4, 6)).astype(np.float32)
        xt = rng.standard_normal((1, atht.MODEL_DIM, 9)).astype(np.float32)
        emb = rng.standard_normal((1, atht.TEXT_DIM)).astype(np.float32)

        with torch.no_grad():
            tx, txt = tca(torch.from_numpy(x), torch.from_numpy(xt),
                          torch.from_numpy(emb))
        jx, jxt = atht.text_cross_attention_apply(
            p, jnp.asarray(x), jnp.asarray(xt), jnp.asarray(emb))
        np.testing.assert_allclose(np.asarray(jx), tx.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(jxt), txt.numpy(), atol=ATOL)

    def test_single_token_closed_form_vs_reference_mha(self, head_pair, rng):
        """The dead-matmul shortcut must equal the reference's full torch MHA
        path (forward_attend, ATHTDemucs_v2.py:38-48)."""
        tca = head_pair["tca"]
        p = head_pair["params"]["text_attn"]
        q = rng.standard_normal((2, 13, atht.MODEL_DIM)).astype(np.float32)
        emb = rng.standard_normal((2, atht.TEXT_DIM)).astype(np.float32)
        with torch.no_grad():
            ref_out = tca.forward_attend(torch.from_numpy(q),
                                         torch.from_numpy(emb))
        ours = atht._attend_single_token(p, jnp.asarray(q), jnp.asarray(emb))
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=ATOL)


def _freq_fixture(rng, t=7):
    """Bottleneck + reversed skips/lengths shaped like the real tower."""
    x = rng.standard_normal((1, 384, 8, t)).astype(np.float32)
    skips = [rng.standard_normal(s).astype(np.float32)
             for s in [(1, 384, 8, t), (1, 192, 32, t),
                       (1, 96, 128, t), (1, 48, 512, t)]]
    lengths = [t, t, t, t]   # the reference records TIME lengths (quirk)
    return x, skips, lengths


def _time_fixture(rng):
    x = rng.standard_normal((1, 384, 5)).astype(np.float32)
    skips = [rng.standard_normal(s).astype(np.float32)
             for s in [(1, 384, 18), (1, 192, 70), (1, 96, 280), (1, 48, 1120)]]
    lengths = [18, 70, 280, 1120]
    return x, skips, lengths


class TestDecoders:
    def test_freq_decoder_full_width(self, head_pair, rng):
        fd = head_pair["fd"]
        p = head_pair["params"]["freq_decoder"]
        x, skips, lengths = _freq_fixture(rng)
        with torch.no_grad():
            ref_out = fd(torch.from_numpy(x),
                         [torch.from_numpy(s) for s in skips], lengths)
        ours = atht.freq_decoder_apply(p, jnp.asarray(x),
                                       [jnp.asarray(s) for s in skips], lengths)
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(),
                                   atol=2e-4)

    def test_time_decoder_full_width(self, head_pair, rng):
        td = head_pair["td"]
        p = head_pair["params"]["time_decoder"]
        x, skips, lengths = _time_fixture(rng)
        with torch.no_grad():
            ref_out = td(torch.from_numpy(x),
                         [torch.from_numpy(s) for s in skips], lengths)
        ours = atht.time_decoder_apply(p, jnp.asarray(x),
                                       [jnp.asarray(s) for s in skips], lengths)
        np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(),
                                   atol=2e-4)


class TestHeadComposition:
    """Full reference forward tail (ATHTDemucs_v2.py:283-325) on 0.25 s."""

    def test_mask_phase_istft_composition(self, head_pair, rng):
        t = 11025
        plan = atht.static_plan(t)
        t_spec = plan["lengths"][0]
        assert t_spec == 11

        wav = (0.1 * rng.standard_normal((1, 2, t))).astype(np.float32)
        z = dsp.spec(jnp.asarray(wav), htdemucs.NFFT, htdemucs.HOP)
        mag = dsp.magnitude_cac(z)

        # Synthetic frozen-encoder outputs (shapes of the real tower); both
        # sides consume the same arrays, so only the head is under test.
        x_enc = rng.standard_normal((1, 384, 8, t_spec)).astype(np.float32)
        xt_len = -(-plan["lengths_t"][-1] // htdemucs.STRIDE)   # 173 -> 44
        xt_enc = rng.standard_normal((1, 384, xt_len)).astype(np.float32)
        saved = [rng.standard_normal((1, c, f, t_spec)).astype(np.float32)
                 for c, f in zip(htdemucs.CHANNELS, (512, 128, 32, 8))]
        saved_t = [rng.standard_normal((1, c, l)).astype(np.float32)
                   for c, l in zip(htdemucs.CHANNELS, (2757, 690, 173, 44))]
        emb = rng.standard_normal((1, atht.TEXT_DIM)).astype(np.float32)
        meant = np.float32(0.013)
        stdt = np.float32(0.092)

        # --- torch side: the reference's own modules + golden spec/ispec ---
        tca, fd, td = head_pair["tca"], head_pair["fd"], head_pair["td"]
        freq_out, time_out = head_pair["freq_out"], head_pair["time_out"]
        z_t = torch_demucs_spec(torch.from_numpy(wav))
        mag_t = torch.view_as_real(z_t).permute(0, 1, 4, 2, 3).reshape(
            1, 4, *z_t.shape[-2:])
        with torch.no_grad():
            x_cond, xt_cond = tca(torch.from_numpy(x_enc),
                                  torch.from_numpy(xt_enc),
                                  torch.from_numpy(emb))
            x_dec = fd(x_cond, [torch.from_numpy(s) for s in saved[::-1]],
                       plan["lengths"][::-1])
            x_dec = freq_out(x_dec)
            x_dec = F.interpolate(x_dec, size=(htdemucs.FREQ_BINS, t_spec),
                                  mode="bilinear", align_corners=False)
            mask = torch.sigmoid(x_dec)
            mag_stereo = mag_t[:, :2]
            z_stereo = z_t[:, :2]
            phase = z_stereo / (mag_stereo + 1e-8)
            freq_wav = torch_demucs_ispec(mag_stereo * mask * phase, t)
            xt_dec = td(xt_cond, [torch.from_numpy(s) for s in saved_t[::-1]],
                        plan["lengths_t"][::-1])
            xt_dec = time_out(xt_dec)
            if xt_dec.shape[-1] != t:
                xt_dec = F.interpolate(xt_dec, size=t, mode="linear",
                                       align_corners=False)
            ref_out = (freq_wav + xt_dec * stdt + meant).numpy()

        # --- JAX side: apply_head on an equivalent enc dict ---
        enc = {
            "z": z, "mag": mag,
            "x_enc": jnp.asarray(x_enc), "xt_enc": jnp.asarray(xt_enc),
            "saved": [jnp.asarray(s) for s in saved],
            "saved_t": [jnp.asarray(s) for s in saved_t],
            "lengths": plan["lengths"], "lengths_t": plan["lengths_t"],
            "meant": jnp.full((1, 1, 1), meant),
            "stdt": jnp.full((1, 1, 1), stdt),
            "original_length": t,
        }
        ours = np.asarray(atht.apply_head(
            {"head": head_pair["params"]}, enc, jnp.asarray(emb)))

        assert ours.shape == ref_out.shape == (1, 2, t)
        np.testing.assert_allclose(ours, ref_out, atol=5e-4)
        # also assert the two sides agree much better than output scale
        scale = np.abs(ref_out).max()
        assert np.abs(ours - ref_out).max() < 5e-3 * max(scale, 1e-3)
