"""Model-tower tests: CLAP parity vs transformers, HTDemucs pinned shapes,
AudioTextHTDemucs forward invariants (mirrors the reference's smoke tests in
`main.py:186-315` upgraded to pytest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.convert import torch_import
from audio_to_sheet_music_tpu.models import atht, clap_text, htdemucs


@pytest.fixture(scope="module")
def small_wav():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.standard_normal((2, 2, 11025)), jnp.float32)


# ---------------------------------------------------------------------------
# CLAP text tower: golden parity vs transformers (random weights)
# ---------------------------------------------------------------------------

class TestClapParity:
    @pytest.fixture(scope="class")
    def towers(self):
        import torch
        from transformers import ClapTextConfig, ClapTextModelWithProjection

        torch.manual_seed(0)
        hf = ClapTextModelWithProjection(ClapTextConfig()).eval()
        state = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = torch_import.import_clap_state(state, strict=False)
        return hf, params

    def test_text_embeds_parity(self, towers):
        import torch

        hf, params = towers
        ids = np.array([[0, 5234, 1000, 2, 1, 1], [0, 999, 2, 1, 1, 1]])
        mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0]])
        with torch.no_grad():
            ref = hf(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)).text_embeds.numpy()
        ours = np.asarray(clap_text.text_embeds(
            params, jnp.asarray(ids), jnp.asarray(mask)))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_get_text_features_normalised(self, towers):
        _, params = towers
        ids = jnp.array([[0, 42, 2]])
        mask = jnp.ones_like(ids)
        feats = clap_text.get_text_features(params, ids, mask)
        np.testing.assert_allclose(
            float(jnp.linalg.norm(feats)), 1.0, atol=1e-5)

    def test_padding_invariance(self, towers):
        """Extra padded positions must not change the embedding."""
        _, params = towers
        ids_a = jnp.array([[0, 77, 2]])
        ids_b = jnp.array([[0, 77, 2, 1, 1]])
        mask_a = jnp.array([[1, 1, 1]])
        mask_b = jnp.array([[1, 1, 1, 0, 0]])
        ea = clap_text.text_embeds(params, ids_a, mask_a)
        eb = clap_text.text_embeds(params, ids_b, mask_b)
        np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), atol=1e-4)


# ---------------------------------------------------------------------------
# HTDemucs tower
# ---------------------------------------------------------------------------

class TestHTDemucs:
    @pytest.fixture(scope="class")
    def params(self):
        return htdemucs.htdemucs_init(jax.random.PRNGKey(0))

    def test_param_count_matches_dump(self, params):
        """41.98 M params (reference HTDemucs_Fwd_Pass.txt:147-149)."""
        n = sum(int(x.size) for x in jax.tree.leaves(params))
        assert n == 41_984_456

    def test_encode_pinned_shapes(self, params):
        """Shape trace at the 7.8 s train segment (HTDemucs_Fwd_Pass.txt:6-89):
        freq 2048->512->128->32->8 bins, time 343980->85995->21499->5375->1344.
        Abstract trace only (eval_shape) — no FLOPs on CPU."""
        t = 343980
        lengths_box = {}

        def trace(wav):
            z, mag, x, xt, *_ = htdemucs.normalize_inputs(wav)
            x, xt, saved, saved_t, lengths, lengths_t = htdemucs.encode(
                params, x, xt)
            lengths_box["lengths"] = lengths
            lengths_box["lengths_t"] = lengths_t
            return mag, x, xt, saved, saved_t

        mag, x, xt, saved, saved_t = jax.eval_shape(
            trace, jax.ShapeDtypeStruct((1, 2, t), jnp.float32))
        assert mag.shape == (1, 4, 2048, 336)
        assert [s.shape[-2] for s in saved] == [512, 128, 32, 8]
        assert [s.shape[-1] for s in saved_t] == [85995, 21499, 5375, 1344]
        assert x.shape == (1, 384, 8, 336)
        assert xt.shape == (1, 384, 1344)
        assert lengths_box["lengths"] == [336] * 4
        assert lengths_box["lengths_t"] == [343980, 85995, 21499, 5375]

    def test_forward_baseline(self, small_wav):
        tiny = htdemucs.htdemucs_init(jax.random.PRNGKey(1),
                                      channels=(8, 16, 24, 32),
                                      bottom_channels=64, t_layers=2)
        out = jax.jit(htdemucs.forward)(tiny, small_wav[:1])
        assert out.shape == (1, 4, 2, 11025)
        assert bool(jnp.all(jnp.isfinite(out)))


# ---------------------------------------------------------------------------
# AudioTextHTDemucs composition
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def atht_params():
    """Tiny family member: same architecture/wiring at ~1/100 width —
    behavioural invariants are width-independent and this host has 1 core."""
    return atht.init_tiny(jax.random.PRNGKey(0))


class TestATHT:
    def test_head_param_count(self):
        """Trainable head only (~3 M); towers frozen (ATHTDemucs_v2.py:170-188)."""
        head = atht.head_init(jax.random.PRNGKey(0))
        n = sum(int(x.size) for x in jax.tree.leaves(head))
        assert 2_500_000 < n < 5_500_000

    def test_forward_shapes_variable_length(self, atht_params):
        """Reference tests 2/3/5 s inputs (main.py:277-290); output == input T."""
        ids = jnp.array([[0, 10, 2]])
        mask = jnp.ones_like(ids)
        fwd = jax.jit(atht.forward)
        for seconds in (0.25, 0.5):
            t = int(44100 * seconds)
            wav = jnp.ones((1, 2, t), jnp.float32) * 0.1
            out = fwd(atht_params, wav, ids, mask)
            assert out.shape == (1, 2, t)
            assert bool(jnp.all(jnp.isfinite(out)))

    def test_heterogeneous_prompts(self, atht_params, small_wav):
        """Different prompts in one batch give different outputs
        (reference main.py:292-303)."""
        ids = jnp.array([[0, 10, 2], [0, 999, 2]])
        mask = jnp.ones_like(ids)
        fwd = jax.jit(atht.forward)
        out = fwd(atht_params, small_wav, ids, mask)
        assert out.shape == small_wav.shape
        same_wav = jnp.stack([small_wav[0], small_wav[0]])
        out2 = fwd(atht_params, same_wav, ids, mask)
        assert float(jnp.abs(out2[0] - out2[1]).max()) > 1e-6

    def test_apply_head_multi_matches_per_stem(self, atht_params, small_wav):
        """The batched (S*B) multi-stem head pass == S independent head
        applications (the serving sweeps rely on this identity)."""
        enc = atht.encode_mixture(atht_params, small_wav)
        embs = jnp.asarray(
            np.random.default_rng(0).standard_normal((3, 512)), jnp.float32)
        batched = atht.apply_head_multi(atht_params, enc, embs)
        # max_batch=1 forces the sequential memory-guard fallback
        seq = atht.apply_head_multi(atht_params, enc, embs, max_batch=1)
        b = small_wav.shape[0]
        for s in range(3):
            e = jnp.broadcast_to(embs[s][None], (b, 512))
            single = atht.apply_head(atht_params, enc, e)
            np.testing.assert_allclose(np.asarray(batched[s]),
                                       np.asarray(single), atol=1e-5)
            np.testing.assert_allclose(np.asarray(seq[s]),
                                       np.asarray(single), atol=1e-6)

    def test_gradients_only_reach_head(self, atht_params, small_wav):
        """Frozen towers get zero grads (stop_gradient = torch.no_grad parity)."""
        ids = jnp.array([[0, 10, 2], [0, 999, 2]])
        mask = jnp.ones_like(ids)

        def loss_fn(params):
            out = atht.forward(params, small_wav, ids, mask)
            return jnp.mean(out ** 2)

        grads = jax.jit(jax.grad(loss_fn))(atht_params)
        head_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["head"]))
        frozen_norm = sum(float(jnp.abs(g).sum())
                          for g in jax.tree.leaves(grads["htdemucs"]))
        clap_norm = sum(float(jnp.abs(g).sum())
                        for g in jax.tree.leaves(grads["clap"]))
        assert head_norm > 0.0
        assert frozen_norm == 0.0
        assert clap_norm == 0.0

    def test_single_token_attention_matches_general_mha(self, atht_params):
        """The broadcast fast path == full MHA with a 1-token memory."""
        from audio_to_sheet_music_tpu.nn.attention import mha
        from audio_to_sheet_music_tpu.nn import core as nn

        p = atht_params["head"]["text_attn"]
        feat_dim = p["q_proj"]["weight"].shape[0]
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((2, 7, feat_dim)), jnp.float32)
        text = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)

        fast = atht._attend_single_token(p, q, text)

        qn = nn.layer_norm(p["norm_q"], q)
        k = nn.linear(p["k_proj"], text)[:, None]
        v = nn.linear(p["v_proj"], text)[:, None]
        qp = nn.linear(p["q_proj"], qn)
        attn_out = mha(p["attn"], qp, k, v, 8)
        out = q + attn_out
        out = out + nn.linear(p["out_mlp"]["2"],
                              nn.gelu(nn.linear(p["out_mlp"]["0"], out)))
        ref = nn.layer_norm(p["norm_out"], out)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Converter round-trip
# ---------------------------------------------------------------------------

class TestConverter:
    def test_htdemucs_name_translation_bijective(self):
        """Every leaf resolves to a unique torch key and round-trips."""
        params = htdemucs.htdemucs_init(jax.random.PRNGKey(1))
        fake_state = {}
        for path, leaf in torch_import._tree_paths(params):
            key = torch_import._translate(path)
            assert key not in fake_state, f"duplicate torch key {key}"
            fake_state[key] = np.asarray(leaf) + 1.0
        rebuilt = torch_import.fill_from_torch(params, fake_state)
        for (pa, a), (pb, b) in zip(torch_import._tree_paths(params),
                                    torch_import._tree_paths(rebuilt)):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(b), np.asarray(a) + 1.0)

    def test_htdemucs_keys_look_like_demucs(self):
        """Spot-check translated names against the demucs state_dict layout."""
        params = htdemucs.htdemucs_init(jax.random.PRNGKey(1))
        keys = {torch_import._translate(p) for p, _ in
                torch_import._tree_paths(params)}
        expected = [
            "encoder.0.conv.weight",
            "encoder.3.rewrite.bias",
            "encoder.1.dconv.layers.0.0.weight",
            "encoder.1.dconv.layers.1.6.scale",
            "tencoder.2.dconv.layers.0.3.bias",
            "decoder.0.conv_tr.weight",
            "tdecoder.3.rewrite.weight",
            "freq_emb.embedding.weight",
            "channel_upsampler_t.bias",
            "crosstransformer.norm_in.weight",
            "crosstransformer.layers.0.self_attn.in_proj_weight",
            "crosstransformer.layers.1.cross_attn.out_proj.bias",
            "crosstransformer.layers_t.4.gamma_2.scale",
            "crosstransformer.layers_t.3.norm3.bias",
        ]
        for k in expected:
            assert k in keys, k

    def test_atht_checkpoint_import_end_to_end(self, tmp_path):
        """Synthesize a reference-style .pt training checkpoint (torch) and
        import it — exercises container unwrap, module. strip, prefix split
        and every name translation at once."""
        import torch

        from audio_to_sheet_music_tpu.convert.torch_import import (
            export_torch_names, import_atht_checkpoint)

        src = atht.init_tiny(jax.random.PRNGKey(7))
        state = {}
        state.update(export_torch_names(src["htdemucs"], "htdemucs."))
        # reference checkpoints hold the HF clap module under "clap."
        clap_names = {
            "clap." + k.replace("embeddings.", "text_model.embeddings.")
                       .replace("layer.", "text_model.encoder.layer.")
                       .replace("pooler.", "text_model.pooler."): v
            for k, v in export_torch_names(src["clap"]).items()}
        state.update(clap_names)
        state.update({"module." + k: v       # DataParallel prefix
                      for k, v in export_torch_names(src["head"]).items()})
        ckpt = {"epoch": 3,
                "model_state_dict": {k: torch.tensor(v)
                                     for k, v in state.items()}}
        torch.save(ckpt, tmp_path / "best_model.pt")

        template = atht.init_tiny(jax.random.PRNGKey(8))
        out = import_atht_checkpoint(str(tmp_path / "best_model.pt"),
                                     template=template)
        for section in ("htdemucs", "clap", "head"):
            for a, b in zip(jax.tree.leaves(src[section]),
                            jax.tree.leaves(out[section])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_export_import_roundtrip(self, tmp_path):
        """export_atht_checkpoint -> import_atht_checkpoint is identity."""
        from audio_to_sheet_music_tpu.convert.torch_import import (
            export_atht_checkpoint, import_atht_checkpoint)

        src = atht.init_tiny(jax.random.PRNGKey(11))
        export_atht_checkpoint(src, str(tmp_path / "ckpt.pt"), epoch=5,
                               metrics={"val_sdr": 1.5})
        out = import_atht_checkpoint(
            str(tmp_path / "ckpt.pt"),
            template=atht.init_tiny(jax.random.PRNGKey(12)))
        for section in ("htdemucs", "clap", "head"):
            for a, b in zip(jax.tree.leaves(src[section]),
                            jax.tree.leaves(out[section])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
