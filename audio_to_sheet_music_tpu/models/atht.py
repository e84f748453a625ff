"""AudioTextHTDemucs — text-conditioned single-stem separation (flagship).

Pure-function JAX composition matching the reference model
(`src/models/stem_separation/ATHTDemucs_v2.py:142-326`):

- frozen HTDemucs dual encoders + cross-domain transformer (``models.htdemucs``)
- frozen CLAP text tower (``models.clap_text``)
- trainable ``TextCrossAttention`` + ``FreqDecoder`` + ``TimeDecoder`` +
  1x1 output convs
- sigmoid spectrogram masking with mixture phase + iSTFT, plus a time-domain
  residual branch.

Faithfully reproduced reference quirks (the published checkpoint was trained
with them, so capability parity requires them):

- The decoders compare their *frequency* (resp. time) size against the
  recorded encoder **time-axis** lengths (`ATHTDemucs_v2.py:91-94`), so the
  freq decoder upsamples to a (T_spec, T_spec) grid rather than the 2048-bin
  ladder.  Skips are channel-truncated and bilinearly resized (:99-102).
- The masking path uses CaC channels ``[:2]`` — the real/imag planes of the
  *left* channel — as "stereo magnitude" (`ATHTDemucs_v2.py:303-309`), making
  ``masked_z ~= z * mask``.
- Cross-attention keys/values are a single text token, so softmax over one
  key is identically 1 and the attention output reduces to
  ``out_proj(v_proj_mha(v))`` broadcast over queries.  We compute that
  directly (exact, and skips two dead (L,384,384) matmuls per branch that
  torch's MHA performs).

Params layout: ``{"htdemucs": ..., "clap": ..., "head": {...}}``; only
``head`` trains (reference freezes the towers, `ATHTDemucs_v2.py:170-176`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..ops import dsp
from . import clap_text, htdemucs

Params = Dict[str, Any]

MODEL_DIM = 384
TEXT_DIM = 512
NUM_HEADS = 8
DECODER_CHANNELS = [384, 192, 96, 48, 4]
SKIP_SCALE = 0.1


# ---------------------------------------------------------------------------
# TextCrossAttention (reference ATHTDemucs_v2.py:21-58)
# ---------------------------------------------------------------------------

def text_cross_attention_init(key, feat_dim: int = MODEL_DIM,
                              text_dim: int = TEXT_DIM) -> Params:
    k = jax.random.split(key, 6)
    from ..nn.attention import mha_init
    return {
        "q_proj": nn.linear_init(k[0], feat_dim, feat_dim),
        "k_proj": nn.linear_init(k[1], text_dim, feat_dim),
        "v_proj": nn.linear_init(k[2], text_dim, feat_dim),
        "attn": mha_init(k[3], feat_dim),
        "out_mlp": {
            "0": nn.linear_init(k[4], feat_dim, feat_dim),
            "2": nn.linear_init(k[5], feat_dim, feat_dim),
        },
        "norm_q": nn.norm_affine_init(feat_dim),
        "norm_out": nn.norm_affine_init(feat_dim),
    }


def _attend_single_token(p: Params, queries: jnp.ndarray,
                         text_emb: jnp.ndarray) -> jnp.ndarray:
    """forward_attend with a 1-token memory.

    queries: (B, L, C); text_emb: (B, text_dim).  With one key, attention
    weights are exactly 1, so the MHA output is ``out_proj(V)`` broadcast to
    every query position — computed directly (see module docstring).
    """
    e = queries.shape[-1]
    dt = queries.dtype
    v = nn.linear(p["v_proj"], text_emb.astype(dt))                    # (B, C)
    w = p["attn"]["in_proj_weight"].astype(dt)
    b = p["attn"]["in_proj_bias"].astype(dt)
    v = v @ w[2 * e:].T + b[2 * e:]                                    # MHA V proj
    op = p["attn"]["out_proj"]
    attn_out = v @ op["weight"].astype(dt).T + op["bias"].astype(dt)   # (B, C)
    out = queries + attn_out[:, None, :]
    h = nn.gelu(nn.linear(p["out_mlp"]["0"], out))
    out = out + nn.linear(p["out_mlp"]["2"], h)
    return nn.layer_norm(p["norm_out"], out)


def text_cross_attention_apply(p: Params, x: jnp.ndarray, xt: jnp.ndarray,
                               text_emb: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, C, F, T) freq feats, xt: (B, C, T), text_emb: (B, text_dim)."""
    b, c, f, t = x.shape
    x_seq = x.reshape(b, c, f * t).transpose(0, 2, 1)      # b (f t) c
    xt_seq = xt.transpose(0, 2, 1)                          # b t c
    x_seq = _attend_single_token(p, x_seq, text_emb)
    xt_seq = _attend_single_token(p, xt_seq, text_emb)
    x = x_seq.transpose(0, 2, 1).reshape(b, c, f, t)
    xt = xt_seq.transpose(0, 2, 1)
    return x, xt


# ---------------------------------------------------------------------------
# Trainable decoders (reference ATHTDemucs_v2.py:61-139)
# ---------------------------------------------------------------------------

def _decoder_init(key, freq: bool, chans=tuple(DECODER_CHANNELS)) -> Params:
    layers = []
    for i in range(len(chans) - 1):
        key, k = jax.random.split(key)
        last = i == len(chans) - 2
        if freq:
            conv = nn.conv_transpose2d_init(k, chans[i], chans[i + 1], (8, 1))
        else:
            conv = nn.conv_transpose1d_init(k, chans[i], chans[i + 1], 8)
        layer = {"conv": conv}
        if not last:
            layer["norm"] = nn.norm_affine_init(chans[i + 1])
        layers.append(layer)
    return {"layers": layers}


def _freq_layer_down4(layer: Params, x: jnp.ndarray) -> jnp.ndarray:
    """One freq-decoder layer when ``F_in == target_f``: ConvT2d(8,1)/s(4,1)
    /p(2,0) -> [GroupNorm(1)+GELU] -> bilinear F resize 4*F_in -> F_in,
    fused via the sub-pixel phase decomposition.

    The reference decoder resizes the frequency axis back to T_spec after
    EVERY layer (`ATHTDemucs_v2.py:91-94` with targets from `:198`, which
    records ``x.shape[-1]`` — the frame count), so the 4x convT upsample is
    immediately undone by an exact /4 decimation.  align_corners=False
    decimation by 4 keeps ``0.5*(y[4i+1] + y[4i+2])`` only — in phase
    terms (j = 4a + r - 2): phase 3 at a=i and phase 0 at a=i+1.  So:

    - run the phase-bank conv WITHOUT the (s, A) interleave transpose
      (the interleave relayout copy was ~30% of decoder device time);
    - GroupNorm stats over the valid convT positions via an edge mask
      (phases (0,1) at a=0 and (2,3) at a=S fall outside the crop);
    - normalise + GELU only the two surviving phases (half the tensor),
      never materialising the 4*F_in-tall intermediate.

    Identical algebra to the unfused ops — `tests/test_freqdec_fused.py`
    pins equality against the generic path.
    """
    conv = layer["conv"]
    w = conv["weight"].astype(x.dtype)                # (I, O, 8, 1)
    i_ch, o_ch = w.shape[0], w.shape[1]
    bank = nn._subpixel_kernel_1d(w[..., 0], 4)       # (O*4, I, 2), ch=(o, r)
    # phase-MAJOR channel order (ch = r*O + o): phases become CONTIGUOUS
    # channel slices below — a (o, r)-ordered 5-D split materialised a
    # full-tensor relayout copy (~12 ms at serving shapes)
    bank = (bank.reshape(o_ch, 4, i_ch, 2).transpose(1, 0, 2, 3)
            .reshape(o_ch * 4, i_ch, 2)[..., None])
    z = jax.lax.conv_general_dilated(
        x, bank, (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))   # (B, 4*O, S+1, T)
    if "bias" in conv:
        z = z + jnp.tile(conv["bias"].astype(z.dtype), 4)[None, :, None, None]
    b, _, a_len, t = z.shape
    s = a_len - 1
    p3 = z[:, 3 * o_ch :, :s, :]                      # y[4i+1], i in [0, S)
    p0 = z[:, :o_ch, 1:, :]                           # y[4i+2]
    if "norm" in layer:
        nrm = layer["norm"]
        zf = z.astype(jnp.float32)
        ch = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * o_ch, 1, 1), 1)
        a_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, a_len, 1), 2)
        invalid = (((ch < 2 * o_ch) & (a_idx == 0))
                   | ((ch >= 2 * o_ch) & (a_idx == s)))
        mask = 1.0 - invalid.astype(jnp.float32)
        count = o_ch * 4 * s * t                      # == numel of convT out
        # one-pass stats (sum + sum-of-squares, a single multi-output
        # reduce in the conv output's native layout) — the two-pass
        # mean-then-var form forced a full-tensor relayout copy between
        # the conv and the second reduction (~12 ms at serving shapes)
        zm = zf * mask
        s1 = zm.sum(axis=(1, 2, 3)).reshape(b, 1, 1, 1)
        s2 = (zf * zm).sum(axis=(1, 2, 3)).reshape(b, 1, 1, 1)
        mean = s1 / count
        # E[x^2] - mean^2 can cancel slightly NEGATIVE in f32 when the
        # activations are near-constant (|mean| >> std) — the two-pass
        # squared-deviation form can't.  Clamp before rsqrt or this NaNs.
        var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        gam = nrm["weight"].reshape(1, o_ch, 1, 1)
        bet = nrm["bias"].reshape(1, o_ch, 1, 1)

        def norm_gelu(ph):
            pf = (ph.astype(jnp.float32) - mean) * inv * gam + bet
            return nn.gelu(pf.astype(x.dtype))

        p3, p0 = norm_gelu(p3), norm_gelu(p0)
    return (0.5 * (p3.astype(jnp.float32) + p0.astype(jnp.float32))
            ).astype(x.dtype)


def _skip_add(x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
    """``x + skip * SKIP_SCALE`` where ``skip``'s batch may be a divisor of
    ``x``'s (the multi-stem head keeps stem-independent encoder state
    UNTILED — resizes run once, the broadcast fuses into this add)."""
    b, b0 = x.shape[0], skip.shape[0]
    contrib = skip.astype(x.dtype) * SKIP_SCALE
    if b == b0:
        return x + contrib
    xr = x.reshape(b // b0, b0, *x.shape[1:])
    return (xr + contrib[None]).reshape(b, *x.shape[1:])


def freq_decoder_apply(p: Params, x: jnp.ndarray, skips: List[jnp.ndarray],
                       target_lengths: List[int]) -> jnp.ndarray:
    """4x [ConvT2d k=(8,1) s=(4,1) p=(2,0) -> GroupNorm(1) -> GELU] with
    freq-axis resize to ``target_lengths[i]`` and 0.1-scaled skips."""
    for i, layer in enumerate(p["layers"]):
        if i < len(target_lengths) and x.shape[2] == target_lengths[i]:
            # F_in == target: convT + norm + exact /4 decimation collapse
            # into the phase-fused layer (identical algebra, no 4*F
            # intermediate) — the common case for every layer after the
            # first (the reference re-targets F to T_spec each layer).
            x = _freq_layer_down4(layer, x)
        else:
            x = nn.conv_transpose2d(layer["conv"], x, stride=(4, 1),
                                    padding=(2, 0))
            if "norm" in layer:
                x = nn.gelu(nn.group_norm(layer["norm"], x, 1))
            if i < len(target_lengths) and x.shape[2] != target_lengths[i]:
                x = nn.interpolate_bilinear(x, (target_lengths[i], x.shape[3]))
        if i < len(skips):
            skip = skips[i][:, : x.shape[1]]
            skip = nn.interpolate_bilinear(skip, x.shape[2:])
            x = _skip_add(x, skip)
    return x


def time_decoder_apply(p: Params, x: jnp.ndarray, skips: List[jnp.ndarray],
                       target_lengths: List[int]) -> jnp.ndarray:
    for i, layer in enumerate(p["layers"]):
        x = nn.conv_transpose1d(layer["conv"], x, stride=4, padding=2)
        if "norm" in layer:
            x = nn.gelu(nn.group_norm(layer["norm"], x, 1))
        if i < len(target_lengths) and x.shape[2] != target_lengths[i]:
            x = nn.interpolate_linear(x, target_lengths[i])
        if i < len(skips):
            skip = skips[i][:, : x.shape[1]]
            skip = nn.interpolate_linear(skip, x.shape[2])
            x = _skip_add(x, skip)
    return x


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def head_init(key, decoder_channels=tuple(DECODER_CHANNELS),
              text_dim: int = TEXT_DIM) -> Params:
    """Trainable head: cross-attention + decoders + output convs (~3 M)."""
    k = jax.random.split(key, 5)
    chans = tuple(decoder_channels)
    return {
        "text_attn": text_cross_attention_init(k[0], chans[0], text_dim),
        "freq_decoder": _decoder_init(k[1], freq=True, chans=chans),
        "time_decoder": _decoder_init(k[2], freq=False, chans=chans),
        "freq_out": nn.conv2d_init(k[3], chans[-1], 2, (1, 1)),
        "time_out": nn.conv1d_init(k[4], chans[-1], 2, 1),
    }


def init(key) -> Params:
    """Full model params (frozen towers random-init; see convert/)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "htdemucs": htdemucs.htdemucs_init(k1),
        "clap": clap_text.clap_text_init(k2),
        "head": head_init(k3),
    }


def init_from_env(key) -> Params:
    """``init()`` unless ``ATSM_TINY_MODEL=1`` (CI-grade CLI runs)."""
    import os

    if os.environ.get("ATSM_TINY_MODEL") == "1":
        return init_tiny(key)
    return init(key)


def load_params(checkpoint: str | None, key=None) -> Tuple[Params, bool]:
    """Shared CLI loader: ``(params, pretrained)``.

    ``.pt`` paths import a reference torch checkpoint (converted weights ->
    ``pretrained=True``, which makes ``Separator`` refuse the hash-tokenizer
    fallback); ``.npz`` paths load framework-native checkpoints over the
    env-selected template; a *directory* is an Orbax train-state save (as
    written by ``train.checkpoint.save_checkpoint`` / ``config.yaml``'s
    ``resume_from``) — its head is grafted onto the template; no
    checkpoint -> random init.
    """
    import os

    if key is None:
        key = jax.random.PRNGKey(0)
    if checkpoint and str(checkpoint).endswith(".pt"):
        from ..convert.torch_import import import_atht_checkpoint

        return import_atht_checkpoint(checkpoint, strict=False), True
    params = init_from_env(key)
    if checkpoint:
        if os.path.isdir(str(checkpoint)):
            from ..train.checkpoint import load_head_params

            params = load_head_params(checkpoint, params)
        else:
            from ..train.checkpoint import load_params_npz

            params = load_params_npz(checkpoint, params)
    else:
        params = _graft_default_head(params)
    return params, False


def _default_head_path() -> "os.PathLike | None":
    """The committed demo head (``artifacts/trained_head.npz``): ~3 M head
    params trained on the synthetic fixture stems over the deterministic
    PRNGKey(0) towers (``scripts/learning_proof.py``).  Demos/serving get a
    model that actually separates instead of random init; disable with
    ``ATSM_NO_DEFAULT_HEAD=1``.  Tiny-model runs skip it (widths differ)."""
    import os
    import pathlib

    if os.environ.get("ATSM_NO_DEFAULT_HEAD") == "1":
        return None
    if os.environ.get("ATSM_TINY_MODEL") == "1":
        return None
    p = pathlib.Path(__file__).resolve().parents[2] / "artifacts" / "trained_head.npz"
    return p if p.exists() else None


def _graft_default_head(params: Params) -> Params:
    path = _default_head_path()
    if path is None:
        return params
    from ..train.checkpoint import load_params_npz

    head = load_params_npz(path, params["head"])
    for a, b in zip(jax.tree.leaves(head), jax.tree.leaves(params["head"])):
        assert a.shape == b.shape, (a.shape, b.shape)
    return {**params, "head": head}


def init_tiny(key) -> Params:
    """A tiny family member with the full architecture and contracts.

    Same depth/wiring as the flagship (4-layer 2048->8 bin ladder, cross
    transformer, RoBERTa text tower, text-conditioned head) at ~1/100 the
    width — used for fast integration tests and CI-class environments.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "htdemucs": htdemucs.htdemucs_init(
            k1, channels=(8, 16, 24, 32), bottom_channels=64, t_layers=2),
        "clap": clap_text.clap_text_init(k2, num_layers=2, hidden=128,
                                         vocab_size=50265),
        "head": head_init(k3, decoder_channels=(32, 16, 8, 8, 4)),
    }


def encode_text(params: Params, input_ids: jnp.ndarray,
                attention_mask: jnp.ndarray, normalize: bool = False
                ) -> jnp.ndarray:
    """Frozen CLAP text embeddings (B, 512).

    ``normalize=False`` matches the training path
    (``ClapTextModelWithProjection``, reference `src/train.py:404`);
    ``normalize=True`` matches ``ClapModel.get_text_features`` (app path).
    """
    fn = clap_text.get_text_features if normalize else clap_text.text_embeds
    return jax.lax.stop_gradient(fn(params["clap"], input_ids, attention_mask))


def encode_mixture(params: Params, wav: jnp.ndarray,
                   compute_dtype=jnp.float32) -> Dict[str, Any]:
    """Text-independent half of the forward: DSP front-end + frozen encoder.

    The encoder replay costs ~95% of the forward FLOPs and does not depend
    on the prompt, so multi-stem separation encodes ONCE and reuses this
    state for every stem (the reference re-runs the whole model per stem,
    `benchmark.py:139-153`).
    """
    wav32 = wav.astype(jnp.float32)
    z, mag, x, xt, mean, std, meant, stdt = htdemucs.normalize_inputs(wav32)
    x_enc, xt_enc, saved, saved_t, lengths, lengths_t = htdemucs.encode(
        params["htdemucs"], x.astype(compute_dtype), xt.astype(compute_dtype))
    x_enc, xt_enc, saved, saved_t = jax.lax.stop_gradient(
        (x_enc, xt_enc, saved, saved_t))
    return {
        "z": z, "mag": mag, "x_enc": x_enc, "xt_enc": xt_enc,
        "saved": saved, "saved_t": saved_t,
        # lengths are Python ints (static at trace time)
        "lengths": lengths, "lengths_t": lengths_t,
        "meant": meant, "stdt": stdt,
        "original_length": wav.shape[-1],
    }


ENC_STATIC_KEYS = ("lengths", "lengths_t", "original_length")


def static_plan(t: int) -> Dict[str, Any]:
    """The static (Python-int) parts of ``encode_mixture``'s result for an
    input of ``t`` samples — lets the encode/head split cross a jit boundary
    (arrays through jit, this plan re-attached from the closure)."""
    import math

    t_spec = int(math.ceil(t / htdemucs.HOP))
    lengths = [t_spec] * len(htdemucs.CHANNELS)
    lengths_t = []
    cur = t
    for _ in htdemucs.CHANNELS:
        lengths_t.append(cur)
        cur = -(-cur // htdemucs.STRIDE)     # pad-to-multiple then stride 4
    return {"lengths": lengths, "lengths_t": lengths_t, "original_length": t}


def encode_mixture_jit(params, wav, compute_dtype=jnp.float32):
    """``encode_mixture`` with the jit boundary handled: array outputs go
    through ``jax.jit`` (the static Python-int plan keys cannot — they would
    turn the decoders' static shape checks into traced booleans), and the
    plan for this length is rebuilt host-side from ``static_plan``.

    Returns ``(arrays, plan)``; ``{**arrays, **plan}`` is a full
    ``encode_mixture`` result.  The canonical encode/head split for tooling
    (profilers, tracers) — hoisted here so the split semantics cannot drift
    between scripts (advisor finding, round 4)."""
    arrays = jax.jit(
        lambda p, w: {k: v for k, v in
                      encode_mixture(p, w, compute_dtype).items()
                      if k not in ENC_STATIC_KEYS})(params, wav)
    return dict(jax.block_until_ready(arrays)), static_plan(wav.shape[-1])


def _expand(v: jnp.ndarray, b: int) -> jnp.ndarray:
    """Broadcast a batch-``b0`` tensor to batch ``b = k*b0`` (stem-tiling
    without materialisation — XLA fuses the broadcast into consumers)."""
    b0 = v.shape[0]
    if b0 == b:
        return v
    k = b // b0
    return jnp.broadcast_to(v[None], (k, *v.shape)).reshape(b, *v.shape[1:])


def apply_head(params: Params, enc: Dict[str, Any],
               text_emb: jnp.ndarray) -> jnp.ndarray:
    """Text-conditioned head: cross-attention + decoders + masking + iSTFT."""
    head = params["head"]
    original_length = enc["original_length"]
    fq, t_spec = enc["mag"].shape[-2:]

    x_cond, xt_cond = text_cross_attention_apply(
        head["text_attn"], enc["x_enc"], enc["xt_enc"], text_emb)

    x_dec = freq_decoder_apply(head["freq_decoder"], x_cond,
                               enc["saved"][::-1], enc["lengths"][::-1])
    x_dec = nn.conv2d(head["freq_out"], x_dec)
    x_dec = nn.interpolate_bilinear(x_dec, (fq, t_spec)).astype(jnp.float32)

    mask = jax.nn.sigmoid(x_dec)                       # (B, 2, F, T)
    b = mask.shape[0]
    # stem-independent encoder state may arrive UNTILED (batch b0 with
    # b = S*b0, see apply_head_multi) — broadcast it into the fusions here
    mag_stereo = _expand(enc["mag"][:, :2], b)         # CaC re/im planes (:303)
    masked = mag_stereo * mask
    z_stereo = _expand(enc["z"][:, :2], b)
    # Deliberate parity quirk: the "magnitude" here is the SIGNED CaC
    # real/imag planes, so a coefficient near -1e-8 makes this denominator
    # ~0 (reference `ATHTDemucs_v2.py:307-309` divides identically; the
    # checkpoint was trained through it, so we keep the exact algebra).
    phase = z_stereo / (mag_stereo + 1e-8)
    masked_z = masked * phase
    freq_wav = dsp.ispec(masked_z, original_length, htdemucs.NFFT, htdemucs.HOP)

    xt_dec = time_decoder_apply(head["time_decoder"], xt_cond,
                                enc["saved_t"][::-1], enc["lengths_t"][::-1])
    xt_dec = nn.conv1d(head["time_out"], xt_dec)
    if xt_dec.shape[-1] != original_length:
        xt_dec = nn.interpolate_linear(xt_dec, original_length)
    xt_dec = (xt_dec.astype(jnp.float32) * _expand(enc["stdt"], b)
              + _expand(enc["meant"], b))

    return freq_wav + xt_dec


def apply_head_multi(params: Params, enc: Dict[str, Any],
                     stem_embs: jnp.ndarray,
                     max_batch: int = 64) -> jnp.ndarray:
    """Run the head for S stems as ONE batched pass -> (S, B, 2, T).

    Tiles the encoder state S times along batch and gives each copy its
    stem's text embedding.  One (S*B)-batch pass through the decoders uses
    the MXU far better than S unrolled B-batch passes (their small-channel
    convs are utilisation-bound): measured 606 -> 508 ms for the 4-stem
    16-chunk sweep on v5e.  The multi-stem analogue of the reference's
    per-stem full-model loop (`benchmark.py:139-153`).

    Tiling multiplies peak head-activation HBM by ~S, so beyond
    ``max_batch`` combined rows (a many-minute song's bucketed chunk grid)
    this falls back to S sequential passes, which XLA schedules with buffer
    reuse.
    """
    s = stem_embs.shape[0]
    b = enc["mag"].shape[0]
    if s * b > max_batch:
        outs = [apply_head(params, enc,
                           jnp.broadcast_to(stem_embs[i][None],
                                            (b, stem_embs.shape[-1])))
                for i in range(s)]
        return jnp.stack(outs)

    def tile(v):
        return jnp.concatenate([v] * s, axis=0)

    # Only the attention inputs need real tiling (their outputs are
    # text-conditioned per stem).  Everything else — skips, spectrogram,
    # normalisation stats — is stem-INDEPENDENT and stays at batch B:
    # apply_head broadcasts it lazily (skip resizes run once, not S
    # times, and no S*B-sized copies of the encoder state hit HBM).
    tiled = {k: v for k, v in enc.items()}
    tiled["x_enc"] = tile(enc["x_enc"])
    tiled["xt_enc"] = tile(enc["xt_enc"])
    e = jnp.repeat(stem_embs, b, axis=0)            # (S*B, 512)
    out = apply_head(params, tiled, e)              # (S*B, 2, T)
    return out.reshape(s, b, 2, out.shape[-1])


def forward_with_text_emb(params: Params, wav: jnp.ndarray,
                          text_emb: jnp.ndarray,
                          compute_dtype=jnp.float32) -> jnp.ndarray:
    """(B, 2, T) mixture + (B, 512) text embedding -> (B, 2, T) stem.

    The serving path caches prompt embeddings and calls this directly; the
    training path wraps it with ``encode_text``.  Mirrors the reference
    forward contract (`ATHTDemucs_v2.py:250-326`).
    """
    enc = encode_mixture(params, wav, compute_dtype)
    return apply_head(params, enc, text_emb).astype(wav.dtype)


def forward(params: Params, wav: jnp.ndarray, input_ids: jnp.ndarray,
            attention_mask: jnp.ndarray, compute_dtype=jnp.float32,
            normalize_text: bool = False) -> jnp.ndarray:
    """Full forward: mixture + tokenised prompts -> separated stem."""
    text_emb = encode_text(params, input_ids, attention_mask, normalize_text)
    return forward_with_text_emb(params, wav, text_emb, compute_dtype)
