"""CLAP audio tower (HTSAT Swin transformer) as pure-function JAX.

Re-implements ``ClapAudioModel`` + projection from ``laion/clap-htsat-unfused``
(architecture pinned by the reference dump `AudioTextHTDemucs_Full.txt:677-823`).
The reference *loads* this tower on its app/benchmark paths but only ever calls
the text side (SURVEY §2b); it is provided for full CLAP capability (audio-
prompted retrieval / audio-text similarity).

Pipeline (mirrors HF ``ClapAudioEncoder.forward``):

1. BatchNorm2d over the 64 mel bins (eval statistics).
2. ``reshape_mel2img``: (B, 1, T<=1024, 64) log-mel -> bicubic time
   interpolation to 1024 (torch kernel a=-0.75, align_corners=True —
   implemented as an exact precomputed interpolation matrix, which is also
   the MXU-friendly form) -> fold ``freq_ratio=4`` time groups into
   frequency -> (B, 1, 256, 256) image.
3. 4x4/4 patch embed -> LayerNorm -> 4 Swin stages (depths 2,2,6,2, heads
   4/8/16/32, window 8, shifted every other block, relative position bias,
   post-norm MLP) with patch merging between stages.
4. Final LayerNorm -> HTSAT frequency re-grouping -> temporal average pool
   -> 2-layer projection 768 -> 512 -> 512 (ReLU).

``audio_embeds`` is the raw projection (``ClapAudioModelWithProjection``);
``get_audio_features`` L2-normalises (``ClapModel.get_audio_features``).
Parity-tested against transformers with random weights in
``tests/test_clap_audio.py``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import core as nn

Params = Dict[str, Any]

SPEC_SIZE = 256
PATCH_SIZE = 4
PATCH_STRIDE = 4
NUM_MEL_BINS = 64
FREQ_RATIO = SPEC_SIZE // NUM_MEL_BINS          # 4
WINDOW = 8
DEPTHS = (2, 2, 6, 2)
NUM_HEADS = (4, 8, 16, 32)
EMBED_DIM = 96
HIDDEN = 768                                    # 96 * 2**3
PROJECTION_DIM = 512
LN_EPS = 1e-5
MLP_RATIO = 4


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _layer_init(key, dim: int) -> Params:
    k = jax.random.split(key, 7)
    n_bias = (2 * WINDOW - 1) * (2 * WINDOW - 1)
    heads = {96: 4, 192: 8, 384: 16, 768: 32}[dim]
    return {
        "layernorm_before": nn.norm_affine_init(dim),
        "attention": {
            "self": {
                "query": nn.linear_init(k[0], dim, dim),
                "key": nn.linear_init(k[1], dim, dim),
                "value": nn.linear_init(k[2], dim, dim),
                "relative_position_bias_table": jnp.zeros((n_bias, heads),
                                                          jnp.float32),
            },
            "output": {"dense": nn.linear_init(k[3], dim, dim)},
        },
        "layernorm_after": nn.norm_affine_init(dim),
        "intermediate": {"dense": nn.linear_init(k[4], dim, dim * MLP_RATIO)},
        "output": {"dense": nn.linear_init(k[5], dim * MLP_RATIO, dim)},
    }


def clap_audio_init(key) -> Params:
    keys = jax.random.split(key, 16)
    ki = iter(keys)
    stages: List[Params] = []
    for i, depth in enumerate(DEPTHS):
        dim = EMBED_DIM * 2 ** i
        stage: Params = {"blocks": [_layer_init(next(ki), dim)
                                    for _ in range(depth)]}
        if i < len(DEPTHS) - 1:
            stage["downsample"] = {
                "reduction": nn.linear_init(next(ki), 4 * dim, 2 * dim,
                                            bias=False),
                "norm": nn.norm_affine_init(4 * dim),
            }
        stages.append(stage)
    kp = jax.random.split(next(ki), 3)
    return {
        "patch_embed": {
            "proj": nn.conv2d_init(kp[0], 1, EMBED_DIM,
                                   (PATCH_SIZE, PATCH_SIZE)),
            "norm": nn.norm_affine_init(EMBED_DIM),
        },
        "layers": stages,
        "batch_norm": {
            "weight": jnp.ones((NUM_MEL_BINS,), jnp.float32),
            "bias": jnp.zeros((NUM_MEL_BINS,), jnp.float32),
            "running_mean": jnp.zeros((NUM_MEL_BINS,), jnp.float32),
            "running_var": jnp.ones((NUM_MEL_BINS,), jnp.float32),
        },
        "norm": nn.norm_affine_init(HIDDEN),
        "audio_projection": {
            "linear1": nn.linear_init(kp[1], HIDDEN, PROJECTION_DIM),
            "linear2": nn.linear_init(kp[2], PROJECTION_DIM, PROJECTION_DIM),
        },
    }


# ---------------------------------------------------------------------------
# mel -> image
# ---------------------------------------------------------------------------

def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch bicubic kernel (Keys, a=-0.75)."""
    ax = np.abs(x)
    w = np.where(ax <= 1, (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
                 np.where(ax < 2, a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a,
                          0.0))
    return w


def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) torch ``bicubic, align_corners=True`` interpolation as an
    exact matmul (also the MXU-native form of the resampling)."""
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    scale = (n_in - 1) / (n_out - 1)
    pos = np.arange(n_out) * scale
    base = np.floor(pos).astype(int)
    w = np.zeros((n_out, n_in), np.float32)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, n_in - 1)
        w[np.arange(n_out), idx] += _cubic_kernel(pos - (base + tap))
    return w


def reshape_mel2img(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, T, 64) -> (B, 1, 256, 256) (HF ``reshape_mel2img``)."""
    b, c, t, f = x.shape
    spec_width = SPEC_SIZE * FREQ_RATIO           # 1024
    spec_height = SPEC_SIZE // FREQ_RATIO         # 64
    assert t <= spec_width and f <= spec_height, (t, f)
    if t < spec_width:
        m = jnp.asarray(_resize_matrix(t, spec_width))
        x = jnp.einsum("ot,bctf->bcof", m, x)
    if f < spec_height:
        m = jnp.asarray(_resize_matrix(f, spec_height))
        x = jnp.einsum("of,bctf->bcto", m, x)
    b, c, t, f = x.shape
    x = x.reshape(b, c * FREQ_RATIO, t // FREQ_RATIO, f)
    x = x.transpose(0, 1, 3, 2)
    return x.reshape(b, c, f * FREQ_RATIO, t // FREQ_RATIO)


# ---------------------------------------------------------------------------
# Swin blocks
# ---------------------------------------------------------------------------

def _rel_pos_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)                            # (W², W²)


def _window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)


def _window_reverse(x: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h // win, w // win, win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


def _shift_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """SW-MSA attention mask: (n_windows, W², W²) additive (-100 off-group)."""
    img = np.zeros((h, w), np.int32)
    count = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = count
            count += 1
    wins = img.reshape(h // win, win, w // win, win).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, win * win)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(p: Params, x: jnp.ndarray, heads: int, win: int,
                      mask: np.ndarray | None) -> jnp.ndarray:
    """x: (B*nW, W², C) window tokens."""
    bn, l, c = x.shape
    head_dim = c // heads

    def split(h):
        return h.reshape(bn, l, heads, head_dim).transpose(0, 2, 1, 3)

    q = split(nn.linear(p["self"]["query"], x))
    k = split(nn.linear(p["self"]["key"], x))
    v = split(nn.linear(p["self"]["value"], x))
    scores = jnp.einsum("bhld,bhsd->bhls", q, k) / math.sqrt(head_dim)

    idx = _rel_pos_index(win).reshape(-1)
    bias = p["self"]["relative_position_bias_table"][idx]
    bias = bias.reshape(l, l, heads).transpose(2, 0, 1)
    scores = scores + bias[None].astype(scores.dtype)

    if mask is not None:
        n_w = mask.shape[0]
        scores = scores.reshape(bn // n_w, n_w, heads, l, l)
        scores = scores + jnp.asarray(mask, scores.dtype)[None, :, None]
        scores = scores.reshape(bn, heads, l, l)

    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhls,bhsd->bhld", attn, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(bn, l, c)
    return nn.linear(p["output"]["dense"], ctx)


def _swin_layer(p: Params, x: jnp.ndarray, hw: Tuple[int, int], heads: int,
                shift: int) -> jnp.ndarray:
    """x: (B, H*W, C); Swin block with optional cyclic shift."""
    h, w = hw
    win = WINDOW
    if min(h, w) <= win:
        shift, win = 0, min(h, w)
    b, _, c = x.shape
    shortcut = x
    x = nn.layer_norm(p["layernorm_before"], x, eps=LN_EPS)
    x = x.reshape(b, h, w, c)
    pad_b = (win - h % win) % win
    pad_r = (win - w % win) % win
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_mask(hp, wp, win, shift)
    else:
        mask = None
    windows = _window_partition(x, win)
    attn = _window_attention(p["attention"], windows, heads, win, mask)
    x = _window_reverse(attn.reshape(-1, win, win, c), win, hp, wp)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        x = x[:, :h, :w]
    x = shortcut + x.reshape(b, h * w, c)

    y = nn.layer_norm(p["layernorm_after"], x, eps=LN_EPS)
    y = nn.gelu(nn.linear(p["intermediate"]["dense"], y))
    return x + nn.linear(p["output"]["dense"], y)


def _patch_merge(p: Params, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = hw
    b, _, c = x.shape
    x = x.reshape(b, h, w, c)
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    parts = [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
             x[:, 1::2, 1::2]]
    x = jnp.concatenate(parts, axis=-1).reshape(b, -1, 4 * c)
    x = nn.layer_norm(p["norm"], x, eps=LN_EPS)
    return nn.linear(p["reduction"], x)


# ---------------------------------------------------------------------------
# full encoder
# ---------------------------------------------------------------------------

def encode(p: Params, input_features: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, 1, T, 64) log-mel -> (last_hidden (B,768,2,32), pooled (B,768)).

    (last_hidden freq dim = freq_shape // n_mel_groups = 8 // 4 = 2 after
    the HTSAT re-grouping, matching transformers' ClapAudioEncoder.)"""
    bn = p["batch_norm"]
    x = input_features.transpose(0, 3, 2, 1)          # (B, 64, T, 1)
    x = (x - bn["running_mean"][None, :, None, None]) * jax.lax.rsqrt(
        bn["running_var"][None, :, None, None] + 1e-5)
    x = x * bn["weight"][None, :, None, None] + bn["bias"][None, :, None, None]
    x = x.transpose(0, 3, 2, 1)                        # back to (B,1,T,64)

    img = reshape_mel2img(x)                           # (B,1,256,256)
    frames_num = img.shape[2]

    pe = p["patch_embed"]
    h = nn.conv2d(pe["proj"], img, stride=(PATCH_STRIDE, PATCH_STRIDE),
                  padding=((PATCH_SIZE - PATCH_STRIDE) // 2,) * 2)
    b, c, gh, gw = h.shape
    h = h.reshape(b, c, gh * gw).transpose(0, 2, 1)    # (B, L, 96)
    h = nn.layer_norm(pe["norm"], h, eps=LN_EPS)

    hw = (gh, gw)
    for i, stage in enumerate(p["layers"]):
        heads = NUM_HEADS[i]
        for j, blk in enumerate(stage["blocks"]):
            shift = 0 if j % 2 == 0 else WINDOW // 2
            h = _swin_layer(blk, h, hw, heads, shift)
        if "downsample" in stage:
            h = _patch_merge(stage["downsample"], h, hw)
            hw = ((hw[0] + 1) // 2, (hw[1] + 1) // 2)

    h = nn.layer_norm(p["norm"], h, eps=LN_EPS)        # (B, 8*32? , 768)

    # HTSAT frequency re-grouping + temporal average pool
    bsz, _, nch = h.shape
    freq_shape = frames_num // (2 ** (len(DEPTHS) - 1)) // PATCH_STRIDE
    temporal_shape = img.shape[3] // (2 ** (len(DEPTHS) - 1)) // PATCH_STRIDE
    last = h.transpose(0, 2, 1).reshape(bsz, nch, freq_shape, temporal_shape)
    c_freq_bin = freq_shape // FREQ_RATIO
    last = last.reshape(bsz, nch, freq_shape // c_freq_bin, c_freq_bin,
                        temporal_shape)
    last = last.transpose(0, 1, 3, 2, 4).reshape(bsz, nch, c_freq_bin, -1)
    pooled = last.reshape(bsz, nch, -1).mean(axis=-1)
    return last, pooled


def _project(p: Params, pooled: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(nn.linear(p["audio_projection"]["linear1"], pooled))
    return nn.linear(p["audio_projection"]["linear2"], h)


def audio_embeds(p: Params, input_features: jnp.ndarray) -> jnp.ndarray:
    """``ClapAudioModelWithProjection().audio_embeds`` (un-normalised)."""
    _, pooled = encode(p, input_features)
    return _project(p, pooled)


def get_audio_features(p: Params, input_features: jnp.ndarray) -> jnp.ndarray:
    """``ClapModel.get_audio_features``: projection, L2-normalised."""
    emb = audio_embeds(p, input_features)
    norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
    return (emb / norm).astype(emb.dtype)
