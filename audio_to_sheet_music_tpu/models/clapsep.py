"""CLAPSep baseline — native TPU implementation (third benchmark model).

The reference downloads the CLAPSep model (Ma et al. 2024,
github.com/Aisaka0v0/CLAPSep) from HF Hub at runtime and drives it through
``inference_from_data(chunk, embed_pos, embed_neg)`` (reference
`benchmark.py:277-548`).  This module provides the model itself natively so
the baseline is *weights-away* rather than download-away: the architecture
follows the paper and the reference's ``model_config`` (`benchmark.py:367-377`)
— language-queried magnitude masking of a mono 32 kHz spectrogram:

- frontend: STFT magnitude, ``log1p(mag * spec_factor)`` compression
  (``phase: False`` — magnitude mask only, mixture phase reused).
- query: ``concat(pos_emb, neg_emb)`` CLAP text embeddings
  (``lan_embed_dim=1024``) FiLM-modulates every transformer block.
- encoder/decoder: a time-axis U-Net of pre-LN transformer blocks
  (``depths=[1,1,1,1]``, mean-pool x2 down / repeat x2 up, skip adds).
- masker: ``n_masker_layer=3`` full-resolution blocks at ``d_attn=640``
  -> sigmoid mask over the mixture magnitude -> iSTFT.

TPU-first deviations (documented, weights cannot be bit-ported anyway since
the upstream decoder source is not distributable here): attention/FFN dims
all ride the MXU as single large matmuls, and everything is static-shaped,
jitting into one XLA program per chunk grid.  The STFT geometry matches
upstream HTSAT exactly (n_fft 1024 / hop 320 — ``ops.dsp.overlap_add``
handles non-dividing hops by pad-to-multiple + crop).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..nn import core as nn
from ..nn.attention import mha, mha_init
from ..ops import dsp

Params = Dict[str, Any]

SAMPLE_RATE = 32000                     # reference CLAPSEP_SAMPLE_RATE
CHUNK_SECONDS = 10.0                    # reference benchmark.py:466
OVERLAP_SECONDS = 1.0                   # reference benchmark.py:467

# Natural-language stem queries (reference `benchmark.py:428-437`).
CLAPSEP_PROMPTS = {
    "drums": "drums and percussion",
    "bass": "bass guitar and bass sounds",
    "vocals": "singing voice and vocals",
    "other": "other musical instruments",
}


@dataclasses.dataclass(frozen=True)
class ClapSepConfig:
    """Mirrors the reference ``model_config`` (`benchmark.py:367-377`)."""

    lan_embed_dim: int = 1024           # concat(pos, neg) query width
    depths: tuple = (1, 1, 1, 1)        # U-Net stages (blocks per stage)
    embed_dim: int = 128                # stage-0 width scale marker
    d_attn: int = 640                   # transformer width
    n_masker_layer: int = 3
    phase: bool = False                 # magnitude mask only
    spec_factor: float = 8.0            # log1p compression gain
    n_fft: int = 1024
    hop: int = 320                      # upstream HTSAT geometry
    num_heads: int = 8

    @property
    def bins(self) -> int:
        return self.n_fft // 2 + 1


TINY = ClapSepConfig(lan_embed_dim=1024, depths=(1, 1), d_attn=64,
                     n_masker_layer=1, n_fft=256, hop=64, num_heads=2)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _block_init(key, cfg: ClapSepConfig) -> Params:
    k = jax.random.split(key, 5)
    d = cfg.d_attn
    return {
        "attn": mha_init(k[0], d),
        "film": nn.linear_init(k[1], cfg.lan_embed_dim, 2 * d),
        "linear1": nn.linear_init(k[2], d, 4 * d),
        "linear2": nn.linear_init(k[3], 4 * d, d),
        "norm1": nn.norm_affine_init(d),
        "norm2": nn.norm_affine_init(d),
    }


def _block_apply(p: Params, x: jnp.ndarray, query: jnp.ndarray,
                 num_heads: int) -> jnp.ndarray:
    """Pre-LN self-attention block with FiLM conditioning.

    x: (B, L, D); query: (B, lan_embed_dim).  FiLM scale/shift applies after
    the attention residual (the language query gates which time-frequency
    content survives).
    """
    h = nn.layer_norm(p["norm1"], x)
    x = x + mha(p["attn"], h, h, h, num_heads)
    gamma, beta = jnp.split(nn.linear(p["film"], query), 2, axis=-1)
    x = x * (1.0 + gamma[:, None, :]) + beta[:, None, :]
    h = nn.layer_norm(p["norm2"], x)
    return x + nn.linear(p["linear2"], nn.gelu(nn.linear(p["linear1"], h)))


def clapsep_init(key, cfg: ClapSepConfig = ClapSepConfig()) -> Params:
    n_stages = len(cfg.depths)
    keys = jax.random.split(key, 4 + 2 * sum(cfg.depths) + cfg.n_masker_layer)
    ki = iter(keys)
    enc: List[List[Params]] = []
    dec: List[List[Params]] = []
    for depth in cfg.depths:
        enc.append([_block_init(next(ki), cfg) for _ in range(depth)])
    for depth in cfg.depths[::-1]:
        dec.append([_block_init(next(ki), cfg) for _ in range(depth)])
    return {
        "embed": nn.linear_init(next(ki), cfg.bins, cfg.d_attn),
        "encoder": enc,
        "decoder": dec,
        "masker": [_block_init(next(ki), cfg)
                   for _ in range(cfg.n_masker_layer)],
        "head": nn.linear_init(next(ki), cfg.d_attn, cfg.bins),
    }


def _downsample(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, D) -> (B, ceil(L/2), D) pair mean-pool (pads odd L)."""
    b, l, d = x.shape
    if l % 2:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)), mode="edge")
        l += 1
    return x.reshape(b, l // 2, 2, d).mean(axis=2)


def _upsample(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """(B, L, D) -> (B, target_len, D) nearest (repeat x2, crop)."""
    b, l, d = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return x[:, :target_len]


def apply_mask_net(p: Params, feats: jnp.ndarray, query: jnp.ndarray,
                   cfg: ClapSepConfig) -> jnp.ndarray:
    """(B, L, bins) log-compressed magnitude -> (B, L, bins) sigmoid mask."""
    x = nn.linear(p["embed"], feats)
    skips = []
    for stage in p["encoder"]:
        for blk in stage:
            x = _block_apply(blk, x, query, cfg.num_heads)
        skips.append(x)
        x = _downsample(x)
    for stage, skip in zip(p["decoder"], skips[::-1]):
        x = _upsample(x, skip.shape[1]) + skip
        for blk in stage:
            x = _block_apply(blk, x, query, cfg.num_heads)
    for blk in p["masker"]:
        x = _block_apply(blk, x, query, cfg.num_heads)
    return jax.nn.sigmoid(nn.linear(p["head"], x))


def forward(p: Params, wav: jnp.ndarray, embed_pos: jnp.ndarray,
            embed_neg: jnp.ndarray,
            cfg: ClapSepConfig = ClapSepConfig()) -> jnp.ndarray:
    """``inference_from_data`` contract (reference `benchmark.py:501`).

    wav: (B, T) mono 32 kHz chunk; embed_pos/neg: (B, 512) CLAP text
    embeddings.  Returns the (B, T) separated waveform.
    """
    t = wav.shape[-1]
    z = dsp.stft(wav.astype(jnp.float32), cfg.n_fft, cfg.hop)   # (B, F, L)
    mag = jnp.abs(z)
    feats = jnp.log1p(mag * cfg.spec_factor).transpose(0, 2, 1)  # (B, L, F)
    query = jnp.concatenate([embed_pos, embed_neg], axis=-1)
    mask = apply_mask_net(p, feats, query, cfg)                  # (B, L, F)
    masked = mag * mask.transpose(0, 2, 1)
    phase = z / jnp.maximum(mag, 1e-8)
    return dsp.istft(masked * phase, t, cfg.n_fft, cfg.hop)


def param_count(p: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(p))
