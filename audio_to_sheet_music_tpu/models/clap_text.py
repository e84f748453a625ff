"""CLAP text tower (RoBERTa encoder + projection) as pure-function JAX.

Re-implements the frozen 125 M-param text encoder the reference consumes from
``transformers`` (``laion/clap-htsat-unfused``; architecture pinned by the
in-repo dumps, reference `AudioTextHTDemucs_Full.txt:630-676` and
`CLAP_Text_Model_Fwd_Pass.txt:1-40`):

- Embeddings: word (50265, 768, pad_idx 1) + RoBERTa-offset positions (514) +
  token type (1), LayerNorm eps 1e-12.
- 12 post-LN transformer layers (dim 768, 12 heads, FF 3072, GELU).
- Tanh pooler over the first token.
- 2-layer projection 768 -> 512 -> 512 with ReLU.

Two output contracts, matching the two HF entry points the reference uses:

- ``text_embeds``  — ``ClapTextModelWithProjection.forward().text_embeds``
  (train path, reference `src/train.py:404`, `ATHTDemucs_v2.py:248`): the raw
  projection output, **not** L2-normalised.
- ``get_text_features`` — ``ClapModel.get_text_features`` (app/benchmark
  path, `ATHTDemucs_v2.py:244`): projection output L2-normalised.

Param names mirror the HF state_dict so checkpoint conversion is a rename.
Parity-tested against ``transformers`` (CPU, random weights) in
``tests/test_models.py`` (TestClapTextParity).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..nn import core as nn

Params = Dict[str, Any]

VOCAB_SIZE = 50265
MAX_POSITIONS = 514
HIDDEN = 768
NUM_LAYERS = 12
NUM_HEADS = 12
FF = 3072
PROJECTION_DIM = 512
PAD_TOKEN_ID = 1
LN_EPS = 1e-12


def clap_text_init(key, num_layers: int = NUM_LAYERS,
                   hidden: int = HIDDEN, ff: int | None = None,
                   vocab_size: int = VOCAB_SIZE,
                   projection_dim: int = PROJECTION_DIM) -> Params:
    """Defaults = laion/clap-htsat-unfused; smaller values build test-sized
    family members (heads derive as hidden//64, the BERT convention)."""
    ff = ff if ff is not None else 4 * hidden
    keys = jax.random.split(key, num_layers + 5)
    layers = []
    for i in range(num_layers):
        k = jax.random.split(keys[i], 6)
        layers.append({
            "attention": {
                "self": {
                    "query": nn.linear_init(k[0], hidden, hidden),
                    "key": nn.linear_init(k[1], hidden, hidden),
                    "value": nn.linear_init(k[2], hidden, hidden),
                },
                "output": {
                    "dense": nn.linear_init(k[3], hidden, hidden),
                    "LayerNorm": nn.norm_affine_init(hidden),
                },
            },
            "intermediate": {"dense": nn.linear_init(k[4], hidden, ff)},
            "output": {
                "dense": nn.linear_init(k[5], ff, hidden),
                "LayerNorm": nn.norm_affine_init(hidden),
            },
        })
    ke = jax.random.split(keys[num_layers], 3)
    kp = jax.random.split(keys[num_layers + 1], 3)
    return {
        "embeddings": {
            "word_embeddings": nn.embedding_init(ke[0], vocab_size, hidden),
            "position_embeddings": nn.embedding_init(ke[1], MAX_POSITIONS, hidden),
            "token_type_embeddings": nn.embedding_init(ke[2], 1, hidden),
            "LayerNorm": nn.norm_affine_init(hidden),
        },
        "layer": layers,
        "pooler": {"dense": nn.linear_init(kp[0], hidden, hidden)},
        "text_projection": {
            "linear1": nn.linear_init(kp[1], hidden, projection_dim),
            "linear2": nn.linear_init(kp[2], projection_dim, projection_dim),
        },
    }


def _position_ids(input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """RoBERTa position ids: cumsum over non-pad tokens, offset by pad idx."""
    mask = attention_mask.astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + PAD_TOKEN_ID


def _attention(p: Params, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Post-LN BERT self-attention block with additive mask bias."""
    b, l, hidden = x.shape
    num_heads = max(1, hidden // 64)   # BERT head_dim=64 convention
    head_dim = hidden // num_heads

    def split(h):
        return h.reshape(b, l, num_heads, head_dim).transpose(0, 2, 1, 3)

    q = split(nn.linear(p["self"]["query"], x))
    k = split(nn.linear(p["self"]["key"], x))
    v = split(nn.linear(p["self"]["value"], x))
    scores = jnp.einsum("bhld,bhsd->bhls", q, k) / jnp.sqrt(
        jnp.asarray(head_dim, x.dtype))
    scores = scores + bias
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhls,bhsd->bhld", attn, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, hidden)
    out = nn.linear(p["output"]["dense"], ctx)
    return nn.layer_norm(p["output"]["LayerNorm"], out + x, eps=LN_EPS)


def _layer(p: Params, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    x = _attention(p["attention"], x, bias)
    h = nn.gelu(nn.linear(p["intermediate"]["dense"], x))
    h = nn.linear(p["output"]["dense"], h)
    return nn.layer_norm(p["output"]["LayerNorm"], h + x, eps=LN_EPS)


def encode(p: Params, input_ids: jnp.ndarray, attention_mask: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L) int token ids + (B, L) 0/1 mask -> (hidden (B,L,768), pooled (B,768))."""
    emb = p["embeddings"]
    x = nn.embedding(emb["word_embeddings"], input_ids)
    x = x + nn.embedding(emb["position_embeddings"],
                         _position_ids(input_ids, attention_mask))
    x = x + emb["token_type_embeddings"]["weight"][0]
    x = nn.layer_norm(emb["LayerNorm"], x, eps=LN_EPS)

    bias = (1.0 - attention_mask.astype(jnp.float32)) * jnp.finfo(jnp.float32).min
    bias = bias[:, None, None, :]
    for lp in p["layer"]:
        x = _layer(lp, x, bias)

    pooled = jnp.tanh(nn.linear(p["pooler"]["dense"], x[:, 0]))
    return x, pooled


def _project(p: Params, pooled: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(nn.linear(p["text_projection"]["linear1"], pooled))
    return nn.linear(p["text_projection"]["linear2"], h)


def text_embeds(p: Params, input_ids: jnp.ndarray,
                attention_mask: jnp.ndarray) -> jnp.ndarray:
    """``ClapTextModelWithProjection().text_embeds``: projection, un-normalised."""
    _, pooled = encode(p, input_ids, attention_mask)
    return _project(p, pooled)


def get_text_features(p: Params, input_ids: jnp.ndarray,
                      attention_mask: jnp.ndarray) -> jnp.ndarray:
    """``ClapModel.get_text_features``: projection, L2-normalised."""
    emb = text_embeds(p, input_ids, attention_mask)
    norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
    return (emb / norm).astype(emb.dtype)
