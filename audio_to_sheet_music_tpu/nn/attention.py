"""Multi-head attention with torch ``nn.MultiheadAttention`` parity.

Params mirror torch's packed layout (``in_proj_weight (3E, E)``,
``in_proj_bias (3E,)``, ``out_proj``) so checkpoint conversion is a rename.
The packed QKV projection is also the TPU-efficient choice for self-attention
(one big MXU matmul); for cross-attention the Q and KV slices are applied
separately to the two streams.

Softmax runs in f32 regardless of compute dtype.  Sequence lengths here are
small (<=2688 freq tokens / 1344 time tokens per 6 s window, reference
`HTDemucs_Fwd_Pass.txt:69-71`), so materialising the (L, S) score matrix is
cheap and XLA fuses the whole block; a Pallas flash-attention path is not
needed at these sizes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .core import Params, _uniform


def mha_init(key, embed_dim: int, kdim: int | None = None,
             vdim: int | None = None) -> Params:
    """torch MHA with equal q/k/v dims uses the packed in_proj layout."""
    kdim = kdim or embed_dim
    vdim = vdim or embed_dim
    assert kdim == embed_dim and vdim == embed_dim, "packed layout only"
    k1, k2, k3 = jax.random.split(key, 3)
    # torch applies xavier_uniform_ to the PACKED (3E, E) tensor, so
    # fan_in + fan_out = 3E + E (verified vs nn.MultiheadAttention(384))
    bound = math.sqrt(6.0 / (4.0 * embed_dim))
    return {
        "in_proj_weight": _uniform(k1, (3 * embed_dim, embed_dim), bound),
        "in_proj_bias": jnp.zeros((3 * embed_dim,), jnp.float32),
        "out_proj": {
            "weight": _uniform(k2, (embed_dim, embed_dim), 1.0 / math.sqrt(embed_dim)),
            "bias": jnp.zeros((embed_dim,), jnp.float32),
        },
    }


def _heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, e = x.shape
    return x.reshape(b, l, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def mha(p: Params, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray,
        num_heads: int) -> jnp.ndarray:
    """Batch-first MHA: query (B, L, E), key/value (B, S, E) -> (B, L, E)."""
    e = query.shape[-1]
    w = p["in_proj_weight"].astype(query.dtype)
    b = p["in_proj_bias"].astype(query.dtype)
    if key is query and value is query:
        # self-attention: one packed (E, 3E) matmul reads the input once
        qkv = query @ w.T + b
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = query @ w[:e].T + b[:e]
        k = key @ w[e : 2 * e].T + b[e : 2 * e]
        v = value @ w[2 * e :].T + b[2 * e :]

    qh = _heads(q, num_heads)
    kh = _heads(k, num_heads)
    vh = _heads(v, num_heads)

    head_dim = e // num_heads
    scores = jnp.einsum("bhld,bhsd->bhls", qh, kh) / math.sqrt(head_dim)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(query.dtype)
    out = jnp.einsum("bhls,bhsd->bhld", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(*query.shape[:2], e)
    op = p["out_proj"]
    return out @ op["weight"].astype(query.dtype).T + op["bias"].astype(query.dtype)


def self_attention(p: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    return mha(p, x, x, x, num_heads)
