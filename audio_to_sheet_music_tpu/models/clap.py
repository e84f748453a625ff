"""Full CLAP model: text + audio towers + contrastive similarity head.

Completes the ``ClapModel`` surface the reference loads (`app.py:53`,
`benchmark.py` CLAPSep path): ``get_text_features`` / ``get_audio_features``
(both L2-normalised) and the contrastive logits with learned temperature
scales (``logit_scale_t`` / ``logit_scale_a``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import clap_audio, clap_text

Params = Dict[str, Any]

LOGIT_SCALE_INIT = math.log(1 / 0.07)   # HF ClapConfig.logit_scale_init_value


def clap_init(key) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "text": clap_text.clap_text_init(k1),
        "audio": clap_audio.clap_audio_init(k2),
        "logit_scale_t": jnp.asarray(LOGIT_SCALE_INIT, jnp.float32),
        "logit_scale_a": jnp.asarray(LOGIT_SCALE_INIT, jnp.float32),
    }


def get_text_features(p: Params, input_ids, attention_mask) -> jnp.ndarray:
    return clap_text.get_text_features(p["text"], input_ids, attention_mask)


def get_audio_features(p: Params, input_features) -> jnp.ndarray:
    return clap_audio.get_audio_features(p["audio"], input_features)


def similarity(p: Params, input_ids, attention_mask, input_features
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> ``(logits_per_audio (A, T), logits_per_text (T, A))`` (HF
    ``ClapModel.forward`` contract)."""
    text = get_text_features(p, input_ids, attention_mask)
    audio = get_audio_features(p, input_features)
    logits_per_text = (text @ audio.T) * jnp.exp(p["logit_scale_t"])
    logits_per_audio = (audio @ text.T) * jnp.exp(p["logit_scale_a"])
    return logits_per_audio, logits_per_text
