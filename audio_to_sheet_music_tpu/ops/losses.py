"""Separation losses — functional JAX clones of reference `src/loss.py`.

All functions take ``estimated`` / ``target`` arrays of shape ``(B, C, T)``
(or any ``(B, ...)``), reduce exactly as the reference does, and return f32
scalars.  Numerical contract per reference:

- ``sdr_loss``    — −10·log10((‖t‖²+δ)/(‖t−e‖²+δ)), δ=1e-8, clamped ±30 dB,
  mean over batch (`src/loss.py:9-30`).
- ``sisdr_loss``  — zero-mean, project estimate onto target, same clamp
  (`src/loss.py:33-68`).
- ``new_sdr_metric`` — MDX-style positive per-item SDR over (C,T)
  (`src/loss.py:71-87`).
- ``combined_loss`` — 0.9·sdr + 0.1·sisdr + logging metrics
  (`src/loss.py:90-127`).
- ``combined_l1_sdr_loss`` — sdr + L1 (`src/loss.py:130-162`); the 0.05
  function default mirrors the reference's (its trainer always overrides it
  from config, where the shipped value is 0.1 — as does ours).

The combined losses return ``(loss, metrics)`` where metrics is a dict of f32
scalars (still traced values — call ``float()`` host-side for logging).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

_DELTA = 1e-8


def _flatten(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1).astype(jnp.float32)


def sdr_loss(estimated: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Negative SDR, mean over batch, clamped to ±30 dB."""
    est = _flatten(estimated)
    tgt = _flatten(target)
    num = jnp.sum(tgt ** 2, axis=-1)
    den = jnp.sum((tgt - est) ** 2, axis=-1)
    sdr = 10.0 * jnp.log10((num + _DELTA) / (den + _DELTA))
    sdr = jnp.clip(sdr, -30.0, 30.0)
    return -jnp.mean(sdr)


def sisdr_loss(estimated: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Negative scale-invariant SDR, mean over batch, clamped to ±30 dB."""
    est = _flatten(estimated)
    tgt = _flatten(target)
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    tgt = tgt - jnp.mean(tgt, axis=-1, keepdims=True)
    dot = jnp.sum(est * tgt, axis=-1, keepdims=True)
    tgt_energy = jnp.sum(tgt ** 2, axis=-1, keepdims=True)
    s_target = (dot / (tgt_energy + _DELTA)) * tgt
    e_noise = est - s_target
    num = jnp.sum(s_target ** 2, axis=-1)
    den = jnp.sum(e_noise ** 2, axis=-1)
    sisdr = 10.0 * jnp.log10((num + _DELTA) / (den + _DELTA))
    sisdr = jnp.clip(sisdr, -30.0, 30.0)
    return -jnp.mean(sisdr)


def new_sdr_metric(estimated: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MDX-challenge SDR per batch item, shape (B,). For logging only."""
    est = estimated.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    axes = tuple(range(1, tgt.ndim))
    num = jnp.sum(tgt ** 2, axis=axes)
    den = jnp.sum((tgt - est) ** 2, axis=axes)
    return 10.0 * jnp.log10((num + _DELTA) / (den + _DELTA))


def combined_loss(
    estimated: jnp.ndarray,
    target: jnp.ndarray,
    sdr_weight: float = 0.9,
    sisdr_weight: float = 0.1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """0.9·SDR + 0.1·SI-SDR (reference `src/loss.py:90-127`)."""
    sdr = sdr_loss(estimated, target)
    sisdr = sisdr_loss(estimated, target)
    total = sdr_weight * sdr + sisdr_weight * sisdr
    pos_sdr = jnp.mean(new_sdr_metric(estimated, target))
    metrics = {
        "loss/total": total,
        "loss/sdr": sdr,
        "loss/sisdr": sisdr,
        "metrics/sdr": -sdr,
        "metrics/sisdr": -sisdr,
        "metrics/new_sdr": pos_sdr,
    }
    return total, metrics


def combined_l1_sdr_loss(
    estimated: jnp.ndarray,
    target: jnp.ndarray,
    sdr_weight: float = 1.0,
    l1_weight: float = 0.05,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """SDR + L1 alternative (reference `src/loss.py:130-162`)."""
    sdr = sdr_loss(estimated, target)
    sisdr = sisdr_loss(estimated, target)
    l1 = jnp.mean(jnp.abs(estimated.astype(jnp.float32) - target.astype(jnp.float32)))
    total = sdr_weight * sdr + l1_weight * l1
    metrics = {
        "loss/total": total,
        "loss/sdr": sdr,
        "loss/sisdr": sisdr,
        "metrics/sdr": -sdr,
        "metrics/sisdr": -sisdr,
    }
    return total, metrics
