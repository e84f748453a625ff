"""Jitted train/eval steps (reference `src/train.py:23-202` hot loop).

TPU-native design:

- One jitted ``train_step(state, frozen, batch) -> (state, metrics)``; the
  frozen towers (HTDemucs + CLAP, 167 M params) are a separate argument so
  the optimizer state only covers the ~3 M trainable head — the reference
  freezes via ``requires_grad=False`` + ``no_grad`` (`ATHTDemucs_v2.py:170`,
  `:277-279`); here the head is simply the only differentiated input.
- Data parallelism: shard the batch axis of ``batch`` over the mesh and jit
  inserts the gradient psum; params/opt state stay replicated (SURVEY §2c).
- bf16 compute inside the towers, f32 master weights, f32 loss — TPU's
  native mixed precision; no GradScaler needed (reference's CUDA AMP is
  marked WIP, config.yaml:19).
- AdamW(lr 1e-4, wd 1e-2) + cosine decay to lr/100 + global-norm clip 5.0
  (reference `src/train.py:476-483`, clip at `:89`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import atht
from ..ops import losses

Batch = Mapping[str, jnp.ndarray]   # mixture (B,2,T), target (B,2,T),
                                    # input_ids (B,L), attention_mask (B,L),
                                    # stem_index (B,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    head: Any
    opt_state: Any

    @staticmethod
    def create(head, optimizer: optax.GradientTransformation) -> "TrainState":
        return TrainState(step=jnp.zeros((), jnp.int32), head=head,
                          opt_state=optimizer.init(head))


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 1e-2,
    grad_clip: float | None = 5.0,
    total_steps: int | None = None,
    eta_min_ratio: float = 0.01,
) -> optax.GradientTransformation:
    """AdamW + cosine anneal to ``lr*eta_min_ratio`` + global-norm clip.

    The reference steps ``CosineAnnealingLR(T_max=num_epochs)`` once per
    epoch (`src/train.py:483,539`); we anneal smoothly per step over
    ``total_steps`` — same endpoints, finer granularity.
    """
    schedule: optax.Schedule | float
    if total_steps:
        schedule = optax.cosine_decay_schedule(lr, total_steps, alpha=eta_min_ratio)
    else:
        schedule = lr
    tx = optax.adamw(schedule, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def _loss(head, frozen, batch: Batch, loss_cfg: Mapping[str, Any],
          compute_dtype) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    params = {"htdemucs": frozen["htdemucs"], "clap": frozen["clap"],
              "head": head}
    est = atht.forward(params, batch["mixture"], batch["input_ids"],
                       batch["attention_mask"], compute_dtype)
    if loss_cfg.get("use_l1", False):
        return losses.combined_l1_sdr_loss(
            est, batch["target"],
            sdr_weight=loss_cfg.get("l1_sdr_weight", 1.0),
            l1_weight=loss_cfg.get("l1_weight", 0.1))
    return losses.combined_loss(
        est, batch["target"],
        sdr_weight=loss_cfg.get("sdr_weight", 0.9),
        sisdr_weight=loss_cfg.get("sisdr_weight", 0.1))


def make_train_step(
    optimizer: optax.GradientTransformation,
    loss_cfg: Mapping[str, Any] | None = None,
    compute_dtype=jnp.bfloat16,
) -> Callable[[TrainState, Any, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    loss_cfg = dict(loss_cfg or {})

    @jax.jit
    def train_step(state: TrainState, frozen, batch: Batch):
        (loss, metrics), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.head, frozen, batch, loss_cfg, compute_dtype)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.head)
        head = optax.apply_updates(state.head, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, head, opt_state), metrics

    return train_step


def make_eval_step(loss_cfg: Mapping[str, Any] | None = None,
                   compute_dtype=jnp.bfloat16):
    """No-grad validation step -> ``(metrics, per_item_sdr)``; the caller
    buckets per-stem SDR with the host batch's ``stem_index`` (reference
    `src/train.py:185-190`)."""
    loss_cfg = dict(loss_cfg or {})

    @jax.jit
    def eval_step(params, batch: Batch):
        est = atht.forward(params, batch["mixture"], batch["input_ids"],
                           batch["attention_mask"], compute_dtype)
        loss, metrics = losses.combined_loss(
            est, batch["target"],
            sdr_weight=loss_cfg.get("sdr_weight", 0.9),
            sisdr_weight=loss_cfg.get("sisdr_weight", 0.1))
        per_item = losses.new_sdr_metric(est, batch["target"])
        return dict(metrics), per_item

    return eval_step
