"""Mesh / sharding helpers.

The reference is single-process single-device (SURVEY §2c); the TPU framework
scales two axes the natural SPMD way instead:

- training: the **batch** axis is sharded over the mesh (data parallelism);
  gradients are reduced by the psum XLA inserts under ``jit`` with sharded
  inputs — no hand-written collectives.
- inference: the **chunk** axis of a full-song sweep is the data axis, so one
  song's 6 s windows spread across all chips and overlap-add runs on the
  gathered result.

The model is ~170 M params total (42 M HTDemucs + 125 M CLAP + 3 M head), so
params are replicated; tensor/pipeline parallelism is intentionally out of
scope (SURVEY §2c: "fits one chip").
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["DATA_AXIS", "Mesh", "NamedSharding", "P", "make_mesh",
           "pad_to_multiple", "replicate", "shard_batch"]

DATA_AXIS = "data"


def make_mesh(devices: Sequence[jax.Device] | None = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(x: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Shard axis 0 of every array in ``x`` over the mesh."""

    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, x)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every array in ``tree`` on all mesh devices."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
