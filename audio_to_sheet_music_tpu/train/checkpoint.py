"""Orbax checkpointing with the reference's epoch/best/latest semantics.

Reference saves ``checkpoint_epoch_N.pt`` + ``best_model.pt`` + ``latest.pt``
dicts of ``{epoch, model/optimizer/scheduler state, metrics}``
(`src/train.py:205-236`) and auto-resumes from ``latest.pt`` when present
(`src/train.py:503-508`).  Here each save is an Orbax directory
(``epoch_0001`` / ``best`` / ``latest``) holding the train state (head +
optimizer), the epoch counter and metrics; the frozen towers are *not*
checkpointed per epoch (they never change — they live in the converted-weights
artifact), which shrinks a save from ~680 MB to ~35 MB.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _save_tree(path: Path, tree: Any) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path.resolve(), tree, force=True)


def _restore_tree(path: Path, template: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path.resolve(), abstract)


def save_checkpoint(ckpt_dir: str | Path, state, epoch: int,
                    metrics: Dict[str, float] | None = None,
                    is_best: bool = False, every: int | None = None) -> None:
    """Write ``latest`` (always), ``best`` (on new best SDR) and
    ``epoch_NNNN`` (every ``every`` epochs) checkpoints."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    tree = {"state": state}
    meta = {"epoch": int(epoch), "metrics": {k: float(v) for k, v in (metrics or {}).items()}}

    targets = [ckpt_dir / "latest"]
    if is_best:
        targets.append(ckpt_dir / "best")
    if every and (epoch + 1) % every == 0:
        targets.append(ckpt_dir / f"epoch_{epoch:04d}")
    # serialise the (device-resident) state ONCE, then copy the files for
    # the other targets — re-serialising fetches the whole tree over the
    # device link per target
    first = targets[0]
    _save_tree(first, tree)
    (first / "meta.json").write_text(json.dumps(meta))
    for t in targets[1:]:
        if t.exists():
            shutil.rmtree(t)
        shutil.copytree(first, t)


def load_checkpoint(path: str | Path, state_template) -> Tuple[Any, int, Dict]:
    """Restore ``(state, epoch, metrics)`` from a checkpoint directory."""
    path = Path(path)
    tree = _restore_tree(path, {"state": state_template})
    meta = {"epoch": -1, "metrics": {}}
    meta_file = path / "meta.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
    return tree["state"], int(meta.get("epoch", -1)), meta.get("metrics", {})


def load_head_params(path: str | Path, params: Any) -> Any:
    """Graft the trainable head from an Orbax train-state checkpoint dir
    onto a full param tree (for serving/inference: the frozen towers come
    from the converted-weights artifact, the head from training).

    Accepts either a save directory (``.../latest``) or a checkpoint root
    containing one.  The restore is template-free (the optimiser state's
    structure is unknown without the optimiser), so the head subtree is
    reshaped onto ``params['head']``'s structure leaf-by-leaf.
    """
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    path = Path(path)
    if not (path / "_CHECKPOINT_METADATA").exists() and \
            (path / "latest").exists():
        path = path / "latest"
    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(path.resolve())
    head = raw["state"]["head"]
    template = params["head"]
    flat_saved = jax.tree.leaves(head)
    treedef = jax.tree.structure(template)
    if len(flat_saved) != treedef.num_leaves:
        raise ValueError(
            f"checkpoint head has {len(flat_saved)} arrays, model head "
            f"expects {treedef.num_leaves} — architecture mismatch")
    # per-leaf shape check: equal leaf COUNTS with different structures
    # (renamed keys, reordered layers) would otherwise graft silently
    # corrupted weights or blow up later at forward time
    for i, (saved, want) in enumerate(zip(flat_saved,
                                          jax.tree.leaves(template))):
        if tuple(np.shape(saved)) != tuple(np.shape(want)):
            raise ValueError(
                f"checkpoint head leaf {i} has shape {np.shape(saved)}, "
                f"model expects {np.shape(want)} — architecture mismatch")
    new_head = jax.tree.unflatten(
        treedef, [jnp.asarray(a) for a in flat_saved])
    out = dict(params)
    out["head"] = new_head
    return out


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    """Auto-resume hook: the ``latest`` dir if present (reference
    `src/train.py:503-508`)."""
    p = Path(ckpt_dir) / "latest"
    return p if p.exists() else None


# ---------------------------------------------------------------------------
# Converted frozen-tower weights: a single npz artifact (no torch at runtime)
# ---------------------------------------------------------------------------

def save_params_npz(path: str | Path, params: Any) -> None:
    """Flatten a param pytree to an ``.npz`` (portable, torch-free)."""
    from ..convert.torch_import import _tree_paths

    flat = {"/".join(p): np.asarray(leaf) for p, leaf in _tree_paths(params)}
    np.savez(path, **flat)


def load_params_npz(path: str | Path, template: Any) -> Any:
    import jax.numpy as jnp

    data = np.load(path)

    def build(tree, prefix):
        if isinstance(tree, dict):
            return {k: build(v, prefix + [str(k)]) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [build(v, prefix + [str(i)]) for i, v in enumerate(tree)]
        return jnp.asarray(data["/".join(prefix)])

    return build(template, [])
