"""PyTorch state_dict -> JAX param pytree converter.

The nn layers store weights in **torch layouts** (see ``nn.core``), so
conversion is a pure name mapping with zero transposes.  Handles the three
checkpoint families the reference ecosystem produces:

- demucs pretrained ``htdemucs`` tower (``demucs.pretrained.get_model``,
  reference `src/train.py:400`),
- HF CLAP text tower (``laion/clap-htsat-unfused``, `src/train.py:404`),
- the reference's own training checkpoints
  ``{epoch, model_state_dict, optimizer_state_dict, ...}`` saved from the
  full ``AudioTextHTDemucs`` module (reference `src/train.py:205-236`),
  whose keys are prefixed ``htdemucs.`` / ``clap.`` / head-module names,
  optionally with a leading ``module.`` (stripped, `benchmark.py:398-404`).

Torch is used only to deserialise ``.pt`` files (host-side, CPU); everything
downstream is numpy/JAX.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = [
    "load_torch_state_dict",
    "fill_from_torch",
    "import_atht_checkpoint",
    "import_htdemucs_state",
    "import_clap_state",
]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pt`` checkpoint into ``{name: float32 ndarray}``.

    Unwraps the reference's ``model_state_dict`` container and strips any
    ``module.`` DataParallel prefix (reference `benchmark.py:398-404`).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state" in obj and isinstance(obj["state"], dict):
        obj = obj["state"]  # demucs remote checkpoint container
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


# ---------------------------------------------------------------------------
# Pytree-path -> torch-key translation
# ---------------------------------------------------------------------------

_DCONV_SEQ = {"conv1": "0", "norm1": "1", "conv2": "3", "norm2": "4", "scale": "6"}


def _translate(parts: list[str]) -> str:
    """Map a pytree path (list of keys/indices) to the torch dotted name."""
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _DCONV_SEQ and i >= 2 and parts[i - 2] == "layers" and "dconv" in out:
            out.append(_DCONV_SEQ[p])
            if p == "scale":
                out.append("scale")  # LayerScale's param is itself named scale
                i += 2  # skip the inner "scale" leaf name
                continue
        elif p == "scale" and out and out[-1] in ("gamma_1", "gamma_2"):
            out.append("scale")
        elif p == "conv" and i >= 2 and parts[0] in ("freq_decoder", "time_decoder"):
            out.append("0")          # head decoder Sequential index
        elif p == "norm" and i >= 2 and parts[0] in ("freq_decoder", "time_decoder"):
            out.append("1")
        else:
            out.append(p)
        i += 1
    return ".".join(out)


def _tree_paths(tree: Any, prefix: list[str] | None = None):
    prefix = prefix or []
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + [str(k)])
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _tree_paths(v, prefix + [str(i)])
    else:
        yield prefix, tree


def fill_from_torch(template: Any, state: Mapping[str, np.ndarray],
                    prefix: str = "", strict: bool = True) -> Any:
    """Fill a param-pytree ``template`` from a flat torch ``state`` dict.

    Every leaf path is translated to its torch key; shapes must match
    exactly.  With ``strict=False``, missing keys keep the template value
    (the reference loads checkpoints with ``strict=False`` to tolerate
    CLAP-variant drift, `src/train.py:251-264`).
    """
    import jax.numpy as jnp

    filled = 0
    missing = []

    def build(tree, parts):
        nonlocal filled
        if isinstance(tree, dict):
            return {k: build(v, parts + [str(k)]) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [build(v, parts + [str(i)]) for i, v in enumerate(tree)]
        key = prefix + _translate(parts)
        if key in state:
            arr = np.asarray(state[key], dtype=np.float32)
            if arr.shape != tuple(tree.shape):
                raise ValueError(f"{key}: shape {arr.shape} != {tuple(tree.shape)}")
            filled += 1
            return jnp.asarray(arr)
        missing.append(key)
        return tree

    out = build(template, [])
    if strict and missing:
        raise KeyError(f"{len(missing)} params missing, e.g. {missing[:5]}")
    return out


# ---------------------------------------------------------------------------
# Entry points per tower
# ---------------------------------------------------------------------------

def import_htdemucs_state(state: Mapping[str, np.ndarray], prefix: str = "",
                          strict: bool = True):
    """demucs HTDemucs state_dict -> ``models.htdemucs`` pytree."""
    import jax

    from ..models import htdemucs

    template = htdemucs.htdemucs_init(jax.random.PRNGKey(0))
    return fill_from_torch(template, state, prefix=prefix, strict=strict)


def _clap_key(name: str) -> str:
    """HF CLAP names -> our pytree-relative names."""
    name = name.replace("text_model.embeddings.", "embeddings.")
    name = name.replace("text_model.encoder.layer.", "layer.")
    name = name.replace("text_model.pooler.", "pooler.")
    return name


def import_clap_state(state: Mapping[str, np.ndarray], prefix: str = "",
                      strict: bool = True):
    """HF ClapModel / ClapTextModelWithProjection state_dict -> pytree."""
    import jax

    from ..models import clap_text

    remapped = {}
    for k, v in state.items():
        if k.startswith(prefix):
            remapped[_clap_key(k[len(prefix):])] = v
    template = clap_text.clap_text_init(jax.random.PRNGKey(0))
    return fill_from_torch(template, remapped, strict=strict)


def import_clap_audio_state(state: Mapping[str, np.ndarray],
                            strict: bool = True):
    """HF ClapAudioModel(+Projection) / ClapModel audio side -> pytree."""
    import jax

    from ..models import clap_audio

    remapped = {}
    for k, v in state.items():
        k = k.replace("audio_model.audio_encoder.", "")
        if k.endswith("num_batches_tracked"):
            continue
        remapped[k] = v
    template = clap_audio.clap_audio_init(jax.random.PRNGKey(0))
    return fill_from_torch(template, remapped, strict=strict)


def export_torch_names(params: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of ``fill_from_torch``: pytree -> flat torch-named dict.

    Useful for round-trip tests and for exporting trained heads to
    torch-consumable checkpoints.
    """
    return {prefix + _translate(p): np.asarray(leaf)
            for p, leaf in _tree_paths(params)}


def export_atht_checkpoint(params, path: str, epoch: int = 0,
                           metrics: Mapping[str, float] | None = None) -> None:
    """Full model pytree -> reference-style ``.pt`` training checkpoint.

    Inverse of ``import_atht_checkpoint``: writes a torch-loadable
    ``{epoch, model_state_dict, metrics}`` container whose keys follow the
    reference module naming (``htdemucs.*``, ``clap.*`` with HF text-model
    prefixes, bare head names), so heads trained here can be consumed by
    torch tooling.
    """
    import torch

    state: Dict[str, Any] = {}
    state.update(export_torch_names(params["htdemucs"], "htdemucs."))
    for k, v in export_torch_names(params["clap"]).items():
        if k.startswith(("embeddings.", "layer.", "pooler.")):
            k = ("clap.text_model." + k.replace("layer.", "encoder.layer.", 1))
        else:
            k = "clap." + k                    # text_projection.*
        state[k] = v
    # HF registers position/token-type ids as persistent BUFFERS, so a
    # reference-side `load_state_dict(strict=True)` requires them; they are
    # deterministic constants sized by the embedding tables.
    n_pos = state["clap.text_model.embeddings.position_embeddings.weight"].shape[0]
    state["clap.text_model.embeddings.position_ids"] = \
        np.arange(n_pos, dtype=np.int64)[None]
    state["clap.text_model.embeddings.token_type_ids"] = \
        np.zeros((1, n_pos), np.int64)
    state.update(export_torch_names(params["head"]))
    torch.save({"epoch": int(epoch),
                "model_state_dict": {k: torch.tensor(np.asarray(v))
                                     for k, v in state.items()},
                "metrics": dict(metrics or {})}, path)


def import_atht_checkpoint(path: str, strict: bool = True, template=None):
    """Reference AudioTextHTDemucs ``.pt`` checkpoint -> full model pytree.

    Returns ``{"htdemucs": ..., "clap": ..., "head": ...}`` matching
    ``models.atht.init``.  ``template`` overrides the destination pytree
    (used by tests with small family members).
    """
    import jax

    from ..models import atht

    state = load_torch_state_dict(path)
    params = template if template is not None else atht.init(jax.random.PRNGKey(0))
    params["htdemucs"] = fill_from_torch(
        params["htdemucs"],
        {k[len("htdemucs."):]: v for k, v in state.items()
         if k.startswith("htdemucs.")},
        strict=strict)
    clap_state = {_clap_key(k[len("clap."):]): v for k, v in state.items()
                  if k.startswith("clap.")}
    if clap_state:
        params["clap"] = fill_from_torch(params["clap"], clap_state,
                                         strict=False)
    head_state = {k: v for k, v in state.items()
                  if not k.startswith(("htdemucs.", "clap."))}
    params["head"] = fill_from_torch(params["head"], head_state, strict=strict)
    return params
