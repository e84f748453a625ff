"""Shared torch golden-model helpers for parity tests.

These re-derive, with plain torch ops, the exact signal-path recipes the
reference consumes from the ``demucs`` pip package (called at
`ATHTDemucs_v2.py:261-310`), plus a loader for the reference's own trainable
head module.  They are the "other side" of the golden parity tests: the JAX
framework must match these to numerical tolerance.
"""

from __future__ import annotations

import importlib.util
import math
import sys
import types

import torch

REF_ATHT = "/root/reference/src/models/stem_separation/ATHTDemucs_v2.py"


def load_reference_atht():
    """Import the reference's ATHTDemucs_v2 module with a stub ``demucs``.

    Only ``demucs.htdemucs.HTDemucs`` is referenced at import time (as a type
    annotation); torch / transformers / einops are real.
    """
    if "demucs" not in sys.modules:
        stub = types.ModuleType("demucs")
        stub_ht = types.ModuleType("demucs.htdemucs")

        class HTDemucs:  # noqa: D401 - import-time placeholder only
            pass

        stub_ht.HTDemucs = HTDemucs
        stub.htdemucs = stub_ht
        sys.modules["demucs"] = stub
        sys.modules["demucs.htdemucs"] = stub_ht
    spec = importlib.util.spec_from_file_location("ref_atht_v2", REF_ATHT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def torch_demucs_spec(x: torch.Tensor, n_fft: int = 4096,
                      hop: int = 1024) -> torch.Tensor:
    """demucs ``HTDemucs._spec`` re-derived with torch ops.

    (B, C, T) real -> (B, C, n_fft//2, ceil(T/hop)) complex.
    """
    b, c, t = x.shape
    le = int(math.ceil(t / hop))
    pad = hop // 2 * 3
    x = torch.nn.functional.pad(x, (pad, pad + le * hop - t), mode="reflect")
    z = torch.stft(
        x.reshape(-1, x.shape[-1]), n_fft, hop,
        window=torch.hann_window(n_fft), win_length=n_fft,
        normalized=True, center=True, return_complex=True, pad_mode="reflect",
    )
    z = z.view(b, c, *z.shape[-2:])
    return z[..., :-1, 2 : 2 + le]


def torch_demucs_ispec(z: torch.Tensor, length: int, n_fft: int = 4096,
                       hop: int = 1024) -> torch.Tensor:
    """demucs ``HTDemucs._ispec`` re-derived with torch ops.

    (B, C, n_fft//2, le) complex -> (B, C, length) real.
    """
    z = torch.nn.functional.pad(z, (0, 0, 0, 1))   # restore Nyquist bin
    z = torch.nn.functional.pad(z, (2, 2))         # restore edge frames
    pad = hop // 2 * 3
    le = hop * int(math.ceil(length / hop)) + 2 * pad
    b, c = z.shape[:2]
    x = torch.istft(
        z.reshape(-1, *z.shape[-2:]), n_fft, hop,
        window=torch.hann_window(n_fft), win_length=n_fft,
        normalized=True, center=True, length=le,
    )
    x = x.view(b, c, -1)
    return x[..., pad : pad + length]


def state_to_numpy(module: torch.nn.Module, prefix: str = "") -> dict:
    """state_dict -> {prefixed_name: float32 ndarray}."""
    return {prefix + k: v.detach().cpu().numpy().astype("float32")
            for k, v in module.state_dict().items()}
