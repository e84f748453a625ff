"""On-hardware parity gate for the default-on fused Pallas kernels.

The production forward flows through ``ops.pallas_attn.layer_tail`` (the
transformer layers) and ``ops.pallas_enc.henc_freq_fused`` (the shallow
frequency encoder layers) whenever the backend is TPU
(``models.htdemucs._use_pallas_layer`` / ``_use_pallas_enc``), but the
kernels' equality tests run in interpret mode (CPU emulation) which cannot
observe Mosaic lowering bugs, and the env-tunable query tile
(``ATSM_PALLAS_QT``) changes padding/tiling paths.  This gate closes that
hole: it runs ONE full flagship forward twice on the *actual* backend —
per-op XLA path vs fused kernel path (all kernels on), same inputs, same
params, at the active QT — and compares the produced stems.

On divergence beyond the threshold (1e-3 rms on a ~0.1-unit-rms stem; the
measured healthy delta is ~3e-4, bf16-rounding grade — docs/PERFORMANCE.md)
the gate **vetoes the kernel for the rest of the process** with a loud
warning, so a Mosaic regression or a bad QT value degrades to the slower
per-op path instead of silently corrupting every stem served.

Call sites: ``infer.Separator`` construction (every serving / benchmark /
CLI session on TPU), ``bench.py`` (records ``pallas_parity_rms`` in the
driver JSON), ``scripts/verify_pallas_parity.py`` (standalone).  Opt out
with ``ATSM_SKIP_PARITY_GATE=1``.

The reference has no analogue (its compute path is stock torch ops); this
subsystem exists because we ship a hand-written kernel on the default path.
"""

from __future__ import annotations

import os
import sys
import warnings
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

RMS_THRESHOLD = 1e-3      # ~0.1 dB-budget grade on unit-order stems
GATE_SECONDS = 6.0        # one production chunk (the shapes that matter)
SAMPLE_RATE = 44100

# One gate per process: the veto must be decided before production programs
# trace, and re-running the two-compile check per Separator would be waste.
_RESULT: Optional[Dict] = None


def last_result() -> Optional[Dict]:
    """The gate outcome for this process (None = not run/skipped)."""
    return _RESULT


def _default_pair(params, compute_dtype) -> tuple[Callable, tuple]:
    """(forward_fn, args) for the gate: the flagship text-conditioned
    forward on one 6 s chunk — the exact path serving dispatches."""
    from ..models import atht

    rng = np.random.default_rng(0)
    t = int(GATE_SECONDS * SAMPLE_RATE)
    wav = jnp.asarray(0.1 * rng.standard_normal((1, 2, t)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((1, 512)) / np.sqrt(512),
                      jnp.float32)

    def fwd(p, w, e):
        return atht.forward_with_text_emb(p, w, e, compute_dtype)

    return fwd, (params, wav, emb)


def verify_layer_parity(params, compute_dtype=jnp.bfloat16,
                        threshold: float = RMS_THRESHOLD,
                        forward: Callable | None = None,
                        args: tuple | None = None) -> Dict:
    """Run per-op vs fused-kernel forwards on the live backend; compare.

    Returns ``{"rms", "ref_rms", "ok", "qt", "backend"}``.  Does NOT veto —
    that is ``ensure_layer_parity``'s job.  ``forward``/``args`` override
    the default flagship pair (used by tests to inject a divergent path).

    The kernel env flags (``ATSM_PALLAS_LAYER`` + ``ATSM_PALLAS_ENC``) are
    toggled together around two *fresh* ``jax.jit`` wrappers (the flags are
    read at trace time, so each pass needs its own trace); the caller's env
    values are restored either way.  One gate covers every default-on
    hand-written kernel in the forward.
    """
    from . import pallas_attn

    if forward is None or args is None:
        forward, args = _default_pair(params, compute_dtype)

    def _fresh(tag):
        # jax's jit cache is keyed on function identity: jitting the SAME
        # callable twice reuses the first trace, which would silently
        # compare the kernel path against itself.  A fresh closure per
        # pass forces a fresh trace under each env setting.
        def run(*a):
            return forward(*a)

        run.__name__ = f"_parity_{tag}"
        return jax.jit(run)

    _FLAGS = ("ATSM_PALLAS_LAYER", "ATSM_PALLAS_ENC")
    saved = {k: os.environ.get(k) for k in _FLAGS}
    try:
        for k in _FLAGS:
            os.environ[k] = "0"
        ref = np.asarray(_fresh("perop")(*args), np.float32)
        for k in _FLAGS:
            os.environ[k] = "1"
        ker = np.asarray(_fresh("kernel")(*args), np.float32)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    rms = float(np.sqrt(np.mean((ref - ker) ** 2)))
    return {
        "rms": rms,
        "ref_rms": float(np.sqrt(np.mean(ref ** 2))),
        "ok": bool(np.isfinite(rms) and rms < threshold),
        "qt": pallas_attn.QT,
        "backend": jax.default_backend(),
    }


def ensure_layer_parity(params, compute_dtype=jnp.bfloat16,
                        threshold: float = RMS_THRESHOLD,
                        forward: Callable | None = None,
                        args: tuple | None = None) -> Optional[Dict]:
    """Gate the fused layer kernel once per process; veto it on failure.

    No-op (returns the cached/None result) when: already run, the kernel
    would not be active anyway (CPU backend, env off, unsupported dims), or
    ``ATSM_SKIP_PARITY_GATE=1``.  On failure the kernel is disabled for the
    rest of the process via ``models.htdemucs.veto_pallas_layer`` and a
    loud warning names the measured delta and the active QT.
    """
    global _RESULT
    if _RESULT is not None:
        return _RESULT
    if os.environ.get("ATSM_SKIP_PARITY_GATE") == "1":
        return None
    from ..models import htdemucs

    if htdemucs.pallas_layer_vetoed():
        return None
    # Would a kernel even run?  (CPU backends / both envs "0" -> nothing
    # to gate.)
    if (os.environ.get("ATSM_PALLAS_LAYER") == "0"
            and os.environ.get("ATSM_PALLAS_ENC") == "0"):
        return None
    if forward is None:
        if jax.default_backend() == "cpu":
            return None
        # Kernel engages only at lane-aligned transformer dims — tiny test
        # towers (dim 64) never run it, so there is nothing to gate.
        try:
            from . import pallas_attn

            layer = params["htdemucs"]["crosstransformer"]["layers"][0]
            ff, dim = layer["linear1"]["weight"].shape
            if not pallas_attn.supports_layer(dim, htdemucs._n_heads(dim),
                                              ff):
                return None
        except (KeyError, TypeError, IndexError):
            return None

    res = verify_layer_parity(params, compute_dtype, threshold,
                              forward=forward, args=args)
    _RESULT = res
    if not res["ok"]:
        reason = (f"parity gate failed: rms delta {res['rms']:.3e} >= "
                  f"{threshold:.0e} at QT={res['qt']} on {res['backend']}")
        htdemucs.veto_pallas_layer(reason)
        htdemucs.veto_pallas_enc(reason)
        msg = ("ATSM PARITY GATE: the fused Pallas kernel path DIVERGES "
               f"from the per-op path (rms {res['rms']:.3e}, ref_rms "
               f"{res['ref_rms']:.3e}, QT={res['qt']}, "
               f"backend={res['backend']}) — falling back to the per-op "
               "XLA path for this process (both the layer and encoder "
               "kernels are vetoed). Throughput drops; outputs stay "
               "correct. Investigate ops/pallas_attn.py and "
               "ops/pallas_enc.py vs the current jax/Mosaic version and "
               "ATSM_PALLAS_QT.")
        print(msg, file=sys.stderr, flush=True)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return res
