"""Parity gate for the fused Pallas layer kernel (ops/kernel_gate.py).

The real on-hardware comparison runs on TPU (bench.py / Separator
construction / scripts/verify_pallas_parity.py); these tests pin the gate
*logic* on CPU: divergence detection, the process-wide kernel veto with its
loud warning, pass-through on agreement, env hygiene, and the skip knobs.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_to_sheet_music_tpu.models import htdemucs
from audio_to_sheet_music_tpu.ops import kernel_gate


@pytest.fixture(autouse=True)
def _reset_gate_state(monkeypatch):
    """Each test starts with no cached gate result and no kernel veto."""
    monkeypatch.setattr(kernel_gate, "_RESULT", None)
    monkeypatch.setattr(htdemucs, "_PALLAS_LAYER_VETO", None)
    monkeypatch.setattr(htdemucs, "_PALLAS_ENC_VETO", None)
    monkeypatch.delenv("ATSM_SKIP_PARITY_GATE", raising=False)
    monkeypatch.delenv("ATSM_PALLAS_LAYER", raising=False)
    monkeypatch.delenv("ATSM_PALLAS_ENC", raising=False)
    yield
    htdemucs._PALLAS_LAYER_VETO = None
    htdemucs._PALLAS_ENC_VETO = None


def _env_dependent_forward(x):
    """Mimics the production trace-time env read: the 'kernel' variant
    (ATSM_PALLAS_LAYER=1) diverges from the per-op one by 1e-2."""
    if os.environ.get("ATSM_PALLAS_LAYER") == "1":
        return x + 1e-2
    return x


def _agreeing_forward(x):
    return x * 2.0


ARGS = (jnp.ones((4, 128), jnp.float32),)


def test_divergence_vetoes_kernel_with_warning(monkeypatch):
    with pytest.warns(RuntimeWarning, match="falling back to the per-op"):
        res = kernel_gate.ensure_layer_parity(
            None, forward=_env_dependent_forward, args=ARGS)
    assert res is not None and not res["ok"]
    assert res["rms"] == pytest.approx(1e-2, rel=1e-3)
    assert htdemucs.pallas_layer_vetoed()
    # The veto overrides even an explicit force-on — checked under a faked
    # TPU backend (on the real CPU test backend the kernel is off anyway).
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("ATSM_PALLAS_LAYER", "1")
    p = htdemucs._transformer_layer_init(jax.random.PRNGKey(0), 128,
                                         cross=False, ff=256)
    assert not htdemucs._use_pallas_layer(p)
    # ... and without the veto the same config would engage the kernel.
    monkeypatch.setattr(htdemucs, "_PALLAS_LAYER_VETO", None)
    assert htdemucs._use_pallas_layer(p)
    # The gate vetoes BOTH default-on kernels: the encoder kernel too.
    assert htdemucs.pallas_enc_vetoed()
    assert not htdemucs._use_pallas_enc()
    monkeypatch.setattr(htdemucs, "_PALLAS_ENC_VETO", None)
    assert htdemucs._use_pallas_enc()    # faked-TPU backend + no veto


def test_agreement_passes_and_keeps_kernel():
    res = kernel_gate.ensure_layer_parity(
        None, forward=_agreeing_forward, args=ARGS)
    assert res is not None and res["ok"] and res["rms"] == 0.0
    assert not htdemucs.pallas_layer_vetoed()
    assert not htdemucs.pallas_enc_vetoed()


def test_verify_toggles_enc_flag_too():
    """The gate's 'kernel' pass must engage the encoder kernel as well —
    both env flags are toggled together (one gate covers every default-on
    kernel)."""
    def fwd(x):
        if os.environ.get("ATSM_PALLAS_ENC") == "1":
            return x + 5e-2
        return x

    res = kernel_gate.verify_layer_parity(None, forward=fwd, args=ARGS)
    assert not res["ok"]
    assert res["rms"] == pytest.approx(5e-2, rel=1e-3)


def test_gate_runs_once_per_process():
    first = kernel_gate.ensure_layer_parity(
        None, forward=_agreeing_forward, args=ARGS)
    # Second call returns the cached result without re-running (a divergent
    # forward would flip ok if it executed).
    second = kernel_gate.ensure_layer_parity(
        None, forward=_env_dependent_forward, args=ARGS)
    assert second is first


def test_skip_env_disables_gate():
    os.environ["ATSM_SKIP_PARITY_GATE"] = "1"
    res = kernel_gate.ensure_layer_parity(
        None, forward=_env_dependent_forward, args=ARGS)
    assert res is None
    assert not htdemucs.pallas_layer_vetoed()


def test_env_value_restored_after_verify():
    os.environ["ATSM_PALLAS_LAYER"] = "1"
    try:
        kernel_gate.verify_layer_parity(None, forward=_agreeing_forward,
                                        args=ARGS)
        assert os.environ["ATSM_PALLAS_LAYER"] == "1"
    finally:
        del os.environ["ATSM_PALLAS_LAYER"]
    kernel_gate.verify_layer_parity(None, forward=_agreeing_forward,
                                    args=ARGS)
    assert "ATSM_PALLAS_LAYER" not in os.environ


def test_cpu_default_pair_skips():
    """On the CPU test backend with the real forward, the kernel never
    engages, so the gate must no-op rather than pay two full compiles."""
    res = kernel_gate.ensure_layer_parity({"htdemucs": {}})
    assert res is None


def test_tiny_tower_skips():
    """Tiny towers (dim 64 < lane 128) cannot run the kernel — no gate."""
    from audio_to_sheet_music_tpu.models import atht

    params = atht.init_tiny(jax.random.PRNGKey(0))
    res = kernel_gate.ensure_layer_parity(params)
    assert res is None


def test_rms_matches_numpy():
    res = kernel_gate.verify_layer_parity(
        None, forward=_env_dependent_forward, args=ARGS)
    ref = np.asarray(ARGS[0])
    ker = ref + 1e-2
    expect = float(np.sqrt(np.mean((ref - ker) ** 2)))
    assert res["rms"] == pytest.approx(expect, rel=1e-5)
    assert res["qt"] >= 8 and res["backend"] == "cpu"
