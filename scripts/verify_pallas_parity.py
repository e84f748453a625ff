"""On-hardware parity check for the fused Pallas layer kernel.

Runs ONE full flagship forward (6 s chunk, bf16 towers) twice on the live
backend — per-op XLA path vs fused ``layer_tail`` kernel — at the active
``ATSM_PALLAS_QT``, and prints a JSON verdict.  Exit code 1 on divergence.

Usage (on the TPU host):
    python scripts/verify_pallas_parity.py            # default QT
    ATSM_PALLAS_QT=256 python scripts/verify_pallas_parity.py

This is the manual form of the gate that ``infer.Separator`` / ``bench.py``
run automatically (ops/kernel_gate.py).  Use it after jax/Mosaic upgrades
or before committing a new QT default.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main() -> int:
    from audio_to_sheet_music_tpu.models import atht
    from audio_to_sheet_music_tpu.ops import kernel_gate

    backend = jax.default_backend()
    if backend == "cpu":
        print(json.dumps({"ok": None, "skipped": "cpu backend — the fused "
                          "layer kernel never engages on CPU"}))
        return 0

    params = atht.init(jax.random.PRNGKey(0))
    res = kernel_gate.verify_layer_parity(params)
    print(json.dumps(res))
    return 0 if res["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
