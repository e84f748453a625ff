"""Fine-grained ladder inside the freq decoder (the top per-stem cost).

    python scripts/profile_freqdec_ablate.py [--chunks 12]

`profile_marginal.py` attributes ~46 ms/stem (12 chunks) to
``freqdec`` = freq_decoder_apply + 1x1 out conv + bilinear resize to
(2048, Tspec) — ~115 GFLOP, i.e. ~1.3% MFU: far off roofline for
convT matmuls with K in the hundreds.  This ladder runs prefixes of the
stage sequence so marginal differences isolate which sub-op eats the time
(convT? GroupNorm? the per-layer F->Tspec resize? skips? the final
2048-bin resize?).

NOTE: this profiles the UNFUSED op chain (the attribution that motivated
`atht._freq_layer_down4`); production defaults to the fused path, whose
cost lives in `bench_head_loop.py`.  Shapes here match production: the
freq axis re-targets to Tspec after every layer (the reference records
time lengths and applies them to F, `ATHTDemucs_v2.py:91-94,198`).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from audio_to_sheet_music_tpu.models import atht
from audio_to_sheet_music_tpu.nn import core as nn
from audio_to_sheet_music_tpu.utils.profiling import (flops_estimate,
                                                      peak_tflops, timed)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=12)
    args = ap.parse_args()
    dtype = jnp.bfloat16

    params = atht.init(jax.random.PRNGKey(0))
    head = params["head"]
    b, tspec = args.chunks, 336
    rng = np.random.default_rng(0)
    # bottleneck features + the four encoder skips, shapes per the 2048-bin
    # stride-4 ladder at 6 s
    x = jnp.asarray(rng.standard_normal((b, 384, 8, tspec)), jnp.float32
                    ).astype(dtype)
    chans = [48, 96, 192, 384]
    fs = [512, 128, 32, 8]
    saved = [jnp.asarray(rng.standard_normal((b, c, f, tspec)),
                         jnp.float32).astype(dtype)
             for c, f in zip(chans, fs)]
    skips = saved[::-1]                      # deepest first
    # production F targets: the reference records the TIME lengths and
    # resizes the freq axis to them after EVERY layer
    # (`ATHTDemucs_v2.py:91-94,198`), i.e. F -> tspec each layer — the exact
    # quirk the fused `_freq_layer_down4` exploits.  Profile THAT program,
    # not a hypothetical 32->128->512->2048 ladder.
    lengths = [tspec] * 4

    def ladder(upto: str, skip_mode: str = "on", norm_mode: str = "on"):
        def fn(head, x, skips):
            h = x
            for i, layer in enumerate(head["freq_decoder"]["layers"]):
                h = nn.conv_transpose2d(layer["conv"], h, stride=(4, 1),
                                        padding=(2, 0))
                if upto == f"convT{i}":
                    return h.sum()
                if "norm" in layer and norm_mode == "on":
                    h = nn.gelu(nn.group_norm(layer["norm"], h, 1))
                if upto == f"norm{i}":
                    return h.sum()
                if h.shape[2] != lengths[i]:
                    h = nn.interpolate_bilinear(h, (lengths[i], h.shape[3]))
                if upto == f"resize{i}":
                    return h.sum()
                if i < len(skips) and skip_mode == "on":
                    sk = skips[i][:, : h.shape[1]]
                    sk = nn.interpolate_bilinear(sk, h.shape[2:])
                    h = h + sk.astype(h.dtype) * atht.SKIP_SCALE
                if upto == f"skip{i}":
                    return h.sum()
            h = nn.conv2d(head["freq_out"], h)
            if upto == "out":
                return h.sum()
            h = nn.interpolate_bilinear(h, (2048, tspec)).astype(jnp.float32)
            return h.sum()

        return fn

    peak = peak_tflops()
    stages = []
    for i in range(4):
        stages += [f"convT{i}", f"norm{i}", f"resize{i}", f"skip{i}"]
    stages += ["out", "resize"]
    prev = 0.0
    print(f"freq decoder ladder (B={b}, bf16), marginal = diff to prev row")
    for s in stages:
        fn = ladder(s)
        r = timed(fn, head, x, skips, warmup=1, iters=3)
        ms = r["best_s"] * 1e3
        fl = flops_estimate(fn, head, x, skips)
        print(f"  upto {s:>7}: {ms:7.1f} ms (marginal {ms - prev:+7.1f} ms)  "
              f"{fl/1e9:7.1f} GFLOP", flush=True)
        prev = ms

    # variants of the full stack
    for label, kw in [("full, no skips", {"skip_mode": "off"}),
                      ("full, no norms", {"norm_mode": "off"})]:
        fn = ladder("resize", **kw)
        r = timed(fn, head, x, skips, warmup=1, iters=3)
        print(f"  {label:>14}: {r['best_s']*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
