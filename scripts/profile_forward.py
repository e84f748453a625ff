"""Stage-level timing breakdown of the separation path on the current device.

    python scripts/profile_forward.py [--chunks 16] [--dtype bfloat16]

Times (compile excluded): DSP front-end, frozen encoder, one head, the fused
4-stem chunk forward, and the OLA reconstruction; prints seconds and the
derived audio-sec/sec for a 6 s x N-chunk batch.
"""

from __future__ import annotations

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from pathlib import Path as _P
jax.config.update("jax_compilation_cache_dir",
                  str(_P(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from audio_to_sheet_music_tpu.models import atht, htdemucs
from audio_to_sheet_music_tpu.utils.profiling import (flops_estimate,
                                                      peak_tflops, timed)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = atht.init(jax.random.PRNGKey(0))
    b, t = args.chunks, 264600
    wav = jnp.asarray(0.1 * np.random.default_rng(0).standard_normal((b, 2, t)),
                      jnp.float32)
    emb = jnp.zeros((b, 512), jnp.float32)
    embs4 = jnp.zeros((4, 512), jnp.float32)

    @jax.jit
    def dsp_only(wav):
        z, mag, x, xt, *_ = htdemucs.normalize_inputs(wav)
        return mag, x, xt

    @functools.partial(jax.jit, static_argnames=())
    def encode_only(params, wav):
        enc = atht.encode_mixture(params, wav, dtype)
        return enc["x_enc"], enc["xt_enc"]

    @jax.jit
    def one_stem(params, wav, emb):
        return atht.forward_with_text_emb(params, wav, emb, dtype)

    @jax.jit
    def four_stem(params, wav, embs):
        enc = atht.encode_mixture(params, wav, dtype)
        return atht.apply_head_multi(params, enc, embs)

    audio_sec = b * 6.0
    peak = peak_tflops()
    print(f"MFU denominator: {peak:.0f} TFLOP/s "
          f"(override with ATSM_PEAK_TFLOPS)")
    for name, fn, fnargs in [
        ("dsp_frontend", dsp_only, (wav,)),
        ("encode", encode_only, (params, wav)),
        ("forward_1stem", one_stem, (params, wav, emb)),
        ("forward_4stem", four_stem, (params, wav, embs4)),
    ]:
        r = timed(fn, *fnargs, warmup=1, iters=3)
        rate = audio_sec / r["best_s"]
        mult = 4 if name.endswith("4stem") else 1
        fl = flops_estimate(fn, *fnargs)
        tfs = fl / r["best_s"] / 1e12 if fl > 0 else float("nan")
        mfu = 100.0 * tfs / peak
        print(f"{name:>16}: {r['best_s']*1e3:8.1f} ms  "
              f"({rate * mult:7.1f} stem-audio-sec/s)  "
              f"{fl/1e9:8.1f} GFLOP  {tfs:6.2f} TFLOP/s  {mfu:5.2f}% peak")

    # STFT path comparison: XLA matmul-DFT (default) vs the fused Pallas
    # kernel (ops.pallas_stft, opt-in ATSM_PALLAS_STFT=1).  Measures the
    # standalone spec() op — the kernel's claim is avoiding the framed-signal
    # HBM materialisation, so the delta here is its documented payoff.
    import os

    from audio_to_sheet_music_tpu.ops import dsp, pallas_stft

    if jax.default_backend() != "cpu" and pallas_stft.supports(
            htdemucs.NFFT, htdemucs.HOP):
        spec_fn = jax.jit(lambda w: dsp.spec(w, htdemucs.NFFT, htdemucs.HOP).real)
        os.environ["ATSM_PALLAS_STFT"] = "0"
        r_xla = timed(spec_fn, wav, warmup=1, iters=3)
        os.environ["ATSM_PALLAS_STFT"] = "1"
        spec_pl = jax.jit(
            lambda w: dsp.spec(w, htdemucs.NFFT, htdemucs.HOP).real)
        r_pl = timed(spec_pl, wav, warmup=1, iters=3)
        del os.environ["ATSM_PALLAS_STFT"]
        print(f"{'stft_xla':>16}: {r_xla['best_s']*1e3:8.1f} ms")
        print(f"{'stft_pallas':>16}: {r_pl['best_s']*1e3:8.1f} ms  "
              f"({r_xla['best_s'] / r_pl['best_s']:.2f}x vs XLA)")


if __name__ == "__main__":
    main()
