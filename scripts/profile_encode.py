"""Sub-stage timing of the frozen encoder replay on the current device.

    python scripts/profile_encode.py [--chunks 12] [--dtype bfloat16]

Times (compile excluded) each encoder stage as its own jitted program:
DSP normalisation, the 4 frequency HEncLayers, the 4 time HEncLayers, the
cross-domain transformer, and the head's big blocks (decoders, iSTFT).
Per-program numbers include one HBM round-trip of the stage boundary that
the fused program doesn't pay, so treat them as upper bounds / ratios.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from audio_to_sheet_music_tpu.models import atht, htdemucs
from audio_to_sheet_music_tpu.utils.profiling import timed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = atht.init(jax.random.PRNGKey(0))
    hp = params["htdemucs"]
    b, t = args.chunks, 264600
    rng = np.random.default_rng(0)
    wav = jnp.asarray(0.1 * rng.standard_normal((b, 2, t)), jnp.float32)

    @jax.jit
    def norm(wav):
        z, mag, x, xt, *_ = htdemucs.normalize_inputs(wav)
        return x.astype(dtype), xt.astype(dtype)

    x0, xt0 = norm(wav)
    x0, xt0 = jax.block_until_ready((x0, xt0))

    # per-layer freq/time encoder programs
    freq_ins, time_ins = [x0], [xt0]
    for idx in range(4):
        fe = jax.jit(lambda p, x, i=idx: htdemucs.henc_layer_apply(
            p["encoder"][i], x, freq=True))
        te = jax.jit(lambda p, x, i=idx: htdemucs.henc_layer_apply(
            p["tencoder"][i], x, freq=False))
        xn = fe(hp, freq_ins[-1])
        if idx == 0:
            frs = jnp.arange(xn.shape[-2])
            emb = htdemucs.nn.embedding(hp["freq_emb"]["embedding"], frs)
            xn = xn + htdemucs.FREQ_EMB_SCALE * (
                emb * htdemucs.SCALED_EMB_SCALE).T[None, :, :, None].astype(xn.dtype)
        freq_ins.append(jax.block_until_ready(xn))
        time_ins.append(jax.block_until_ready(te(hp, time_ins[-1])))
        rf = timed(fe, hp, freq_ins[idx], warmup=1, iters=3)
        rt = timed(te, hp, time_ins[idx], warmup=1, iters=3)
        print(f"  henc_freq[{idx}]: {rf['best_s']*1e3:7.1f} ms   "
              f"henc_time[{idx}]: {rt['best_s']*1e3:7.1f} ms")

    @jax.jit
    def bottleneck(p, x, xt):
        b_, c, f, tt = x.shape
        x = htdemucs.nn.conv1d(p["channel_upsampler"],
                               x.reshape(b_, c, f * tt)).reshape(b_, -1, f, tt)
        xt = htdemucs.nn.conv1d(p["channel_upsampler_t"], xt)
        x, xt = htdemucs.crosstransformer_apply(p["crosstransformer"], x, xt)
        b_, c2, f, tt = x.shape
        x = htdemucs.nn.conv1d(p["channel_downsampler"],
                               x.reshape(b_, c2, f * tt)).reshape(b_, -1, f, tt)
        xt = htdemucs.nn.conv1d(p["channel_downsampler_t"], xt)
        return x, xt

    r = timed(bottleneck, hp, freq_ins[-1], time_ins[-1], warmup=1, iters=3)
    print(f"  crosstransformer+samplers: {r['best_s']*1e3:7.1f} ms")

    @jax.jit
    def encode_full(p, wav):
        enc = atht.encode_mixture(p, wav, dtype)
        return enc["x_enc"], enc["xt_enc"]

    r = timed(encode_full, params, wav, warmup=1, iters=3)
    print(f"  fused encode total: {r['best_s']*1e3:7.1f} ms")

    enc, plan = atht.encode_mixture_jit(params, wav, dtype)
    emb = jnp.zeros((b, 512), jnp.float32)

    @jax.jit
    def head(p, enc, e):
        return atht.apply_head(p, {**enc, **plan}, e)

    r = timed(head, params, enc, emb, warmup=1, iters=3)
    print(f"  head (1 stem): {r['best_s']*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
