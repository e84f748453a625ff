"""Marginal (fused) cost per pipeline stage via cumulative-prefix timing.

    python scripts/profile_marginal.py [--chunks 12] [--dtype bfloat16]

Times a ladder of jitted programs that each run one more stage of the
forward; successive differences are the *fused marginal cost* of a stage —
unlike per-stage programs (scripts/profile_encode.py), the ~65 ms dispatch
floor and the stage-boundary HBM round-trip cancel in the difference.
Compiles ~10 programs, so expect a few minutes cold.
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

from audio_to_sheet_music_tpu.models import atht, htdemucs
from audio_to_sheet_music_tpu.nn import core as nn
from audio_to_sheet_music_tpu.ops import dsp
from audio_to_sheet_music_tpu.utils.profiling import timed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = atht.init(jax.random.PRNGKey(0))
    b, t = args.chunks, 264600
    rng = np.random.default_rng(0)
    wav = jnp.asarray(0.1 * rng.standard_normal((b, 2, t)), jnp.float32)
    emb = jnp.zeros((b, 512), jnp.float32)
    plan = atht.static_plan(t)

    def prefix(upto: str):
        """A program running the forward up to (and including) ``upto``."""

        def fn(params, wav, emb):
            hp = params["htdemucs"]
            z, mag, x, xt, mean, std, meant, stdt = htdemucs.normalize_inputs(
                wav.astype(jnp.float32))
            x = x.astype(dtype)
            xt = xt.astype(dtype)
            if upto == "norm":
                return x.sum() + xt.sum()
            saved, saved_t = [], []
            for idx in range(4):
                xt = htdemucs.henc_layer_apply(hp["tencoder"][idx], xt,
                                               freq=False)
                x = htdemucs.henc_layer_apply(hp["encoder"][idx], x, freq=True)
                if idx == 0:
                    frs = jnp.arange(x.shape[-2])
                    e = htdemucs.nn.embedding(hp["freq_emb"]["embedding"], frs)
                    x = x + htdemucs.FREQ_EMB_SCALE * (
                        e * htdemucs.SCALED_EMB_SCALE
                    ).T[None, :, :, None].astype(x.dtype)
                saved.append(x)
                saved_t.append(xt)
                if upto == f"enc{idx}":
                    return x.sum() + xt.sum()
            bb, c, f, tt = x.shape
            x = htdemucs.nn.conv1d(hp["channel_upsampler"],
                                   x.reshape(bb, c, f * tt)).reshape(
                bb, -1, f, tt)
            xt = htdemucs.nn.conv1d(hp["channel_upsampler_t"], xt)
            x, xt = htdemucs.crosstransformer_apply(hp["crosstransformer"],
                                                    x, xt)
            bb, c2, f, tt = x.shape
            x = htdemucs.nn.conv1d(hp["channel_downsampler"],
                                   x.reshape(bb, c2, f * tt)).reshape(
                bb, -1, f, tt)
            xt = htdemucs.nn.conv1d(hp["channel_downsampler_t"], xt)
            if upto == "xformer":
                return x.sum() + xt.sum()
            head = params["head"]
            x, xt = atht.text_cross_attention_apply(head["text_attn"], x, xt,
                                                    emb)
            if upto == "attn":
                return x.sum() + xt.sum()
            x_dec = atht.freq_decoder_apply(head["freq_decoder"], x,
                                            saved[::-1], plan["lengths"][::-1])
            x_dec = nn.conv2d(head["freq_out"], x_dec)
            x_dec = nn.interpolate_bilinear(
                x_dec, mag.shape[-2:]).astype(jnp.float32)
            if upto == "freqdec":
                return x_dec.sum() + xt.sum()
            mask = jax.nn.sigmoid(x_dec)
            mag_stereo = mag[:, :2]
            masked = mag_stereo * mask
            phase = z[:, :2] / (mag_stereo + 1e-8)
            freq_wav = dsp.ispec(masked * phase, t, htdemucs.NFFT,
                                 htdemucs.HOP)
            if upto == "ispec":
                return freq_wav.sum() + xt.sum()
            xt_dec = atht.time_decoder_apply(head["time_decoder"], xt,
                                             saved_t[::-1],
                                             plan["lengths_t"][::-1])
            xt_dec = nn.conv1d(head["time_out"], xt_dec)
            if xt_dec.shape[-1] != t:
                xt_dec = nn.interpolate_linear(xt_dec, t)
            xt_dec = xt_dec.astype(jnp.float32) * stdt + meant
            return (freq_wav + xt_dec).sum()

        return jax.jit(fn)

    stages = ["norm", "enc0", "enc1", "enc2", "enc3", "xformer", "attn",
              "freqdec", "ispec", "timedec"]
    prev = 0.0
    for s in stages:
        fn = prefix(s)
        r = timed(fn, params, wav, emb, warmup=1, iters=3)
        ms = r["best_s"] * 1e3
        print(f"  upto {s:>8}: {ms:7.1f} ms   (marginal {ms - prev:+7.1f} ms)")
        prev = ms


if __name__ == "__main__":
    main()
