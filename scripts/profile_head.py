"""Sub-stage timing of the text-conditioned head on the current device.

    python scripts/profile_head.py [--chunks 12] [--dtype bfloat16]

Times (compile excluded) each head stage as its own jitted program:
text cross-attention, freq decoder (+1x1 out +resize), the mask/phase/iSTFT
composition, the time decoder (+out +resize +denorm), and isolated
`ispec`/`interpolate_bilinear` micro-stages.  Per-program numbers include the
~65 ms dispatch floor and one HBM round-trip of the stage boundary, so treat
them as upper bounds / ratios against the fused `head (1 stem)` total from
scripts/profile_encode.py.
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
    head = params["head"]
    b, t = args.chunks, 264600
    rng = np.random.default_rng(0)
    wav = jnp.asarray(0.1 * rng.standard_normal((b, 2, t)), jnp.float32)
    emb = jnp.zeros((b, 512), jnp.float32)

    enc, plan = atht.encode_mixture_jit(params, wav, dtype)
    encs = {**enc, **plan}
    fq, t_spec = encs["mag"].shape[-2:]

    def run(name, fn, *fnargs):
        f = jax.jit(fn)
        r = timed(f, *fnargs, warmup=1, iters=3)
        print(f"  {name:>28}: {r['best_s']*1e3:7.1f} ms")
        return jax.block_until_ready(f(*fnargs))

    x_cond, xt_cond = run(
        "text_attn (both branches)",
        lambda h, x, xt, e: atht.text_cross_attention_apply(
            h["text_attn"], x, xt, e),
        head, encs["x_enc"], encs["xt_enc"], emb)

    x_dec = run(
        "freq_decoder+out+resize",
        lambda h, x, sk: nn.interpolate_bilinear(
            nn.conv2d(h["freq_out"], atht.freq_decoder_apply(
                h["freq_decoder"], x, sk[::-1], plan["lengths"][::-1])),
            (fq, t_spec)).astype(jnp.float32),
        head, x_cond, encs["saved"])

    def mask_ispec(x_dec, mag, z):
        mask = jax.nn.sigmoid(x_dec)
        mag_stereo = mag[:, :2]
        masked = mag_stereo * mask
        z_stereo = z[:, :2]
        phase = z_stereo / (mag_stereo + 1e-8)
        return dsp.ispec(masked * phase, t, htdemucs.NFFT, htdemucs.HOP)

    run("mask+phase+ispec", mask_ispec, x_dec, encs["mag"], encs["z"])

    run("ispec alone",
        lambda z: dsp.ispec(z[:, :2], t, htdemucs.NFFT, htdemucs.HOP),
        encs["z"])

    run(f"resize {t_spec}->{fq} alone",
        lambda x: nn.interpolate_bilinear(x, (fq, t_spec)),
        jnp.zeros((b, 2, t_spec, t_spec), jnp.float32))

    run("time_decoder+out+resize",
        lambda h, xt, sk, st, me: (nn.interpolate_linear(
            nn.conv1d(h["time_out"], atht.time_decoder_apply(
                h["time_decoder"], xt, sk[::-1], plan["lengths_t"][::-1])),
            t).astype(jnp.float32) * st + me),
        head, xt_cond, encs["saved_t"], encs["stdt"], encs["meant"])

    run("full head", lambda p, e, em: atht.apply_head(p, {**e, **plan}, em),
        params, enc, emb)


if __name__ == "__main__":
    main()
