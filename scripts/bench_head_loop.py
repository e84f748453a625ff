"""Floor-free attribution inside the per-stem head (loop-in-graph).

    python scripts/bench_head_loop.py [--chunks 12] [--loop 10]

Times each head piece as N chained evaluations inside one XLA program
(per-dispatch floors cancel; see bench_forward_loop.py).  Pieces:

- freqdec            : freq_decoder_apply + 1x1 out conv + final resize
- freqdec_noskip     : same without the interpolated encoder skips
- freqdec_nonorm     : same without GroupNorm+GELU
- timedec            : time_decoder_apply + out conv + resize + denorm
- timedec_noskip     : same without skips
- ispec              : mask/phase multiply + iSTFT
- attn               : text cross-attention (both branches)
"""

from __future__ import annotations

import argparse
import sys
import time
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
from audio_to_sheet_music_tpu.utils.profiling import loop_cost


def freq_dec(head, x, skips, lengths, use_skip=True, use_norm=True):
    for i, layer in enumerate(head["freq_decoder"]["layers"]):
        x = nn.conv_transpose2d(layer["conv"], x, stride=(4, 1),
                                padding=(2, 0))
        if "norm" in layer and use_norm:
            x = nn.gelu(nn.group_norm(layer["norm"], x, 1))
        if i < len(lengths) and x.shape[2] != lengths[i]:
            x = nn.interpolate_bilinear(x, (lengths[i], x.shape[3]))
        if i < len(skips) and use_skip:
            sk = skips[i][:, : x.shape[1]]
            sk = nn.interpolate_bilinear(sk, x.shape[2:])
            x = x + sk.astype(x.dtype) * atht.SKIP_SCALE
    return nn.conv2d(head["freq_out"], x)


def convT2d_mm(p, x, stride=(4, 1), padding=(2, 0)):
    """Sub-pixel ConvTranspose2d((K,1), s=(4,1)) as ONE pointwise matmul:
    both taps concatenated on the channel dim, all 4 phases on the output
    dim -> (2I -> 4O) 1x1 contraction, then phase interleave."""
    from audio_to_sheet_music_tpu.nn.core import _subpixel_kernel_1d

    w = p["weight"].astype(x.dtype)          # (I, O, 8, 1)
    i_ch, o_ch, kh, _ = w.shape
    sh = stride[0]
    bank = _subpixel_kernel_1d(w[..., 0], sh)          # (O*s, I, taps=2)
    wmat = jnp.concatenate([bank[:, :, 0], bank[:, :, 1]], axis=1)  # (4O, 2I)
    b, _, f, wd = x.shape
    zrow = jnp.zeros((b, i_ch, 1, wd), x.dtype)
    xm1 = jnp.concatenate([zrow, x], axis=2)            # row a -> x[a-1]
    x0 = jnp.concatenate([x, zrow], axis=2)             # row a -> x[a]
    x_cat = jnp.concatenate([xm1, x0], axis=1)          # (B, 2I, F+1, W)
    y = jax.lax.conv_general_dilated(
        x_cat, wmat[:, :, None, None], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))     # (B, 4O, F+1, W)
    a_len = f + 1
    z = y.reshape(b, o_ch, sh, a_len, wd).transpose(0, 1, 3, 2, 4)
    z = z.reshape(b, o_ch, sh * a_len, wd)
    out_h = (f - 1) * sh - 2 * padding[0] + kh
    z = z[:, :, padding[0] : padding[0] + out_h, :]
    if "bias" in p:
        z = z + p["bias"].astype(x.dtype)[None, :, None, None]
    return z


def freq_dec_mm(head, x, skips, lengths):
    for i, layer in enumerate(head["freq_decoder"]["layers"]):
        x = convT2d_mm(layer["conv"], x)
        if "norm" in layer:
            x = nn.gelu(nn.group_norm(layer["norm"], x, 1))
        if i < len(lengths) and x.shape[2] != lengths[i]:
            x = nn.interpolate_bilinear(x, (lengths[i], x.shape[3]))
        if i < len(skips):
            sk = skips[i][:, : x.shape[1]]
            sk = nn.interpolate_bilinear(sk, x.shape[2:])
            x = x + sk.astype(x.dtype) * atht.SKIP_SCALE
    return nn.conv2d(head["freq_out"], x)


def time_dec(head, xt, skips, lengths, t, use_skip=True):
    for i, layer in enumerate(head["time_decoder"]["layers"]):
        xt = nn.conv_transpose1d(layer["conv"], xt, stride=4, padding=2)
        if "norm" in layer:
            xt = nn.gelu(nn.group_norm(layer["norm"], xt, 1))
        if i < len(lengths) and xt.shape[2] != lengths[i]:
            xt = nn.interpolate_linear(xt, lengths[i])
        if i < len(skips) and use_skip:
            sk = skips[i][:, : xt.shape[1]]
            sk = nn.interpolate_linear(sk, xt.shape[2])
            xt = xt + sk.astype(xt.dtype) * atht.SKIP_SCALE
    xt = nn.conv1d(head["time_out"], xt)
    if xt.shape[-1] != t:
        xt = nn.interpolate_linear(xt, t)
    return xt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--loop", type=int, default=10)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    dtype = jnp.bfloat16
    b, t = args.chunks, 264600
    n = args.loop

    params = atht.init(jax.random.PRNGKey(0))
    head = params["head"]
    rng = np.random.default_rng(0)
    plan = atht.static_plan(t)
    lengths = plan["lengths"][::-1]
    lengths_t = plan["lengths_t"][::-1]
    chans, fs = [48, 96, 192, 384], [512, 128, 32, 8]
    x = jnp.asarray(rng.standard_normal((b, 384, 8, 336)),
                    jnp.float32).astype(dtype)
    xt = jnp.asarray(rng.standard_normal((b, 384, 1034)),
                     jnp.float32).astype(dtype)
    skips = [jnp.asarray(rng.standard_normal((b, c, f, 336)),
                         jnp.float32).astype(dtype)
             for c, f in zip(chans, fs)][::-1]
    skips_t = [jnp.asarray(rng.standard_normal((b, c, lt)),
                           jnp.float32).astype(dtype)
               for c, lt in zip(chans, [66150, 16538, 4135, 1034])][::-1]
    zr = jnp.asarray(rng.standard_normal((b, 2, 2048, 336)), jnp.float32)
    zi = jnp.asarray(rng.standard_normal((b, 2, 2048, 336)), jnp.float32)
    mag = jnp.sqrt(zr ** 2 + zi ** 2)
    emb = jnp.zeros((b, 512), jnp.float32)

    env = {"x": x, "xt": xt, "skips": skips, "skips_t": skips_t,
           "zr": zr, "zi": zi, "mag": mag, "emb": emb}

    cases = [
        ("freqdec", lambda h, e, s: jnp.sum(nn.interpolate_bilinear(
            freq_dec(h, e["x"] + s.astype(dtype) * 1e-30, e["skips"],
                     lengths), (2048, 336)).astype(jnp.float32))),
        ("freqdec_noskip", lambda h, e, s: jnp.sum(nn.interpolate_bilinear(
            freq_dec(h, e["x"] + s.astype(dtype) * 1e-30, e["skips"],
                     lengths, use_skip=False),
            (2048, 336)).astype(jnp.float32))),
        ("freqdec_nonorm", lambda h, e, s: jnp.sum(nn.interpolate_bilinear(
            freq_dec(h, e["x"] + s.astype(dtype) * 1e-30, e["skips"],
                     lengths, use_norm=False),
            (2048, 336)).astype(jnp.float32))),
        ("freqdec_mm", lambda h, e, s: jnp.sum(nn.interpolate_bilinear(
            freq_dec_mm(h, e["x"] + s.astype(dtype) * 1e-30, e["skips"],
                        lengths), (2048, 336)).astype(jnp.float32))),
        ("timedec", lambda h, e, s: jnp.sum(time_dec(
            h, e["xt"] + s.astype(dtype) * 1e-30, e["skips_t"], lengths_t, t
        ).astype(jnp.float32))),
        ("timedec_noskip", lambda h, e, s: jnp.sum(time_dec(
            h, e["xt"] + s.astype(dtype) * 1e-30, e["skips_t"], lengths_t, t,
            use_skip=False).astype(jnp.float32))),
        ("ispec", lambda h, e, s: jnp.sum(dsp.ispec(
            (e["mag"][:, :2] + s * 1e-30)
            * (jax.lax.complex(e["zr"], e["zi"])[:, :2]
               / (e["mag"][:, :2] + 1e-8)), t,
            htdemucs.NFFT, htdemucs.HOP))),
        ("attn", lambda h, e, s: jnp.sum(atht.text_cross_attention_apply(
            h["text_attn"], e["x"] + s.astype(dtype) * 1e-30,
            e["xt"].astype(dtype), e["emb"])[0].astype(jnp.float32))),
    ]
    print(f"(slope 4->{4 + n}, chunks={b}) per-eval ms:")
    for name, body in cases:
        per = loop_cost(lambda s, h, e, _b=body: _b(h, e, s), head, env,
                        n1=4, n2=4 + n, iters=args.iters)
        print(f"  {name:>15}: {per * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
