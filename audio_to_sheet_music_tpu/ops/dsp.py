"""DSP core: framing, STFT/iSTFT, CaC packing, overlap-add.

This is the TPU-native equivalent of the reference's signal path, which lives
in the ``demucs`` pip dependency (called at `ATHTDemucs_v2.py:261-310`):

- ``spec``       — demucs ``HTDemucs._spec``: reflect pre-pad so the frame
  count is exactly ``ceil(T/hop)``, STFT (n_fft 4096, hop 1024, periodic Hann,
  ``normalized=True``, ``center=True``), drop the Nyquist bin (2049->2048) and
  the 2 leading/2 trailing frames.
- ``ispec``      — demucs ``HTDemucs._ispec``: restore Nyquist bin + edge
  frames, iSTFT, crop back to ``length`` samples.
- ``magnitude_cac`` / ``mask_cac`` — complex-as-channels packing used by the
  CaC HTDemucs variant (``_magnitude`` / ``_mask``).

Everything is shaped statically and built from reshapes/slices + ``rfft`` so
XLA can fuse and tile it; no gathers in the hot path.  Framing exploits
``n_fft % hop == 0``: the padded signal is viewed as ``(n_chunks, hop)`` and a
frame is ``ratio`` consecutive chunks, so both ``frame`` and ``overlap_add``
are pure reshape/slice/sum programs.

Parity: ``stft``/``istft`` match ``torch.stft``/``torch.istft`` with
``center=True, normalized=True, pad_mode='reflect'`` (tested in
``tests/test_dsp.py``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# MXU matmul FFT (four-step Cooley-Tukey)
#
# XLA's native FFT on TPU is latency-bound for the batched medium-size
# transforms this framework does (thousands of 4096-point rFFTs per sweep).
# Factoring N = N1*N2 turns the DFT into two (N1, N2)-sized matmuls plus an
# elementwise twiddle — exactly the MXU's shape.  Derivation (n = N1*n2 + n1,
# k = N2*k1 + k2):
#
#   X[N2*k1 + k2] = sum_n1 W_N1^{n1 k1} * T[n1,k2] * sum_n2 A[n1,n2] W_N2^{n2 k2}
#   with A[n1,n2] = x[N1*n2 + n1],  T[n1,k2] = W_N^{n1 k2}.
#
# Enabled automatically on TPU backends; CPU keeps jnp.fft (exact parity
# with torch).  Accuracy: f32 accumulate, ~1e-4 relative for N=4096
# (tested in tests/test_dsp.py).
# ---------------------------------------------------------------------------

_MATMUL_FFT: bool | None = None   # None = auto (TPU yes, CPU no)


def use_matmul_fft() -> bool:
    if _MATMUL_FFT is not None:
        return _MATMUL_FFT
    # TPU-class backends only ('axon' is the tunneled TPU plugin): CPU and
    # GPU keep their exact native FFTs (pocketfft / cuFFT) — the matmul-DFT
    # exists because TPUs have no FFT unit, not as a general replacement.
    return jax.default_backend() in ("tpu", "axon")


def _use_pallas_stft(n_fft: int, hop: int) -> bool:
    """Fused Pallas STFT kernel (ops.pallas_stft), opt-in via
    ``ATSM_PALLAS_STFT=1``.

    On the current v5e it matches the XLA matmul-DFT path bit-for-bit at
    HIGHEST precision and runs at the same speed (both are dispatch-floor
    bound at sweep sizes), so XLA stays the default; the kernel removes the
    framed-signal HBM materialisation and wins when frame counts grow.
    """
    import os

    if os.environ.get("ATSM_PALLAS_STFT") != "1":
        return False
    if jax.default_backend() in ("cpu",):
        return False
    from . import pallas_stft

    return pallas_stft.supports(n_fft, hop)


def _fft_factors(n: int) -> tuple[int, int]:
    n1 = 1 << (int(math.log2(n)) // 2)
    while n % n1:
        n1 >>= 1
    return n1, n // n1


@functools.lru_cache(maxsize=8)
def _dft_consts(n: int, inverse: bool):
    n1, n2 = _fft_factors(n)
    sign = 2j if inverse else -2j
    w1 = np.exp(sign * np.pi / n1 * np.outer(np.arange(n1), np.arange(n1)))
    w2 = np.exp(sign * np.pi / n2 * np.outer(np.arange(n2), np.arange(n2)))
    tw = np.exp(sign * np.pi / n * np.outer(np.arange(n1), np.arange(n2)))
    c64 = np.complex64
    return (n1, n2, w1.astype(c64), w2.astype(c64), tw.astype(c64))


def _dft_precision():
    """DFT matmul algorithm — true f32 (HIGHEST) by default.

    Measured on v5e (`ATSM_DFT_ALG` overrides; spec->ispec roundtrip on
    0.3-rms noise): the TPU default single bf16 pass errs ~1e-1 absolute;
    ``BF16_BF16_F32_X3`` errs 5e-1 — its per-dot error is relative to
    sum(|terms|), and the DFT's massive cancellation amplifies that across
    the 4 cascaded stages.  Audio needs the exact-f32 path.
    """
    import os

    alg = os.environ.get("ATSM_DFT_ALG")
    if alg:
        presets = getattr(jax.lax, "DotAlgorithmPreset", None)
        if presets is None:
            raise RuntimeError(
                "ATSM_DFT_ALG needs jax.lax.DotAlgorithmPreset (jax >= "
                "0.4.37); unset it or upgrade jax")
        try:
            return getattr(presets, alg)
        except AttributeError:
            valid = [n for n in dir(presets) if not n.startswith("_")]
            raise RuntimeError(
                f"ATSM_DFT_ALG={alg!r} is not a DotAlgorithmPreset; "
                f"valid: {valid}") from None
    return jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, preferred_element_type=jnp.float32,
                      precision=_dft_precision())


def _dft_matmul(xr: jnp.ndarray, xi: jnp.ndarray | None, n: int,
                inverse: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex DFT of the last axis via two MXU matmuls + twiddle.

    Inputs/outputs are (real, imag) float32 pairs; ``xi=None`` for real input.
    """
    n1, n2, w1, w2, tw = _dft_consts(n, inverse)
    lead = xr.shape[:-1]
    # A[n1, n2] = x[N1*n2 + n1]
    ar = xr.reshape(*lead, n2, n1).swapaxes(-1, -2)
    w2r = jnp.asarray(w2.real)
    w2i = jnp.asarray(w2.imag)
    if xi is None:
        br = _mm(ar, w2r)
        bi = _mm(ar, w2i)
    else:
        ai = xi.reshape(*lead, n2, n1).swapaxes(-1, -2)
        br = _mm(ar, w2r) - _mm(ai, w2i)
        bi = _mm(ar, w2i) + _mm(ai, w2r)
    twr = jnp.asarray(tw.real)
    twi = jnp.asarray(tw.imag)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    w1r = jnp.asarray(w1.real)
    w1i = jnp.asarray(w1.imag)
    # X[k1, k2] = sum_n1 W1[n1, k1] C[n1, k2]  ->  (W1^T C)
    xr_out = _mm(w1r.T, cr) - _mm(w1i.T, ci)
    xi_out = _mm(w1r.T, ci) + _mm(w1i.T, cr)
    # row-major (k1, k2) flatten == k = N2*k1 + k2
    return xr_out.reshape(*lead, n), xi_out.reshape(*lead, n)


def rfft_matmul(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Real FFT of the last axis (length ``n``) -> complex ``n//2 + 1``."""
    xr, xi = _dft_matmul(x.astype(jnp.float32), None, n, inverse=False)
    h = n // 2 + 1
    return jax.lax.complex(xr[..., :h], xi[..., :h])


def irfft_matmul(z: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse of ``rfft_matmul``: half-spectrum -> real signal of length n."""
    h = n // 2 + 1
    zr = z.real.astype(jnp.float32)
    zi = z.imag.astype(jnp.float32)
    # conjugate symmetry: X[n-k] = conj(X[k])
    full_r = jnp.concatenate([zr, zr[..., 1 : h - 1][..., ::-1]], axis=-1)
    full_i = jnp.concatenate([zi, -zi[..., 1 : h - 1][..., ::-1]], axis=-1)
    xr, _ = _dft_matmul(full_r, full_i, n, inverse=True)
    return xr / n


def _rfft(frames: jnp.ndarray, n: int) -> jnp.ndarray:
    if use_matmul_fft():
        return rfft_matmul(frames, n)
    return jnp.fft.rfft(frames, axis=-1)


def _irfft(z: jnp.ndarray, n: int) -> jnp.ndarray:
    if use_matmul_fft():
        return irfft_matmul(z, n)
    return jnp.fft.irfft(z, n=n, axis=-1)


def hann_window(n_fft: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches ``torch.hann_window(n, periodic=True)``)."""
    i = jnp.arange(n_fft, dtype=jnp.float32)
    w = 0.5 * (1.0 - jnp.cos(2.0 * math.pi * i / n_fft))
    return w.astype(dtype)


def pad_reflect_safe(x: jnp.ndarray, pad_left: int, pad_right: int) -> jnp.ndarray:
    """Reflect-pad the last axis; zero-extend first if the signal is too
    short (reflect padding requires ``pad < T``).

    Mirrors demucs ``pad1d``'s length contract: the zero extension is split
    across the two sides (right side first, capped at ``pad_right``) and the
    reflect pads shrink by the same amounts, so the output is always exactly
    ``length + pad_left + pad_right`` samples.
    """
    length = x.shape[-1]
    max_pad = max(pad_left, pad_right)
    if length <= max_pad:
        extra = max_pad - length + 1
        extra_right = min(pad_right, extra)
        extra_left = extra - extra_right
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(extra_left, extra_right)])
        pad_left -= extra_left
        pad_right -= extra_right
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)], mode="reflect")


def frame(x: jnp.ndarray, frame_length: int, hop: int, n_frames: int) -> jnp.ndarray:
    """Slice ``x (..., T)`` into ``(..., n_frames, frame_length)`` windows.

    Fast path when ``frame_length % hop == 0`` (true for the 4096/1024
    STFT): view the signal as hop-sized chunks and concatenate ``ratio``
    shifted views — pure reshape/slice, no gather.  Other (hop, length)
    combinations (e.g. the 1024/480 mel frontend) fall back to one gather.
    """
    if frame_length % hop != 0:
        needed = (n_frames - 1) * hop + frame_length
        if x.shape[-1] < needed:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, needed - x.shape[-1])])
        idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_length)[None, :]
        return x[..., idx]
    ratio = frame_length // hop
    needed = (n_frames - 1 + ratio) * hop
    if x.shape[-1] < needed:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, needed - x.shape[-1])])
    chunks = x[..., :needed].reshape(*x.shape[:-1], n_frames - 1 + ratio, hop)
    views = [chunks[..., i : i + n_frames, :] for i in range(ratio)]
    return jnp.concatenate(views, axis=-1)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add ``frames (..., N, L)`` at stride ``hop``.

    Returns ``(..., L + (N-1)*hop)``.  Implemented as ``ratio`` shifted
    zero-padded views summed together (XLA fuses this into a few adds —
    the device-side OLA primitive used by iSTFT and by chunked full-song
    reconstruction).  When ``hop`` does not divide ``L`` (e.g. CLAPSep's
    upstream 1024/320 STFT), frames are zero-padded to the next hop
    multiple — the padding contributes nothing — and the result cropped.
    """
    *lead, n, length = frames.shape
    pad = (-length) % hop
    if pad:
        frames = jnp.pad(frames,
                         [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
    ratio = (length + pad) // hop
    pieces = frames.reshape(*lead, n, ratio, hop)
    out_chunks = n - 1 + ratio
    acc = jnp.zeros((*lead, out_chunks, hop), dtype=frames.dtype)
    for i in range(ratio):
        acc = acc.at[..., i : i + n, :].add(pieces[..., :, i, :])
    out = acc.reshape(*lead, out_chunks * hop)
    return out[..., : (n - 1) * hop + length] if pad else out


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def stft(x: jnp.ndarray, n_fft: int = 4096, hop: int = 1024,
         normalized: bool = True) -> jnp.ndarray:
    """``torch.stft`` parity: center=True, reflect pad.

    x: ``(..., T)`` real.  Returns complex64 ``(..., n_fft//2 + 1, n_frames)``
    with ``n_frames = T // hop + 1`` (exact when ``hop`` divides ``T``).
    ``normalized=True`` multiplies by ``n_fft**-0.5`` (torch convention).
    """
    length = x.shape[-1]
    n_frames = length // hop + 1
    xp = pad_reflect_safe(x.astype(jnp.float32), n_fft // 2, n_fft // 2)
    if _use_pallas_stft(n_fft, hop):
        from . import pallas_stft

        lead = xp.shape[:-1]
        flat = xp.reshape(-1, xp.shape[-1])
        z = pallas_stft.stft_pallas(flat, n_fft, hop, n_frames)
        z = z.reshape(*lead, *z.shape[1:])
    else:
        frames = frame(xp, n_fft, hop, n_frames)
        win = hann_window(n_fft)
        z = jnp.moveaxis(_rfft(frames * win, n_fft), -1, -2)
    if normalized:
        z = z * (1.0 / math.sqrt(n_fft))
    return z  # (..., F, n_frames)


@functools.lru_cache(maxsize=4)
def _istft_seg_consts(n_fft: int, hop: int):
    """Per-phase ``(n_fft//2+1, hop)`` operators folding iDFT x window x OLA.

    Output hop-segment ``m`` of the windowed overlap-add is
    ``seg[m][h] = sum_j frames[m-j][j*hop + h] * win[j*hop + h]`` — a
    LINEAR map of the ``ratio`` contributing frames' half-spectra.  Each
    phase ``j`` gets a dense real/imag matrix built in f64 (conjugate
    symmetry absorbed via the 2x factor on interior bins), so the whole
    iSTFT body becomes ``2*ratio`` MXU matmuls with NO materialised
    ``(frames, n_fft)`` tensor (that intermediate plus its window/OLA
    passes was ~16% of forward device time).
    """
    ratio = n_fft // hop
    h_bins = n_fft // 2 + 1
    k = np.arange(h_bins, dtype=np.float64)
    i = np.arange(n_fft, dtype=np.float64)
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / n_fft))    # periodic hann
    # irfft_matmul computes (1/n) * full-DFT; istft multiplies by sqrt(n)
    scale = math.sqrt(n_fft) / n_fft
    a = np.where((k == 0) | (k == n_fft // 2), 1.0, 2.0)[:, None]
    mats = []
    for j in range(ratio):
        p = j * hop + np.arange(hop, dtype=np.float64)
        ang = 2.0 * np.pi * np.outer(k, p) / n_fft
        wr = np.cos(ang) * a * win[j * hop :(j + 1) * hop] * scale
        wi = -np.sin(ang) * a * win[j * hop :(j + 1) * hop] * scale
        mats.append((wr.astype(np.float32), wi.astype(np.float32)))
    return mats


def _istft_segments(zr: jnp.ndarray, zi: jnp.ndarray, n_fft: int,
                    hop: int) -> jnp.ndarray:
    """``(..., n_frames, n_fft//2+1)`` re/im -> windowed-OLA signal
    ``(..., (n_frames + ratio - 1) * hop)`` (pre-envelope-division)."""
    ratio = n_fft // hop
    lead = zr.shape[:-2]
    n_seg = zr.shape[-2] + ratio - 1
    # pad ONCE (not per phase): segment m reads frame m - j, i.e. phase j's
    # operand is a shifted window of the same padded tensor — slices are
    # views, so this materialises 2 padded copies instead of 2*ratio
    pad = [(0, 0)] * (zr.ndim - 2) + [(ratio - 1, ratio - 1), (0, 0)]
    zr_p, zi_p = jnp.pad(zr, pad), jnp.pad(zi, pad)
    for j, (wr, wi) in enumerate(_istft_seg_consts(n_fft, hop)):
        s = ratio - 1 - j
        contrib = (_mm(zr_p[..., s : s + n_seg, :], jnp.asarray(wr))
                   + _mm(zi_p[..., s : s + n_seg, :], jnp.asarray(wi)))
        acc = contrib if j == 0 else acc + contrib
    return acc.reshape(*lead, -1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def istft(
    z: jnp.ndarray, length: int | None = None, n_fft: int = 4096, hop: int = 1024,
) -> jnp.ndarray:
    """``torch.istft`` parity: center=True, normalized=True, hann window.

    z: complex ``(..., n_fft//2 + 1, n_frames)``.  Returns ``(..., length)``.
    """
    z = jnp.moveaxis(z, -1, -2)  # (..., n_frames, F)
    n_frames = z.shape[-2]
    win = hann_window(n_fft)
    if use_matmul_fft() and n_fft % hop == 0:
        sig = _istft_segments(z.real.astype(jnp.float32),
                              z.imag.astype(jnp.float32), n_fft, hop)
    else:
        frames = _irfft(z, n_fft) * math.sqrt(n_fft)
        sig = overlap_add(frames * win, hop)
    env = overlap_add(
        jnp.broadcast_to(win * win, (n_frames, n_fft)), hop
    )
    sig = sig[..., n_fft // 2 :]
    env = env[n_fft // 2 :]
    if length is not None:
        if length > sig.shape[-1]:
            # torch.istft parity: requesting more than the synthesizable
            # span zero-pads the tail to exactly `length`
            extra = length - sig.shape[-1]
            sig = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1) + [(0, extra)])
            env = jnp.pad(env, [(0, extra)], constant_values=1.0)
        sig = sig[..., :length]
        env = env[:length]
    else:
        sig = sig[..., : -(n_fft // 2)]
        env = env[: -(n_fft // 2)]
    return sig / jnp.maximum(env, 1e-11)


# ---------------------------------------------------------------------------
# demucs HTDemucs front/back-end contract (reference ATHTDemucs_v2.py:261-310)
# ---------------------------------------------------------------------------

def spec(x: jnp.ndarray, n_fft: int = 4096, hop: int = 1024) -> jnp.ndarray:
    """demucs ``HTDemucs._spec``: ``(..., T) -> complex (..., n_fft//2, le)``.

    ``le = ceil(T / hop)``; the pre-pad keeps output frames = input samples /
    hop so the time and frequency branches stay aligned.
    """
    length = x.shape[-1]
    le = int(math.ceil(length / hop))
    pad = hop // 2 * 3
    x = pad_reflect_safe(x, pad, pad + le * hop - length)
    z = stft(x, n_fft, hop)
    z = z[..., :-1, :]        # drop Nyquist bin: 2049 -> 2048
    z = z[..., 2 : 2 + le]    # drop padding frames
    return z


def ispec(z: jnp.ndarray, length: int, n_fft: int = 4096, hop: int = 1024) -> jnp.ndarray:
    """demucs ``HTDemucs._ispec``: complex ``(..., F, le) -> (..., length)``."""
    z = jnp.pad(z, [(0, 0)] * (z.ndim - 2) + [(0, 1), (2, 2)])
    pad = hop // 2 * 3
    le = hop * int(math.ceil(length / hop)) + 2 * pad
    x = istft(z, le, n_fft, hop)
    return x[..., pad : pad + length]


def magnitude_cac(z: jnp.ndarray) -> jnp.ndarray:
    """demucs ``HTDemucs._magnitude`` with ``cac=True``.

    complex ``(B, C, F, T)`` -> real ``(B, 2C, F, T)`` with channel order
    ``[c0_re, c0_im, c1_re, c1_im, ...]``.
    """
    b, c, f, t = z.shape
    m = jnp.stack([z.real, z.imag], axis=2)  # (B, C, 2, F, T)
    return m.reshape(b, c * 2, f, t)


def mask_cac(m: jnp.ndarray) -> jnp.ndarray:
    """demucs ``HTDemucs._mask`` with ``cac=True``: CaC channels -> complex.

    ``(..., 2C, F, T)`` -> complex ``(..., C, F, T)``.
    """
    *lead, c2, f, t = m.shape
    m = m.reshape(*lead, c2 // 2, 2, f, t)
    return jax.lax.complex(m[..., 0, :, :], m[..., 1, :, :])


def spectrogram_db(
    x, n_fft: int = 2048, hop: int = 512, top_db: float = 80.0
) -> jnp.ndarray:
    """Power spectrogram in dB for plotting (reference `utils.py:30-95`).

    STFT (hann, center/reflect), power, ``10·log10`` with ``top_db`` clamp
    below the max — same contract as the reference's
    ``compute_spectrogram`` + ``amplitude_to_db``.
    """
    z = stft(jnp.asarray(x, dtype=jnp.float32), n_fft, hop)
    power = jnp.abs(z) ** 2
    db = 10.0 * jnp.log10(jnp.maximum(power, 1e-10))
    # per-spectrogram max (the reference applies amplitude_to_db per item,
    # so a quiet track's floor must not ride a loud batchmate's peak)
    peak = db.max(axis=(-2, -1), keepdims=True)
    return jnp.maximum(db, peak - top_db)
