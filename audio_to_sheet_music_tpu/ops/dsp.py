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


def hann_window(n_fft: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches ``torch.hann_window(n, periodic=True)``)."""
    i = jnp.arange(n_fft, dtype=jnp.float32)
    w = 0.5 * (1.0 - jnp.cos(2.0 * math.pi * i / n_fft))
    return w.astype(dtype)


def pad_reflect_safe(x: jnp.ndarray, pad_left: int, pad_right: int) -> jnp.ndarray:
    """Reflect-pad the last axis; zero-pad first if the signal is too short.

    Mirrors demucs ``pad1d``: reflect padding requires ``pad < T``, so short
    inputs are zero-extended before reflecting.
    """
    length = x.shape[-1]
    max_pad = max(pad_left, pad_right)
    if length <= max_pad:
        extra = max_pad - length + 1
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, extra)])
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

    Returns ``(..., L + (N-1)*hop)``.  Requires ``L % hop == 0``; implemented
    as ``ratio`` shifted zero-padded views summed together (XLA fuses this into
    a few adds — the device-side OLA primitive used by iSTFT and by chunked
    full-song reconstruction).
    """
    *lead, n, length = frames.shape
    assert length % hop == 0, (length, hop)
    ratio = length // hop
    pieces = frames.reshape(*lead, n, ratio, hop)
    out_chunks = n - 1 + ratio
    acc = jnp.zeros((*lead, out_chunks, hop), dtype=frames.dtype)
    for i in range(ratio):
        acc = acc.at[..., i : i + n, :].add(pieces[..., :, i, :])
    return acc.reshape(*lead, out_chunks * hop)


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
    frames = frame(xp, n_fft, hop, n_frames)
    win = hann_window(n_fft)
    z = jnp.fft.rfft(frames * win, axis=-1)
    if normalized:
        z = z * (1.0 / math.sqrt(n_fft))
    return jnp.moveaxis(z, -1, -2)  # (..., F, n_frames)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def istft(
    z: jnp.ndarray, length: int | None = None, n_fft: int = 4096, hop: int = 1024,
    real_output: bool = True,
) -> jnp.ndarray:
    """``torch.istft`` parity: center=True, normalized=True, hann window.

    z: complex ``(..., n_fft//2 + 1, n_frames)``.  Returns ``(..., length)``.
    """
    z = jnp.moveaxis(z, -1, -2)  # (..., n_frames, F)
    frames = jnp.fft.irfft(z, n=n_fft, axis=-1) * math.sqrt(n_fft)
    win = hann_window(n_fft)
    sig = overlap_add(frames * win, hop)
    n_frames = z.shape[-2]
    env = overlap_add(
        jnp.broadcast_to(win * win, (n_frames, n_fft)), hop
    )
    sig = sig[..., n_fft // 2 :]
    env = env[n_fft // 2 :]
    if length is not None:
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
    return jnp.maximum(db, db.max() - top_db)
