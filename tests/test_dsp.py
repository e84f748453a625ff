"""STFT/iSTFT parity vs torch + demucs spec/ispec contract tests."""

import numpy as np
import pytest
import torch

import jax

import jax.numpy as jnp

from audio_to_sheet_music_tpu.ops import dsp


def torch_stft(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    z = torch.stft(
        torch.from_numpy(x).float(),
        n_fft,
        hop,
        window=torch.hann_window(n_fft),
        win_length=n_fft,
        normalized=True,
        center=True,
        return_complex=True,
        pad_mode="reflect",
    )
    return z.numpy()


def torch_istft(z: np.ndarray, length: int, n_fft: int, hop: int) -> np.ndarray:
    x = torch.istft(
        torch.from_numpy(z),
        n_fft,
        hop,
        window=torch.hann_window(n_fft),
        win_length=n_fft,
        normalized=True,
        center=True,
        length=length,
    )
    return x.numpy()


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (256, 64), (4096, 1024)])
@pytest.mark.parametrize("t_mult", [8, 11])
def test_stft_matches_torch(rng, n_fft, hop, t_mult):
    t = hop * t_mult
    x = rng.standard_normal((2, t)).astype(np.float32)
    ours = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop))
    ref = torch_stft(x, n_fft, hop)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (4096, 1024)])
def test_stft_non_divisible_length(rng, n_fft, hop):
    t = hop * 9 + hop // 3
    x = rng.standard_normal((t,)).astype(np.float32)
    ours = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop))
    ref = torch_stft(x[None], n_fft, hop)[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (4096, 1024)])
def test_istft_matches_torch(rng, n_fft, hop):
    n_frames = 14
    length = (n_frames - 1) * hop
    z = (
        rng.standard_normal((2, n_fft // 2 + 1, n_frames))
        + 1j * rng.standard_normal((2, n_fft // 2 + 1, n_frames))
    ).astype(np.complex64)
    ours = np.asarray(dsp.istft(jnp.asarray(z), length, n_fft, hop))
    ref = torch_istft(z, length, n_fft, hop)
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-3)


def test_stft_istft_roundtrip(rng):
    x = rng.standard_normal((2, 128 * 20)).astype(np.float32)
    z = dsp.stft(jnp.asarray(x), 512, 128)
    y = np.asarray(dsp.istft(z, x.shape[-1], 512, 128))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_spec_shape_contract(rng):
    # demucs contract: 6 s / 264600 samples @ 44.1 kHz -> (B, C, 2048, 259)
    x = rng.standard_normal((1, 2, 264600)).astype(np.float32)
    z = dsp.spec(jnp.asarray(x))
    assert z.shape == (1, 2, 2048, 259)
    # 343980 samples (7.8 s HTDemucs training length) -> 336 frames
    x2 = rng.standard_normal((1, 2, 343980)).astype(np.float32)
    z2 = dsp.spec(jnp.asarray(x2))
    assert z2.shape == (1, 2, 2048, 336)


def torch_demucs_spec(x: np.ndarray, n_fft: int = 4096, hop: int = 1024) -> np.ndarray:
    """The demucs ``_spec`` recipe re-derived with torch ops (golden model)."""
    import math

    xt = torch.from_numpy(x)
    b, c, t = xt.shape
    le = int(math.ceil(t / hop))
    pad = hop // 2 * 3
    xt = torch.nn.functional.pad(xt, (pad, pad + le * hop - t), mode="reflect")
    z = torch.stft(
        xt.reshape(-1, xt.shape[-1]), n_fft, hop,
        window=torch.hann_window(n_fft), win_length=n_fft,
        normalized=True, center=True, return_complex=True, pad_mode="reflect",
    )
    z = z.view(b, c, *z.shape[-2:])
    return z[..., :-1, 2 : 2 + le].numpy()


def test_spec_matches_torch_demucs_recipe(rng):
    x = rng.standard_normal((1, 2, 1024 * 30 + 100)).astype(np.float32)
    ours = np.asarray(dsp.spec(jnp.asarray(x)))
    ref = torch_demucs_spec(x)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_spec_ispec_roundtrip(rng):
    # Nyquist-bin energy is dropped by design; use a band-limited signal.
    # The demucs recipe is only exact away from the signal edges (reflect
    # padding + dropped frames) — its own torch version has the same ~0.6
    # edge error, so assert tightly on the interior only.
    t = 1024 * 40
    sr = 44100.0
    times = np.arange(t) / sr
    x = np.stack(
        [
            np.sin(2 * np.pi * 440.0 * times) + 0.3 * np.sin(2 * np.pi * 1200.0 * times),
            np.sin(2 * np.pi * 220.0 * times),
        ]
    ).astype(np.float32)[None]
    z = dsp.spec(jnp.asarray(x))
    y = np.asarray(dsp.ispec(z, t))
    assert y.shape == x.shape
    np.testing.assert_allclose(y[..., 2048:-2048], x[..., 2048:-2048], atol=1e-4)


def test_cac_roundtrip(rng):
    z = (
        rng.standard_normal((2, 2, 64, 10)) + 1j * rng.standard_normal((2, 2, 64, 10))
    ).astype(np.complex64)
    m = dsp.magnitude_cac(jnp.asarray(z))
    assert m.shape == (2, 4, 64, 10)
    # channel order [c0_re, c0_im, c1_re, c1_im]
    np.testing.assert_allclose(np.asarray(m)[:, 0], z[:, 0].real)
    np.testing.assert_allclose(np.asarray(m)[:, 1], z[:, 0].imag)
    np.testing.assert_allclose(np.asarray(m)[:, 2], z[:, 1].real)
    z2 = np.asarray(dsp.mask_cac(m))
    np.testing.assert_allclose(z2, z, atol=1e-6)


def test_overlap_add_matches_naive(rng):
    # hop 128 divides 512 (the demucs 4096/1024 shape class); hop 320 does
    # not divide 1024 (CLAPSep's upstream HTSAT geometry) and exercises the
    # pad-to-multiple + crop path
    for n, length, hop in [(7, 512, 128), (7, 1024, 320), (1, 96, 40)]:
        frames = rng.standard_normal((3, n, length)).astype(np.float32)
        out = np.asarray(dsp.overlap_add(jnp.asarray(frames), hop))
        naive = np.zeros((3, length + (n - 1) * hop), np.float32)
        for i in range(n):
            naive[:, i * hop : i * hop + length] += frames[:, i]
        np.testing.assert_allclose(out, naive, atol=1e-5)


def test_stft_istft_roundtrip_non_dividing_hop(rng):
    """n_fft 1024 / hop 320 (upstream CLAPSep/HTSAT geometry)."""
    t = 320 * 30
    x = (0.3 * rng.standard_normal((2, t))).astype(np.float32)
    z = dsp.stft(jnp.asarray(x), 1024, 320)
    y = np.asarray(dsp.istft(z, t, 1024, 320))
    np.testing.assert_allclose(y, x, atol=2e-4)


class TestMatmulFFT:
    """MXU four-step DFT == jnp.fft (the TPU hot path, forced here on CPU)."""

    def test_rfft_parity(self):
        from audio_to_sheet_music_tpu.ops import dsp

        rng = np.random.default_rng(0)
        for n in (1024, 4096):
            x = jnp.asarray(rng.standard_normal((6, n)), jnp.float32)
            ours = np.asarray(dsp.rfft_matmul(x, n))
            ref = np.fft.rfft(np.asarray(x), axis=-1)
            scale = np.abs(ref).max()
            np.testing.assert_allclose(ours.real, ref.real, atol=2e-4 * scale)
            np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-4 * scale)

    def test_irfft_roundtrip(self):
        from audio_to_sheet_music_tpu.ops import dsp

        rng = np.random.default_rng(1)
        for n in (1024, 4096):
            x = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
            z = dsp.rfft_matmul(x, n)
            back = np.asarray(dsp.irfft_matmul(z, n))
            np.testing.assert_allclose(back, np.asarray(x), atol=2e-3)

    def test_irfft_parity_vs_numpy(self):
        from audio_to_sheet_music_tpu.ops import dsp

        rng = np.random.default_rng(2)
        n = 4096
        z = (rng.standard_normal((3, n // 2 + 1))
             + 1j * rng.standard_normal((3, n // 2 + 1))).astype(np.complex64)
        ours = np.asarray(dsp.irfft_matmul(jnp.asarray(z), n))
        ref = np.fft.irfft(z, n=n, axis=-1)
        np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_pad_reflect_safe_short_input_length_contract():
    """demucs pad1d contract: output is ALWAYS length + pl + pr samples,
    even when the signal is shorter than a pad (zero-extension is split
    across sides and the reflect pads shrink by the same amounts)."""
    x = jnp.arange(1, 6, dtype=jnp.float32)[None]          # 5 samples
    for pl, pr in [(1536, 1536 + 1024), (2048, 2048), (10, 3), (0, 10)]:
        out = np.asarray(dsp.pad_reflect_safe(x, pl, pr))
        assert out.shape[-1] == 5 + pl + pr, (pl, pr)
        # the original samples sit exactly at [pl, pl + length)
        np.testing.assert_array_equal(out[0, pl : pl + 5],
                                      np.arange(1, 6, dtype=np.float32))
    # long inputs: plain reflect, unchanged
    y = np.arange(100, dtype=np.float32)[None]
    out = np.asarray(dsp.pad_reflect_safe(jnp.asarray(y), 10, 3))
    np.testing.assert_array_equal(
        out, np.pad(y, ((0, 0), (10, 3)), mode="reflect"))


class TestFusedIstft:
    """The segment-matmul iSTFT (``dsp._istft_segments``: iDFT x window x
    OLA folded into per-phase ``(bins, hop)`` operators) must match the
    factored irfft+window+OLA path exactly — same algebra, one less
    full-frames intermediate.  torch-parity of the factored path is pinned
    elsewhere in this file; this pins fused == factored."""

    @pytest.mark.parametrize("n_fft,hop,frames", [(64, 16, 9), (256, 64, 5)])
    def test_matches_factored_path(self, n_fft, hop, frames, monkeypatch):
        import math

        from audio_to_sheet_music_tpu.ops import dsp as d

        monkeypatch.setattr(d, "_MATMUL_FFT", True)
        rng = np.random.default_rng(3)
        zr = jnp.asarray(rng.standard_normal((3, n_fft // 2 + 1, frames)),
                         jnp.float32)
        zi = jnp.asarray(rng.standard_normal((3, n_fft // 2 + 1, frames)),
                         jnp.float32)
        z = jax.lax.complex(zr, zi)
        got = np.asarray(d.istft(z, None, n_fft, hop))
        zz = jnp.moveaxis(z, -1, -2)
        fr = d.irfft_matmul(zz, n_fft) * math.sqrt(n_fft)
        win = d.hann_window(n_fft)
        sig = d.overlap_add(fr * win, hop)
        env = d.overlap_add(jnp.broadcast_to(win * win, (frames, n_fft)), hop)
        sig = sig[..., n_fft // 2 : -(n_fft // 2)]
        env = env[n_fft // 2 : -(n_fft // 2)]
        ref = np.asarray(sig / jnp.maximum(env, 1e-11))
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_length_crop_matches_fft_reference(self):
        """Fused istft vs jnp.fft reference (the CPU default path) with an
        explicit length crop — exercises the ispec contract end to end."""
        from audio_to_sheet_music_tpu.ops import dsp as d

        rng = np.random.default_rng(4)
        n_fft, hop, frames, length = 64, 16, 12, 150
        zr = jnp.asarray(rng.standard_normal((2, n_fft // 2 + 1, frames)),
                         jnp.float32)
        zi = jnp.asarray(rng.standard_normal((2, n_fft // 2 + 1, frames)),
                         jnp.float32)
        z = jax.lax.complex(zr, zi)
        ref = np.asarray(d.istft(z, length, n_fft, hop))   # cpu: fft path
        try:
            d._MATMUL_FFT = True
            d.istft._clear_cache()
            got = np.asarray(d.istft(z, length, n_fft, hop))
        finally:
            d._MATMUL_FFT = None
            d.istft._clear_cache()
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_istft_tail_pad_to_requested_length(rng):
    """torch.istft parity: length beyond the synthesizable span zero-pads
    the tail instead of silently returning fewer samples."""
    x = (0.3 * rng.standard_normal((2, 256 * 20))).astype(np.float32)
    z = dsp.stft(jnp.asarray(x), 1024, 256)
    span = x.shape[-1]
    y = np.asarray(dsp.istft(z, span + 5000, 1024, 256))
    assert y.shape == (2, span + 5000)
    np.testing.assert_allclose(y[:, :span], x, atol=2e-4)
    np.testing.assert_array_equal(y[:, -4000:], 0.0)
