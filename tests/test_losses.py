"""Loss parity vs a torch re-derivation + the reference's property tests.

Mirrors the reference's manual property checks (`main.py:54-184`): perfect
reconstruction saturates the clamp, noise gives negative SDR, SI-SDR is
scale-invariant, and SDR decreases monotonically with noise level.
"""

import numpy as np
import torch

import jax.numpy as jnp

from audio_to_sheet_music_tpu.ops import losses


def torch_sdr_loss(est, tgt):
    est = torch.from_numpy(est).reshape(est.shape[0], -1)
    tgt = torch.from_numpy(tgt).reshape(tgt.shape[0], -1)
    num = torch.sum(tgt ** 2, dim=-1)
    den = torch.sum((tgt - est) ** 2, dim=-1)
    sdr = 10 * torch.log10((num + 1e-8) / (den + 1e-8))
    return float(-torch.clamp(sdr, -30, 30).mean())


def test_sdr_matches_torch(rng):
    tgt = rng.standard_normal((4, 2, 1000)).astype(np.float32)
    est = tgt + 0.1 * rng.standard_normal((4, 2, 1000)).astype(np.float32)
    ours = float(losses.sdr_loss(jnp.asarray(est), jnp.asarray(tgt)))
    ref = torch_sdr_loss(est, tgt)
    assert abs(ours - ref) < 1e-4


def test_perfect_reconstruction_saturates(rng):
    x = rng.standard_normal((2, 2, 4410)).astype(np.float32)
    assert float(losses.sdr_loss(jnp.asarray(x), jnp.asarray(x))) == -30.0
    assert float(losses.sisdr_loss(jnp.asarray(x), jnp.asarray(x))) == -30.0


def test_noise_gives_positive_loss(rng):
    tgt = rng.standard_normal((2, 2, 4410)).astype(np.float32)
    est = rng.standard_normal((2, 2, 4410)).astype(np.float32)
    assert float(losses.sdr_loss(jnp.asarray(est), jnp.asarray(tgt))) > 0.0


def test_sisdr_scale_invariant(rng):
    tgt = rng.standard_normal((2, 2, 4410)).astype(np.float32)
    est = tgt + 0.1 * rng.standard_normal((2, 2, 4410)).astype(np.float32)
    a = float(losses.sisdr_loss(jnp.asarray(est), jnp.asarray(tgt)))
    b = float(losses.sisdr_loss(jnp.asarray(2.0 * est), jnp.asarray(tgt)))
    sdr_a = float(losses.sdr_loss(jnp.asarray(est), jnp.asarray(tgt)))
    sdr_b = float(losses.sdr_loss(jnp.asarray(2.0 * est), jnp.asarray(tgt)))
    assert abs(a - b) < 0.05
    assert sdr_b > sdr_a + 1.0  # plain SDR is NOT scale invariant


def test_snr_monotonicity(rng):
    tgt = rng.standard_normal((1, 2, 8820)).astype(np.float32)
    noise = rng.standard_normal((1, 2, 8820)).astype(np.float32)
    prev = -100.0
    for snr_db in [20, 10, 5, 0, -5]:
        scale = np.sqrt(np.sum(tgt ** 2) / (np.sum(noise ** 2) * 10 ** (snr_db / 10)))
        est = tgt + scale * noise
        loss = float(losses.sdr_loss(jnp.asarray(est), jnp.asarray(tgt)))
        assert loss > prev
        prev = loss


def test_combined_loss_weights(rng):
    tgt = rng.standard_normal((2, 2, 4410)).astype(np.float32)
    est = tgt + 0.2 * rng.standard_normal((2, 2, 4410)).astype(np.float32)
    total, metrics = losses.combined_loss(jnp.asarray(est), jnp.asarray(tgt))
    sdr = float(losses.sdr_loss(jnp.asarray(est), jnp.asarray(tgt)))
    sisdr = float(losses.sisdr_loss(jnp.asarray(est), jnp.asarray(tgt)))
    assert abs(float(total) - (0.9 * sdr + 0.1 * sisdr)) < 1e-5
    assert set(metrics) >= {"loss/total", "loss/sdr", "loss/sisdr", "metrics/new_sdr"}
    total2, _ = losses.combined_l1_sdr_loss(jnp.asarray(est), jnp.asarray(tgt))
    l1 = float(np.mean(np.abs(est - tgt)))
    assert abs(float(total2) - (1.0 * sdr + 0.05 * l1)) < 1e-5


def test_new_sdr_metric_shape(rng):
    tgt = rng.standard_normal((3, 2, 100)).astype(np.float32)
    est = tgt.copy()
    scores = losses.new_sdr_metric(jnp.asarray(est), jnp.asarray(tgt))
    assert scores.shape == (3,)
    assert float(scores[0]) > 60.0  # perfect reconstruction, unclamped
