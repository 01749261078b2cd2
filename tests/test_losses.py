"""Loss-semantics tests: golden values against independent torch/numpy
re-derivations of the published formulas (hinge, SDI-GAN, intensity MAE,
log-cosh, router regularizers)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from zdcsim.ops import losses as L


def test_masked_mean_and_std(rng):
    x = rng.normal(size=32).astype(np.float32)
    mask = (rng.random(32) < 0.5).astype(np.float32)
    sub = x[mask > 0]
    np.testing.assert_allclose(float(L.masked_mean(x, mask)), sub.mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(L.masked_std(x, mask)), sub.std(ddof=1), rtol=1e-4
    )
    # None mask = plain mean
    np.testing.assert_allclose(float(L.masked_mean(x, None)), x.mean(), rtol=1e-6)


def test_hinge_losses_match_torch(rng):
    real = rng.normal(size=16).astype(np.float32)
    fake = rng.normal(size=16).astype(np.float32)
    tr, tf = torch.tensor(real), torch.tensor(fake)
    expected_d = (F.relu(1.0 - tr).mean() + F.relu(1.0 + tf).mean()).item()
    expected_g = (-tf.mean()).item()
    np.testing.assert_allclose(
        float(L.hinge_discriminator_loss(real, fake)), expected_d, rtol=1e-5
    )
    np.testing.assert_allclose(float(L.hinge_generator_loss(fake)), expected_g, rtol=1e-5)


def test_hinge_masked_equals_subset(rng):
    real = rng.normal(size=32).astype(np.float32)
    fake = rng.normal(size=32).astype(np.float32)
    mask = (rng.random(32) < 0.4).astype(np.float32)
    got = float(L.hinge_discriminator_loss(real, fake, mask))
    sub = float(L.hinge_discriminator_loss(real[mask > 0], fake[mask > 0]))
    np.testing.assert_allclose(got, sub, rtol=1e-5)


def _torch_sdi(l1, l2, n1, n2, std, di):
    """Independent torch re-derivation with intended per-sample pairing."""
    adl = torch.mean(torch.abs(l1 - l2), dim=1)
    adn = torch.mean(torch.abs(n1 - n2), dim=1)
    div = adl / (adn + 1e-5)
    per = std.view(-1) / (div + 1e-5)
    return (torch.mean(std) * torch.mean(per) * di).item()


def test_sdi_gan_matches_torch(rng):
    b, d, z = 8, 64, 10
    l1 = rng.normal(size=(b, d)).astype(np.float32)
    l2 = rng.normal(size=(b, d)).astype(np.float32)
    n1 = rng.normal(size=(b, z)).astype(np.float32)
    n2 = rng.normal(size=(b, z)).astype(np.float32)
    std = rng.random((b, 1)).astype(np.float32)
    expected = _torch_sdi(
        torch.tensor(l1), torch.tensor(l2), torch.tensor(n1), torch.tensor(n2),
        torch.tensor(std), 0.1,
    )
    got = float(L.sdi_gan_regularization(l1, l2, n1, n2, std, 0.1))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_sdi_gan_pairwise_quirk_factorizes(rng):
    """The reference's [B,1]/[B] broadcast factorizes into
    mean(std)^2 * mean(1/(div+eps)); check our quirk flag reproduces it."""
    b, d, z = 6, 4, 3
    l1 = rng.normal(size=(b, d)).astype(np.float32)
    l2 = rng.normal(size=(b, d)).astype(np.float32)
    n1 = rng.normal(size=(b, z)).astype(np.float32)
    n2 = rng.normal(size=(b, z)).astype(np.float32)
    std = rng.random((b, 1)).astype(np.float32)
    # torch broadcast form
    tl1, tl2, tn1, tn2, tstd = map(torch.tensor, (l1, l2, n1, n2, std))
    adl = torch.mean(torch.abs(tl1 - tl2), dim=1)
    adn = torch.mean(torch.abs(tn1 - tn2), dim=1)
    div = adl / (adn + 1e-5)
    div_loss = tstd / (div + 1e-5)  # [B,1] / [B] -> [B,B]
    assert div_loss.shape == (b, b)
    expected = (torch.mean(tstd) * torch.mean(div_loss) * 0.1).item()
    got = float(L.sdi_gan_regularization(l1, l2, n1, n2, std, 0.1, pairwise_quirk=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_intensity_regularization_matches_torch(rng):
    b, h, w = 5, 8, 6
    imgs = rng.random((b, h, w)).astype(np.float32)
    target = (rng.random(b) * 100).astype(np.float32)
    timgs, ttarget = torch.tensor(imgs), torch.tensor(target)
    sums = torch.sum(torch.exp(timgs) - 1, dim=[1, 2])
    expected_loss = (F.l1_loss(sums, ttarget) * 1e-3).item()
    loss, got_sums, got_std, got_mean = L.intensity_regularization(imgs, target, 1e-3)
    np.testing.assert_allclose(float(loss), expected_loss, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_sums), sums.numpy(), rtol=1e-4)
    np.testing.assert_allclose(float(got_std), sums.std().item(), rtol=1e-4)
    np.testing.assert_allclose(float(got_mean), sums.mean().item(), rtol=1e-5)


def test_log_cosh_matches_torch(rng):
    real = rng.normal(size=(10, 2)).astype(np.float32) * 20
    pred = rng.normal(size=(10, 2)).astype(np.float32) * 20
    d = torch.tensor(pred) - torch.tensor(real)
    expected = torch.mean(d + F.softplus(-2.0 * d) - math.log(2.0)).item()
    np.testing.assert_allclose(float(L.log_cosh_loss(real, pred)), expected, rtol=1e-5)


def test_expert_utilization_entropy(rng):
    gates = torch.softmax(torch.tensor(rng.normal(size=(32, 3)).astype(np.float32)), dim=1)
    avg = gates.mean(dim=0)
    expected = (-torch.sum(avg * torch.log(avg + 1e-9)) * 0.1).item()
    got = float(L.expert_utilization_entropy(gates.numpy(), 0.1))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_expert_distribution_loss_matches_torch(rng):
    gates = torch.softmax(torch.tensor(rng.normal(size=(16, 3)).astype(np.float32)), dim=1)
    feats = torch.tensor(rng.normal(size=(16, 1)).astype(np.float32))
    dist = torch.cdist(feats, feats, p=2)
    sims = gates @ gates.T
    expected = (torch.sum(sims * dist) / 16 * 0.1).item()
    got = float(L.expert_distribution_loss(gates.numpy(), feats.numpy()))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-5)


def test_differentiation_loss_pairs():
    mi = np.array([1.0, 4.0, 6.0], np.float32)
    # pairs: |1-4| + |1-6| + |4-6| = 3 + 5 + 2 = 10
    assert float(L.differentiation_loss(mi)) == pytest.approx(10.0)


def test_alb_loss(rng):
    scores = np.array([10.0, 0.5, 3.0], np.float32)
    expected = np.mean(np.exp(1.0 / (scores + 1e-6))) * 1e-5
    got = float(L.adaptive_load_balancing_loss(scores, 1e-5))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_tau_schedule():
    # max(tau_min, tau_start * decay^epoch)
    assert float(L.tau_schedule(0, 1.2, 0.8, 0.985)) == pytest.approx(1.2)
    assert float(L.tau_schedule(1000, 1.2, 0.8, 0.985)) == pytest.approx(0.8)
    mid = float(L.tau_schedule(10, 1.2, 0.8, 0.985))
    assert mid == pytest.approx(1.2 * 0.985**10, rel=1e-5)


def test_alb_annealing_weight():
    assert float(L.alb_annealing_weight(0, 60, 0.2)) == pytest.approx(0.2)
    assert float(L.alb_annealing_weight(60, 60, 0.2)) == pytest.approx(1.0)
    assert float(L.alb_annealing_weight(30, 60, 0.2)) == pytest.approx(0.6)
    assert float(L.alb_annealing_weight(120, 60, 0.2)) == pytest.approx(1.0)
