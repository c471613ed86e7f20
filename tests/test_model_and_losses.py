"""EdgeUNet architecture, pretraining loss, metrics, and policy math —
cross-validated against torch/libtorch semantics where torch (CPU) can serve
as the oracle (the reference's exact ops: BCE-with-logits, GroupNorm,
ConvTranspose shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_compression_tpu.models.unet import EdgeUNet
from image_compression_tpu.train.losses import pretrain_loss
from image_compression_tpu.train.metrics import edge_metrics
from image_compression_tpu.train.policy import (ema_baseline_update,
                                                reinforce_loss,
                                                sample_gaussian_policy,
                                                whitened_advantage)


@pytest.fixture(scope="module")
def unet_setup():
    model = EdgeUNet(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_unet_shapes(unet_setup):
    model, params = unet_setup
    x = jnp.zeros((2, 64, 64, 3))
    out = model.apply(params, x)
    assert out.shape == (2, 64, 64, 4)
    assert out.dtype == jnp.float32


def test_unet_odd_sizes(unet_setup):
    """Pad-correction path (Up.h:20-24): odd spatial sizes still round-trip."""
    model, params = unet_setup
    out = model.apply(params, jnp.zeros((1, 50, 70, 3)))
    assert out.shape == (1, 50, 70, 4)


def test_unet_param_count(unet_setup):
    """Architecture parity: channel progression 64/128/256/512 with
    GroupNorm(8) and 2x2 transpose convs (EdgeUNet.h:13-31)."""
    _, params = unet_setup
    n_params = sum(p.size for p in jax.tree.leaves(params))
    # torch EdgeUNet(3, 4) has 7,703,172 parameters (verified against a
    # libtorch-equivalent torch model)
    assert n_params == 7_703_172, n_params


def test_pretrain_loss_matches_torch(rng):
    import torch

    outputs = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    y = (rng.random((2, 8, 8, 2)) > 0.7).astype(np.float32)
    masks = np.ones((2, 8, 8, 2), np.float32)
    masks[:, :, -1, 0] = 0
    masks[:, -1, :, 1] = 0
    targets = np.concatenate([y, masks], axis=-1)

    out = pretrain_loss(jnp.asarray(outputs), jnp.asarray(targets))

    # torch oracle, mirroring pretraining.cpp:106-186
    o = torch.tensor(outputs)
    logit_r, sig_r = o[..., 0], o[..., 1]
    logit_d, sig_d = o[..., 2], o[..., 3]
    y_r = torch.tensor(y[..., 0])
    y_d = torch.tensor(y[..., 1])
    m_r = torch.tensor(masks[..., 0])
    m_d = torch.tensor(masks[..., 1])
    bce_r = torch.nn.functional.binary_cross_entropy_with_logits(
        logit_r, y_r, reduction="none")
    bce_d = torch.nn.functional.binary_cross_entropy_with_logits(
        logit_d, y_d, reduction="none")
    pos_w = 0.1
    w_r = (1 - y_r) + y_r * pos_w
    w_d = (1 - y_d) + y_d * pos_w
    loss_sign = ((bce_r * w_r * m_r).sum() + (bce_d * w_d * m_d).sum()) / \
        ((w_r * m_r).sum() + (w_d * m_d).sum()).clamp_min(1.0)
    p_r = torch.sigmoid(logit_r)
    p_d = torch.sigmoid(logit_d)
    s_r = (0.1 + 0.8 * torch.sigmoid(sig_r)).clamp_min(1e-4)
    s_d = (0.1 + 0.8 * torch.sigmoid(sig_d)).clamp_min(1e-4)
    nll_r = 0.5 * ((p_r.detach() - y_r) ** 2 / s_r ** 2 + torch.log(s_r ** 2))
    nll_d = 0.5 * ((p_d.detach() - y_d) ** 2 / s_d ** 2 + torch.log(s_d ** 2))
    valid_w = m_r.sum().clamp_min(1.0) + m_d.sum().clamp_min(1.0)
    loss_sig = ((nll_r * m_r).sum() + (nll_d * m_d).sum()) / valid_w
    expected = loss_sign + 0.01 * loss_sig

    np.testing.assert_allclose(float(out.loss), float(expected), rtol=1e-5)
    np.testing.assert_allclose(float(out.loss_sign), float(loss_sign),
                               rtol=1e-5)


def test_metrics_confusion(rng):
    outputs = np.zeros((1, 4, 4, 4), np.float32)
    outputs[..., 0] = 5.0   # predict connect everywhere (right edges)
    outputs[..., 2] = -5.0  # predict cut everywhere (down edges)
    targets = np.zeros((1, 4, 4, 4), np.float32)
    targets[..., 0] = 1.0   # right edges all connect
    targets[..., 1] = 1.0   # down edges all connect
    targets[..., 2:] = 1.0  # all valid
    m = edge_metrics(jnp.asarray(outputs), jnp.asarray(targets))
    s = m.summary()
    assert int(m.tp_conn) == 16      # right edges correct
    assert int(m.fn_conn) == 16      # down edges missed
    assert s["recall_conn"] == pytest.approx(0.5)
    assert s["precision_conn"] == pytest.approx(1.0, abs=1e-9)


def test_gaussian_policy_math():
    key = jax.random.PRNGKey(1)
    mu = jnp.asarray(np.linspace(-1, 1, 12).reshape(2, 6).astype(np.float32))
    sigma = jnp.full((2, 6), 0.5, jnp.float32)
    s = sample_gaussian_policy(key, mu, sigma)
    # logp of the drawn sample against the same Gaussian, computed manually
    z = (np.asarray(s.w) - np.asarray(mu)) / 0.5
    logp = (-0.5 * z ** 2 - np.log(0.5) - 0.5 * np.log(2 * np.pi)).sum(-1)
    np.testing.assert_allclose(np.asarray(s.logp), logp, rtol=1e-5)
    ent = (0.5 * (1 + np.log(2 * np.pi)) + np.log(0.5)) * 6
    np.testing.assert_allclose(np.asarray(s.entropy), ent, rtol=1e-5)


def test_ema_baseline():
    v, init = ema_baseline_update(jnp.asarray(0.0), jnp.asarray(False),
                                  jnp.asarray([1.0, 3.0]))
    assert float(v) == 2.0 and bool(init)
    v2, _ = ema_baseline_update(v, init, jnp.asarray([4.0, 4.0]), 0.99)
    np.testing.assert_allclose(float(v2), 2.0 * 0.99 + 4.0 * 0.01, rtol=1e-6)


def test_advantage_whitening():
    r = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    adv = whitened_advantage(r, jnp.asarray(2.5))
    np.testing.assert_allclose(float(adv.mean()), 0.0, atol=1e-6)
    # torch .std(false) is the population std (biased, ddof=0)
    np.testing.assert_allclose(float(jnp.std(adv)), 1.0, rtol=1e-5)


def test_reinforce_loss_direction():
    """Positive advantage must push loss down as logp of that sample rises."""
    from image_compression_tpu.train.policy import PolicySample
    adv = jnp.asarray([1.0, -1.0])
    s_hi = PolicySample(None, jnp.asarray([10.0, 0.0]), jnp.asarray([0.0, 0.0]))
    s_lo = PolicySample(None, jnp.asarray([0.0, 0.0]), jnp.asarray([0.0, 0.0]))
    assert float(reinforce_loss(adv, s_hi, 4)) < float(
        reinforce_loss(adv, s_lo, 4))


def test_antithetic_sampler_structure():
    from image_compression_tpu.train.policy import (antithetic_advantage,
                                                    sample_antithetic_policy)
    key = jax.random.PRNGKey(2)
    mu = jnp.asarray(np.linspace(-1, 1, 12).reshape(2, 6).astype(np.float32))
    sigma = jnp.full((2, 6), 0.5, jnp.float32)
    s = sample_antithetic_policy(key, mu, sigma)
    assert s.w.shape == (4, 6)
    # mirrored pairs: w+ + w- == 2*mu, and both halves share |deviation|
    np.testing.assert_allclose(np.asarray(s.w[:2] + s.w[2:]),
                               2 * np.asarray(mu), rtol=1e-5)
    # logp of each half matches the plain density of that sample
    half = sample_gaussian_policy(key, mu, sigma)  # same key -> same noise
    np.testing.assert_allclose(np.asarray(s.logp[:2]),
                               np.asarray(half.logp), rtol=1e-5)

    adv = antithetic_advantage(jnp.asarray([3.0, 5.0, 1.0, 2.0]))
    a = np.asarray(adv)
    # antisymmetric pairs, zero mean, unit population std
    np.testing.assert_allclose(a[:2], -a[2:], rtol=1e-6)
    np.testing.assert_allclose(a.mean(), 0.0, atol=1e-6)
    np.testing.assert_allclose(a.std(), 1.0, rtol=1e-5)


def test_antithetic_gradient_unbiased_direction():
    """The mirrored-sampling estimator must point the same way as the true
    policy gradient on an analytic problem: r(w) = -(w - 2)^2, policy
    N(mu=0, sigma=1) => d/dmu E[r] = 2*(2 - mu) = 4 > 0."""
    from image_compression_tpu.train.policy import (antithetic_advantage,
                                                    gaussian_logp,
                                                    sample_antithetic_policy)
    mu = jnp.zeros((64, 1))
    sigma = jnp.ones((64, 1))

    def surrogate(m):
        # the sample and its advantage are FIXED data in the REINFORCE loss
        # (drawn in a separate program, steps.py::solve_reward_program);
        # without the stop_gradient the reparameterized z = (w - mu)/sigma
        # is constant in mu and the score-function gradient vanishes
        s = sample_antithetic_policy(jax.random.PRNGKey(0),
                                     jax.lax.stop_gradient(m), sigma)
        r = -(s.w[:, 0] - 2.0) ** 2
        adv = antithetic_advantage(r)
        pol = gaussian_logp(s.w, jnp.concatenate([m, m]),
                            jnp.concatenate([sigma, sigma]))
        return -(adv * pol.logp).mean()

    g = jax.grad(surrogate)(mu)
    # minimizing the surrogate must push mu toward 2 (positive gradient
    # ascent direction => negative loss gradient)
    assert float(g.mean()) < 0
