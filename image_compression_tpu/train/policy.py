"""Gaussian edge-cost policy and EMA reward baseline for REINFORCE.

Replicates gaussian_policy.hpp:11-33 and ema_baseline.hpp:4-22: a diagonal
Gaussian over flattened edge costs with reparameterized sampling, per-sample
log-prob and closed-form entropy; a scalar EMA of the batch-mean reward as
the variance-reduction baseline.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)


class PolicySample(NamedTuple):
    w: jnp.ndarray        # [B, E] sampled edge costs
    logp: jnp.ndarray     # [B]
    entropy: jnp.ndarray  # [B]


def sample_gaussian_policy(key: jax.Array, mu: jnp.ndarray,
                           sigma: jnp.ndarray) -> PolicySample:
    """mu, sigma: [B, E] -> reparameterized sample with summed log-prob and
    entropy (gaussian_policy.hpp:11-33)."""
    noise = jax.random.normal(key, mu.shape, mu.dtype)
    w = mu + sigma * noise
    return gaussian_logp(w, mu, sigma)


def gaussian_logp(w: jnp.ndarray, mu: jnp.ndarray,
                  sigma: jnp.ndarray) -> PolicySample:
    """Summed log-prob and entropy of fixed costs w under N(mu, sigma).
    Lets the REINFORCE step evaluate (and differentiate) the policy density
    of an already-drawn sample without re-entering the sampling path."""
    z = (w - mu) / sigma
    logp_elem = -0.5 * z * z - jnp.log(sigma) - 0.5 * LOG_2PI
    ent_elem = 0.5 * (1.0 + LOG_2PI) + jnp.log(sigma)
    return PolicySample(w, logp_elem.sum(-1), ent_elem.sum(-1))


def sample_antithetic_policy(key: jax.Array, mu: jnp.ndarray,
                             sigma: jnp.ndarray) -> PolicySample:
    """Mirrored-pair sampling: ONE noise draw eps yields w+ = mu + sigma*eps
    and w- = mu - sigma*eps, stacked on the batch axis -> [2B, E].

    Variance-reduction upgrade over training.cpp:161 (cfg.rl.sampler =
    "antithetic", documented divergence): with the pair-difference advantage
    (`antithetic_advantage`) every reward component that depends on the
    image but not on the noise sign — i.e. the whole per-image
    compressibility spread, the dominant variance term — cancels exactly.
    The estimator stays unbiased: for a Gaussian, grad_mu logp(w+) =
    eps/sigma = -grad_mu logp(w-), so E[(r+ - r-) * grad logp(w+)] =
    2 E[r * grad logp(w)] (the classic mirrored-sampling identity from
    evolution strategies).
    """
    noise = jax.random.normal(key, mu.shape, mu.dtype)
    w = jnp.concatenate([mu + sigma * noise, mu - sigma * noise], axis=0)
    mu2 = jnp.concatenate([mu, mu], axis=0)
    sigma2 = jnp.concatenate([sigma, sigma], axis=0)
    return gaussian_logp(w, mu2, sigma2)


def antithetic_advantage(rewards: jnp.ndarray) -> jnp.ndarray:
    """[2B] rewards of mirrored pairs -> whitened pair-difference advantage:
    adv(w+) = (r+ - r-)/2, adv(w-) = -(r+ - r-)/2, standardized like
    `whitened_advantage` (already zero-mean by construction)."""
    b = rewards.shape[0] // 2
    d = 0.5 * (rewards[:b] - rewards[b:])
    adv = jnp.concatenate([d, -d])
    return adv / jnp.maximum(jnp.std(adv), 1e-6)


def ema_baseline_update(value: jnp.ndarray, initialized: jnp.ndarray,
                        rewards: jnp.ndarray,
                        momentum: float = 0.99):
    """Scalar EMA of mean reward; first call adopts the batch mean
    (ema_baseline.hpp:11-21). Returns (new_value, new_initialized)."""
    mean_r = rewards.mean()
    new_value = jnp.where(initialized,
                          value * momentum + mean_r * (1.0 - momentum),
                          mean_r)
    return new_value, jnp.asarray(True) | initialized


def whitened_advantage(rewards: jnp.ndarray,
                       baseline: jnp.ndarray) -> jnp.ndarray:
    """adv = (r - b), then standardized with std clamped at 1e-6
    (training.cpp:180: adv.std(false) = population std, ddof=0)."""
    adv = rewards - baseline
    std = jnp.std(adv)
    return (adv - adv.mean()) / jnp.maximum(std, 1e-6)


def reinforce_loss(adv: jnp.ndarray, sample: PolicySample, num_edges: int,
                   entropy_coef: float = 1e-4) -> jnp.ndarray:
    """loss = -mean(adv * logp/E) - c * mean(entropy/E) (training.cpp:185-186)."""
    e = float(num_edges)
    return (-(adv * (sample.logp / e)).mean()
            - entropy_coef * (sample.entropy / e).mean())


def gaussian_logp_elem(w: jnp.ndarray, mu: jnp.ndarray,
                       sigma: jnp.ndarray) -> jnp.ndarray:
    """Per-edge log-density [B, E] (unreduced; the PPO surrogate clips per
    edge, so it needs the elementwise terms gaussian_logp sums away)."""
    z = (w - mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - 0.5 * LOG_2PI


def ppo_clip_loss(adv: jnp.ndarray, w: jnp.ndarray, mu: jnp.ndarray,
                  sigma: jnp.ndarray, logp_old_elem: jnp.ndarray,
                  num_edges: int, clip: float = 0.2,
                  entropy_coef: float = 1e-4) -> jnp.ndarray:
    """Per-edge clipped PPO surrogate with the shared per-image advantage
    (cfg.rl.ppo_epochs > 0; documented divergence — the reference has no
    proximal variant, training.cpp:183-186).

    The action here is a ~1.3e5-dimensional edge-cost vector: the JOINT
    ratio exp(sum_e dlogp_e) saturates any clip window after one finite
    update, so the surrogate clips PER EDGE with the image's advantage
    shared across its edges:

      L = -mean_{b,e} min(rho_be * adv_b, clip(rho_be, 1±eps) * adv_b)
          - c * mean_b(entropy_b / E)

    At the first inner epoch rho == 1 and the gradient equals
    `reinforce_loss`'s exactly; later epochs reuse the (expensive) solver
    sample while the clip bounds how far the policy moves per edge.
    """
    logp_elem = gaussian_logp_elem(w, mu, sigma)
    rho = jnp.exp(logp_elem - logp_old_elem)
    un = rho * adv[:, None]
    cl = jnp.clip(rho, 1.0 - clip, 1.0 + clip) * adv[:, None]
    ent_elem = 0.5 * (1.0 + LOG_2PI) + jnp.log(sigma)
    return (-jnp.minimum(un, cl).mean()
            - entropy_coef * (ent_elem.sum(-1) / float(num_edges)).mean())
