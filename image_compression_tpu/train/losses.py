"""Pretraining loss: masked weighted BCE on edge logits + sigma calibration.

Replicates compute_loss_and_signacc (pretraining.cpp:106-186):
  * masked BCE-with-logits on the mu logits, with connect-class (y=1) weight
    pos_weight (default 0.1, downweighting the overrepresented connect class,
    pretraining.cpp:264-267), normalized by the weighted mask sum;
  * sigma head mapped to [0.1, 0.9] via sigmoid; Gaussian-NLL calibration
    against the *detached* squared error of p = sigmoid(logit);
  * total = w_sign * bce + w_sigma * nll.

Tensor layout: outputs [B, H, W, 4] = (logit_r, sigma_r_raw, logit_d,
sigma_d_raw); targets [B, H, W, 4] = (y_r, y_d, mask_r, mask_d) — the NHWC
counterparts of the reference's channel contract.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PretrainLossOut(NamedTuple):
    loss: jnp.ndarray        # scalar
    loss_sign: jnp.ndarray   # scalar (BCE part)
    loss_sigma: jnp.ndarray  # scalar (NLL part)
    valid_weight: jnp.ndarray  # scalar: mask_r.sum() + mask_d.sum()
    correct: jnp.ndarray     # sign-accuracy numerator
    valid: jnp.ndarray       # sign-accuracy denominator


def _bce_with_logits(logits, labels):
    # log(1 + e^-|x|) + max(x, 0) - x*y, the stable form
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def pretrain_loss(outputs: jnp.ndarray, targets: jnp.ndarray,
                  pos_weight: float = 0.1, w_sign: float = 1.0,
                  w_sigma: float = 0.01, sigma_min: float = 0.1,
                  sigma_max: float = 0.9) -> PretrainLossOut:
    logit_r = outputs[..., 0]
    sigma_r_z = outputs[..., 1]
    logit_d = outputs[..., 2]
    sigma_d_z = outputs[..., 3]

    y_r = targets[..., 0]
    y_d = targets[..., 1]
    mask_r = targets[..., 2]
    mask_d = targets[..., 3]

    bce_r = _bce_with_logits(logit_r, y_r)
    bce_d = _bce_with_logits(logit_d, y_d)
    # y==1 (connect) weight pos_weight, y==0 (cut) weight 1
    w_r = (1.0 - y_r) + y_r * pos_weight
    w_d = (1.0 - y_d) + y_d * pos_weight
    num = (bce_r * w_r * mask_r).sum() + (bce_d * w_d * mask_d).sum()
    den = (w_r * mask_r).sum() + (w_d * mask_d).sum()
    loss_sign = num / jnp.maximum(den, 1.0)

    p_r = jnp.clip(1.0 / (1.0 + jnp.exp(-logit_r)), 1e-7, 1 - 1e-7)
    p_d = jnp.clip(1.0 / (1.0 + jnp.exp(-logit_d)), 1e-7, 1 - 1e-7)

    sigma_r = sigma_min + (sigma_max - sigma_min) / (1.0 + jnp.exp(-sigma_r_z))
    sigma_d = sigma_min + (sigma_max - sigma_min) / (1.0 + jnp.exp(-sigma_d_z))
    sigma_r = jnp.maximum(sigma_r, 1e-4)
    sigma_d = jnp.maximum(sigma_d, 1e-4)

    err2_r = (jax.lax.stop_gradient(p_r) - y_r) ** 2
    err2_d = (jax.lax.stop_gradient(p_d) - y_d) ** 2
    nll_r = 0.5 * (err2_r / sigma_r ** 2 + jnp.log(sigma_r ** 2))
    nll_d = 0.5 * (err2_d / sigma_d ** 2 + jnp.log(sigma_d ** 2))

    valid_w = jnp.maximum(mask_r.sum(), 1.0) + jnp.maximum(mask_d.sum(), 1.0)
    loss_sigma = ((nll_r * mask_r).sum() + (nll_d * mask_d).sum()) / valid_w

    loss = w_sign * loss_sign + w_sigma * loss_sigma

    pred_r = (p_r >= 0.5)
    pred_d = (p_d >= 0.5)
    correct = (((pred_r == (y_r >= 0.5)) * mask_r).sum()
               + ((pred_d == (y_d >= 0.5)) * mask_d).sum())
    valid = mask_r.sum() + mask_d.sum()
    return PretrainLossOut(loss, loss_sign, loss_sigma, valid_w, correct, valid)
