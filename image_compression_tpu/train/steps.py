"""Jitted train steps: supervised pretraining and online REINFORCE.

Everything the reference does per batch — forward, loss, backward, optimizer
(pretraining.cpp:282-296); forward, squash, sample, multicut, reward,
baseline, REINFORCE update (training.cpp:140-192) — runs on device with no
host round-trips. The pretrain step is one XLA program; the RL step is
deliberately three (forward+sample / multicut+reward / grad+update) chained
on device: XLA's layout assignment slows the solver 30-150x when it shares
a program with the U-Net's convolutions (see make_rl_step), so the split is
a performance boundary, not a host sync (the reference runs solver+reward
on a separate stream with per-segment host syncs, compute_rewards.cu:152).

Data-parallel by construction: feed a batch sharded over the mesh's "data"
axis with replicated params (parallel/mesh.py) and XLA inserts the gradient
all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from image_compression_tpu.config import Config
from image_compression_tpu.models.unet import EdgeUNet
from image_compression_tpu.ops.edges import (flatten_edge_planes,
                                             split_model_output, squash_mu,
                                             squash_sigma,
                                             unflatten_edge_planes)
from image_compression_tpu.ops.multicut import (multicut_grid,
                                                produces_minlabel)
from image_compression_tpu.ops.rewards import compute_rewards_batched
from image_compression_tpu.train.losses import pretrain_loss
from image_compression_tpu.train.metrics import edge_metrics
from image_compression_tpu.train.policy import (antithetic_advantage,
                                                ema_baseline_update,
                                                gaussian_logp,
                                                gaussian_logp_elem,
                                                ppo_clip_loss,
                                                reinforce_loss,
                                                sample_antithetic_policy,
                                                sample_gaussian_policy,
                                                whitened_advantage)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class RLState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    baseline: jnp.ndarray          # EMA of mean reward (ema_baseline.hpp)
    baseline_init: jnp.ndarray     # bool
    # learned value baseline (cfg.rl.baseline == "value"); () when unused so
    # the pytree stays orbax-serializable
    value_params: Any = ()
    value_opt_state: Any = ()


def make_pretrain_optimizer(cfg: Config) -> optax.GradientTransformation:
    """AdamW(lr=1e-3, wd=1e-4) (pretraining.cpp:221-224)."""
    return optax.adamw(cfg.pretrain.lr, weight_decay=cfg.pretrain.weight_decay)


def make_value_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Optimizer for the learned value baseline (cfg.rl.baseline="value")."""
    return optax.adam(cfg.rl.value_lr)


def make_rl_optimizer(cfg: Config) -> optax.GradientTransformation:
    """grad-clip 1.0 + Adam(1e-4) (training.cpp:79, :190)."""
    return optax.chain(optax.clip_by_global_norm(cfg.rl.grad_clip),
                       optax.adam(cfg.rl.lr))


def make_pretrain_step(model: EdgeUNet, tx: optax.GradientTransformation,
                       cfg: Config):
    p = cfg.pretrain

    @jax.jit
    def step(state: TrainState, images: jnp.ndarray, targets: jnp.ndarray):
        def loss_fn(params):
            out = model.apply(params, images)
            lo = pretrain_loss(out, targets, pos_weight=p.pos_weight,
                               w_sign=p.w_sign, w_sigma=p.w_sigma,
                               sigma_min=p.sigma_min, sigma_max=p.sigma_max)
            return lo.loss, (lo, out)

        (loss, (lo, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = edge_metrics(out, targets)
        aux = {"loss": loss, "loss_sign": lo.loss_sign,
               "loss_sigma": lo.loss_sigma,
               "sign_correct": lo.correct, "sign_valid": lo.valid}
        return TrainState(params, opt_state, state.step + 1), aux, metrics

    return step


def make_pretrain_eval(model: EdgeUNet, cfg: Config):
    p = cfg.pretrain

    @jax.jit
    def evaluate(params, images, targets):
        out = model.apply(params, images)
        lo = pretrain_loss(out, targets, pos_weight=p.pos_weight,
                           w_sign=p.w_sign, w_sigma=p.w_sigma,
                           sigma_min=p.sigma_min, sigma_max=p.sigma_max)
        return {"loss": lo.loss, "valid_weight": lo.valid_weight,
                "sign_correct": lo.correct,
                "sign_valid": lo.valid}, edge_metrics(out, targets)

    return evaluate


def _policy_forward(model, params, images, cfg: Config):
    # flatten drops the padding column/row, so no masking is needed here;
    # squash-after-flatten == flatten-after-squash (elementwise)
    out = model.apply(params, images)
    mu_raw, sigma_raw = split_model_output(out)
    mu = flatten_edge_planes(squash_mu(mu_raw, cfg.rl.mu_scale))
    sigma = flatten_edge_planes(
        squash_sigma(sigma_raw, cfg.rl.sigma_min, cfg.rl.sigma_max))
    return mu, sigma


def make_rl_step(model: EdgeUNet, tx: optax.GradientTransformation,
                 cfg: Config, value_model=None,
                 value_tx: optax.GradientTransformation | None = None):
    """One REINFORCE step (training.cpp:140-192), fully on device.

    cfg.rl.sampler/baseline select the variance-reduction variants (see
    config.py): "antithetic" runs mirrored sample pairs through the solver
    (2B solves, per-image reward variance cancels in the pair difference);
    baseline="value" subtracts `value_model`'s per-image reward prediction
    (trained jointly with `value_tx`) instead of the scalar EMA.
    cfg.rl.ppo_epochs > 0 replaces the single REINFORCE update with K
    per-edge-clipped proximal steps reusing the batch's solver sample
    (policy.py::ppo_clip_loss); K=1 reproduces the REINFORCE gradient.
    """
    r = cfg.rl
    mc = cfg.multicut
    rw = cfg.reward
    antithetic = r.sampler == "antithetic"
    use_value = r.baseline == "value"
    if r.sampler not in ("single", "antithetic"):
        raise ValueError(f"unknown rl.sampler: {r.sampler}")
    if r.baseline not in ("ema", "value"):
        raise ValueError(f"unknown rl.baseline: {r.baseline}")
    if use_value and (value_model is None or value_tx is None):
        raise ValueError("baseline='value' needs value_model and value_tx")

    def segment(costs_flat, height, width):
        planes = unflatten_edge_planes(costs_flat, height, width)
        fn = functools.partial(multicut_grid, mode=mc.mode,
                               max_rounds=mc.max_rounds,
                               icm_sweeps=mc.icm_sweeps,
                               hier_rounds=(tuple(mc.hier_rounds)
                                            if mc.hier_rounds else None),
                               hier_caps=mc.hier_caps,
                               hier_agg=mc.hier_agg)
        return jax.vmap(fn)(planes)

    # The step is deliberately THREE XLA programs, not one. All data stays
    # on device between them; the boundaries exist because XLA's layout
    # assignment poisons mixed programs: with the U-Net's convolutions and
    # the multicut solver in one program, the solver section ran 30-150x
    # slower than the identical solver compiled alone (measured on v5e:
    # 0.37s standalone vs 52s fused for the sorted path, 0.31s vs 3.7s for
    # the hierarchical path). Splitting also matches training.cpp:164-175,
    # which runs solver+reward in a NoGrad block on its own stream.

    @jax.jit
    def forward_program(params, images):
        return _policy_forward(model, params, images, cfg)

    @functools.partial(jax.jit, static_argnames=("height", "width"))
    def solve_reward_program(key, step_idx, mu, sigma, images, image_sizes,
                             height, width):
        # sampling lives here, NOT in forward_program: threefry fused into
        # the conv program also caught the layout poison. The per-step key
        # derives from the base key + device step counter INSIDE the
        # program, so drivers pass a constant key (a host-side split/fold_in
        # costs a ~30 ms dispatch per step on the relay).
        key = jax.random.fold_in(key, step_idx)
        if antithetic:
            # [2B, E] mirrored pairs; reward every sample on its own image
            w = sample_antithetic_policy(key, mu, sigma).w
            images = jnp.concatenate([images, images], axis=0)
            image_sizes = jnp.concatenate([image_sizes, image_sizes], axis=0)
        else:
            w = sample_gaussian_policy(key, mu, sigma).w
        labels = segment(w, height, width)
        # minlabel: multicut labels are smallest-pixel-index connected
        # regions, enabling the sort-free segment-stats path
        rewards = compute_rewards_batched(
            images, labels, image_sizes, k_max=rw.max_segments,
            min_pixels=rw.min_pixels_per_segment, l_min=rw.l_min,
            beta=rw.beta, b_match_token=rw.b_match_token, gamma=rw.gamma,
            overhead_base=rw.overhead_base,
            adaptive_filter=rw.adaptive_filter,
            lam=rw.lambda_single_segment,
            entropy_correction=rw.entropy_correction,
            literal_hist=rw.literal_hist,
            distance_window=rw.distance_window,
            fallback_aware=rw.fallback_aware,
            fallback_reward_clip=rw.fallback_reward_clip,
            minlabel=produces_minlabel(height, width, mc.mode,
                                       mc.icm_sweeps))
        return w, rewards

    @jax.jit
    def update_program(state: RLState, w, images, rewards, mu_old,
                       sigma_old):
        # the EMA tracks mean reward in every mode (metric surface parity
        # with training.cpp:196-204 even when it isn't the baseline)
        baseline, binit = ema_baseline_update(
            state.baseline, state.baseline_init, rewards,
            r.baseline_momentum)
        value_params, value_opt = state.value_params, state.value_opt_state
        vloss = jnp.float32(0)
        if antithetic:
            # any per-image baseline cancels in the pair difference, so the
            # antithetic advantage subsumes both baseline modes
            adv = antithetic_advantage(rewards)
        elif use_value:
            def vloss_fn(vp):
                v = value_model.apply(vp, images)
                return jnp.mean((v - rewards) ** 2), v

            (vloss, v), vgrads = jax.value_and_grad(
                vloss_fn, has_aux=True)(value_params)
            vupd, value_opt = value_tx.update(vgrads, value_opt, value_params)
            value_params = optax.apply_updates(value_params, vupd)
            # advantage uses the PRE-update prediction (standard actor-critic
            # ordering); stop_gradient: the policy must not shape V
            adv = (whitened_advantage(rewards, jax.lax.stop_gradient(v))
                   if r.whiten else rewards - jax.lax.stop_gradient(v))
        else:
            adv = (whitened_advantage(rewards, baseline) if r.whiten
                   else rewards - baseline)

        # The gradient is identical to differentiating through the sampled
        # forward: loss depends on params only through logp/entropy of the
        # FIXED sample w (training.cpp:183-186).
        def loss_fn(params):
            mu, sigma = _policy_forward(model, params, images, cfg)
            if antithetic:
                mu = jnp.concatenate([mu, mu], axis=0)
                sigma = jnp.concatenate([sigma, sigma], axis=0)
            pol = gaussian_logp(w, mu, sigma)
            return reinforce_loss(adv, pol, mu.shape[-1], r.entropy_coef)

        if r.ppo_epochs > 0:
            # proximal variant (cfg.rl.ppo_epochs, documented divergence):
            # K clipped-surrogate steps reuse this batch's solver sample.
            # logp_old comes from the SAMPLING distribution (mu_old/sigma_old
            # out of forward_program — inputs here, so no gradient path).
            if antithetic:
                mu_old = jnp.concatenate([mu_old, mu_old], axis=0)
                sigma_old = jnp.concatenate([sigma_old, sigma_old], axis=0)
            logp_old_elem = gaussian_logp_elem(w, mu_old, sigma_old)

            def ppo_loss_fn(params):
                mu, sigma = _policy_forward(model, params, images, cfg)
                if antithetic:
                    mu = jnp.concatenate([mu, mu], axis=0)
                    sigma = jnp.concatenate([sigma, sigma], axis=0)
                return ppo_clip_loss(adv, w, mu, sigma, logp_old_elem,
                                     mu.shape[-1], r.ppo_clip,
                                     r.entropy_coef)

            params, opt_state = state.params, state.opt_state
            for _ in range(r.ppo_epochs):
                loss, grads = jax.value_and_grad(ppo_loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
        new_state = RLState(params, opt_state, state.step + 1, baseline,
                            binit, value_params, value_opt)
        aux = {"loss": loss, "reward_mean": rewards.mean(),
               "baseline": baseline, "value_loss": vloss}
        return new_state, aux

    def step(state: RLState, key: jax.Array, images: jnp.ndarray,
             image_sizes: jnp.ndarray):
        height, width = images.shape[1], images.shape[2]
        mu, sigma = forward_program(state.params, images)
        w, rewards = solve_reward_program(key, state.step, mu, sigma, images,
                                          image_sizes, height, width)
        return update_program(state, w, images, rewards, mu, sigma)

    return step


def make_rl_eval(model: EdgeUNet, cfg: Config):
    """Deterministic-mu evaluation (training.cpp:206-229)."""
    mc = cfg.multicut
    rw = cfg.reward

    @jax.jit
    def forward_program(params, images):
        mu, _ = _policy_forward(model, params, images, cfg)
        return mu

    @functools.partial(jax.jit, static_argnames=("height", "width"))
    def solve_reward_program(mu, images, image_sizes, height, width):
        planes = unflatten_edge_planes(mu, height, width)
        fn = functools.partial(multicut_grid, mode=mc.mode,
                               max_rounds=mc.max_rounds,
                               icm_sweeps=mc.icm_sweeps,
                               hier_rounds=(tuple(mc.hier_rounds)
                                            if mc.hier_rounds else None),
                               hier_caps=mc.hier_caps,
                               hier_agg=mc.hier_agg)
        labels = jax.vmap(fn)(planes)
        return compute_rewards_batched(
            images, labels, image_sizes, k_max=rw.max_segments,
            min_pixels=rw.min_pixels_per_segment, l_min=rw.l_min,
            beta=rw.beta, b_match_token=rw.b_match_token, gamma=rw.gamma,
            overhead_base=rw.overhead_base,
            adaptive_filter=rw.adaptive_filter,
            lam=rw.lambda_single_segment,
            entropy_correction=rw.entropy_correction,
            literal_hist=rw.literal_hist,
            distance_window=rw.distance_window,
            fallback_aware=rw.fallback_aware,
            fallback_reward_clip=rw.fallback_reward_clip,
            minlabel=produces_minlabel(height, width, mc.mode,
                                       mc.icm_sweeps))

    def evaluate(params, images, image_sizes):
        # two programs, same layout-poisoning rationale as make_rl_step
        height, width = images.shape[1], images.shape[2]
        mu = forward_program(params, images)
        return solve_reward_program(mu, images, image_sizes, height, width)

    return evaluate


def init_train_state(model: EdgeUNet, tx, key, sample_images) -> TrainState:
    params = model.init(key, sample_images)
    return TrainState(params, tx.init(params), jnp.asarray(0))


def init_rl_state(params, tx, value_params=(), value_tx=None) -> RLState:
    return RLState(params, tx.init(params), jnp.asarray(0),
                   jnp.asarray(0.0), jnp.asarray(False), value_params,
                   value_tx.init(value_params) if value_tx is not None else ())
