"""Optimizers and LR schedules as optax chains.

Parity targets: reference espnet2/schedulers/warmup_lr.py (WarmupLR: lr *
warmup^0.5 * min(step^-0.5, step*warmup^-1.5) — Noam without the d_model
factor), espnet2/optimizers (adam/adamw/sgd...), and the Trainer's per-step
grad machinery (accum_grad, clip_grad_norm, grad noise — trainer.py:608-706)
which here becomes optax transformations inside the jitted step.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    # adam | adamw | sgd (momentum below) | adadelta (espnet1's default for
    # RNN/LAS models, asr.py train --opt adadelta) | adagrad | rmsprop
    name: str = "adam"
    lr: float = 2e-3
    # warmuplr | noam | warmup_step (warmup_step_lr.py: warmuplr with
    # staircase decay every steps_per_decay) | exponential | cosine |
    # constant
    scheduler: str = "warmuplr"
    warmup_steps: int = 25000
    d_model: int = 256  # used by "noam"
    decay_rate: float = 0.96      # exponential / warmup_step decay factor
    decay_steps: int = 10000      # exponential/cosine horizon, step period
    momentum: float = 0.0         # sgd momentum / rmsprop decay-momentum
    rho: float = 0.95             # adadelta decay
    weight_decay: float = 0.0
    betas: tuple = (0.9, 0.98)
    eps: float = 1e-9
    grad_clip: float = 5.0
    accum_grad: int = 1
    grad_noise_eta: float = 0.0   # trainer.py add_gradient_noise analogue
    ema_decay: float = 0.0        # v1 EMA wrapper analogue (asr.py:713-715)
    # Divergence guard: skip updates whose grad norm exceeds spike_factor x
    # the accepted-step EMA (train/state.py). 0 disables.
    spike_factor: float = 10.0


def build_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.scheduler == "constant":
        return lambda step: cfg.lr
    if cfg.scheduler == "warmuplr":
        def sched(step):
            s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
            return cfg.lr * cfg.warmup_steps**0.5 * jnp.minimum(
                s**-0.5, s * cfg.warmup_steps**-1.5)
        return sched
    if cfg.scheduler == "noam":
        def sched(step):
            s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
            return cfg.lr * cfg.d_model**-0.5 * jnp.minimum(
                s**-0.5, s * cfg.warmup_steps**-1.5)
        return sched
    if cfg.scheduler == "warmup_step":
        # warmup_step_lr.py: warmuplr shape, then staircase ×decay_rate
        # every decay_steps after warmup.
        def sched(step):
            s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
            base = cfg.lr * cfg.warmup_steps**0.5 * jnp.minimum(
                s**-0.5, s * cfg.warmup_steps**-1.5)
            k = jnp.floor(jnp.maximum(s - cfg.warmup_steps, 0.0)
                          / cfg.decay_steps)
            return base * cfg.decay_rate**k
        return sched
    if cfg.scheduler == "exponential":
        def sched(step):
            s = jnp.asarray(step, jnp.float32)
            return cfg.lr * cfg.decay_rate ** (s / cfg.decay_steps)
        return sched
    if cfg.scheduler == "cosine":
        def sched(step):
            s = jnp.minimum(jnp.asarray(step, jnp.float32),
                            float(cfg.decay_steps))
            return cfg.lr * 0.5 * (1.0 + jnp.cos(
                jnp.pi * s / cfg.decay_steps))
        return sched
    raise ValueError(f"unknown scheduler {cfg.scheduler}")


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    sched = build_schedule(cfg)
    if cfg.name in ("adam", "adamw"):
        core = optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1],
                                   eps=cfg.eps)
    elif cfg.name == "sgd":
        core = optax.trace(decay=cfg.momentum) if cfg.momentum > 0 \
            else optax.identity()
    elif cfg.name == "adadelta":
        # espnet1's default for LAS/RNN models (asr.py --opt adadelta).
        core = optax.scale_by_adadelta(rho=cfg.rho, eps=max(cfg.eps, 1e-8))
    elif cfg.name == "adagrad":
        core = optax.scale_by_rss(initial_accumulator_value=0.0,
                                  eps=max(cfg.eps, 1e-8))
    elif cfg.name == "rmsprop":
        core = optax.scale_by_rms(decay=0.99, eps=max(cfg.eps, 1e-8))
    else:
        raise ValueError(f"unknown optimizer {cfg.name}")
    parts = []
    # NOTE: grad_noise_eta and ema_decay are intentionally NOT part of this
    # chain. Gradient noise needs the per-step train rng (a fixed optax seed
    # would redraw identical noise every run) and EMA must be a shadow copy
    # of params for eval — not a smoothing of applied updates. Both live in
    # train/state.py:make_train_step.
    if cfg.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip))
    parts.append(core)
    if cfg.weight_decay > 0:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(optax.scale_by_learning_rate(sched))
    tx = optax.chain(*parts)
    if cfg.accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_grad)
    return tx
