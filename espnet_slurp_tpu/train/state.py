"""TrainState pytree + jitted train/eval step factories.

TPU-native replacement for the reference Trainer's per-step machinery
(espnet2/train/trainer.py:463-720): the whole step — frontend, SpecAug,
encoder/decoder forward, losses, backward, clip, optimizer update — is ONE
jit-compiled function over a (data, model) mesh. Gradient sync is implicit:
params are replicated, batch is data-sharded, so GSPMD inserts the
all-reduce that DDP did by hand. Invalid-gradient skipping (trainer.py:651-667)
becomes a jnp.where on the update; AMP GradScaler is unnecessary in bf16.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    # Shadow EMA copy of params for eval/checkpoint (v1 EMA wrapper analogue,
    # asr.py:713-715). None unless ema_decay > 0; the live params and the
    # update dynamics are untouched by it.
    ema_params: Any = None
    # Divergence-guard state (one step past reference trainer.py:651-670):
    # lr_scale multiplies every update (epoch-level LR backoff after a
    # rollback); gnorm_ema tracks the accepted-step grad-norm so spikes
    # (gnorm >> ema) can be skipped before they poison the optimizer.
    lr_scale: Any = None
    gnorm_ema: Any = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng: jax.Array,
               ema: bool = False, guard: bool = False):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), rng=rng,
                   ema_params=jax.tree.map(jnp.copy, params) if ema else None,
                   lr_scale=jnp.ones((), jnp.float32) if guard else None,
                   gnorm_ema=jnp.zeros((), jnp.float32) if guard else None)

    @property
    def eval_params(self):
        return self.params if self.ema_params is None else self.ema_params


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mvn_stats=None,
    donate: bool = True,
    grad_noise_eta: float = 0.0,
    ema_decay: float = 0.0,
    aux_loss_fn: Optional[Callable] = None,
    apply_fn: Optional[Callable] = None,
    spike_factor: float = 0.0,
    compile: bool = True,
) -> Callable:
    """Build the jitted train step: (state, batch) -> (state, stats).

    ``batch`` is a dict of model.__call__ kwargs (speech, speech_lengths,
    text, text_lengths, [transcript, ...]), already device-side (sharded
    along the batch dim on a mesh, or single-device).

    ``aux_loss_fn(params, batch) -> (loss, stats)`` composes an extra
    differentiable objective into the same step (e.g. MBR expected risk,
    train/mbr.py).

    ``apply_fn(params, batch, dropout_rng, specaug_rng) -> (loss, stats)``
    overrides the default model.apply call for models whose __call__ does
    not take the ASR kwargs (enh/diar/hubert/mt tasks).
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, specaug_rng, dropout_rng, noise_rng = jax.random.split(
            state.rng, 4)
        # Fold in step so each step draws fresh augmentation noise even
        # though state.rng is only split per call.
        specaug_rng = jax.random.fold_in(specaug_rng, state.step)

        def loss_fn(params):
            if apply_fn is not None:
                loss, stats = apply_fn(params, batch, dropout_rng,
                                       specaug_rng)
            else:
                loss, stats = model.apply(
                    {"params": params}, train=True, specaug_rng=specaug_rng,
                    mvn_stats=mvn_stats, rngs={"dropout": dropout_rng},
                    **batch)
            if aux_loss_fn is not None:
                aux, aux_stats = aux_loss_fn(params, batch)
                loss = loss + aux
                stats = {**stats, **aux_stats, "loss": loss}
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        if grad_noise_eta > 0:
            # Annealed gaussian gradient noise, sigma^2 = eta/(1+step)^0.55
            # (torch_utils/add_gradient_noise.py), drawn from the per-step
            # train rng so each run/step sees fresh noise.
            noise_rng = jax.random.fold_in(noise_rng, state.step)
            sigma = jnp.sqrt(grad_noise_eta /
                             (1.0 + state.step.astype(jnp.float32)) ** 0.55)
            leaves = jax.tree.leaves(grads)
            keys = jax.random.split(noise_rng, len(leaves))
            key_tree = jax.tree.unflatten(jax.tree.structure(grads),
                                          list(keys))
            grads = jax.tree.map(
                lambda g, k: g + sigma * jax.random.normal(k, g.shape,
                                                           g.dtype),
                grads, key_tree)
        # Skip non-finite updates (trainer.py:651-667 analogue).
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        new_gnorm_ema = state.gnorm_ema
        spiked = jnp.zeros((), jnp.float32)
        if spike_factor > 0 and state.gnorm_ema is not None:
            # Grad-norm spike skip (divergence guard, one step past the
            # reference's non-finite skip): once the accepted-step EMA is
            # warm, an update whose norm exceeds spike_factor x EMA is
            # dropped whole — clip-by-norm still applies it at full clip
            # magnitude, which is exactly how the observed epoch-16 blowup
            # (grad_norm 4 -> 512 over 5 epochs) compounds.
            warm = state.step > 20
            spike = warm & (gnorm > spike_factor *
                            jnp.maximum(state.gnorm_ema, 1e-6))
            ok = ok & ~spike
            spiked = spike.astype(jnp.float32)
            new_gnorm_ema = jnp.where(
                ok, jnp.where(state.step == 0, gnorm,
                              0.95 * state.gnorm_ema + 0.05 * gnorm),
                state.gnorm_ema)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if state.lr_scale is not None:
            # Epoch-level LR backoff (Trainer guard rollback) scales the
            # final update, leaving optimizer moments untouched.
            updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_params, state.params)
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old) if
            isinstance(new, jnp.ndarray) and new.shape == old.shape else new,
            new_opt, state.opt_state)
        new_ema = state.ema_params
        if ema_decay > 0 and new_ema is not None:
            new_ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                new_ema, new_params)
        stats = dict(stats)
        stats["grad_norm"] = gnorm
        stats["skipped"] = 1.0 - ok.astype(jnp.float32)
        if spike_factor > 0 and state.gnorm_ema is not None:
            stats["spike_skipped"] = spiked
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt, rng=rng,
                             ema_params=new_ema,
                             gnorm_ema=new_gnorm_ema), stats

    if not compile:
        # Raw traceable step for callers that fuse several steps into one
        # device program (e.g. bench.py lax.scan chaining, which amortizes
        # per-step dispatch on remote transports).
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mvn_stats=None, apply_fn: Optional[Callable] = None
                   ) -> Callable:
    def step_fn(state: TrainState, batch):
        # Evaluate the EMA shadow weights when enabled (live params
        # otherwise) — matching the v1 EMA wrapper's eval semantics.
        if apply_fn is not None:
            loss, stats = apply_fn(state.eval_params, batch)
        else:
            loss, stats = model.apply(
                {"params": state.eval_params}, train=False,
                mvn_stats=mvn_stats, **batch)
        return stats
    return jax.jit(step_fn)
