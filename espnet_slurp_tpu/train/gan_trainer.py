"""GAN trainer: alternating generator/discriminator updates.

Parity target: reference espnet2/train/gan_trainer.py:77-309 (GANTrainer
with num_optimizers=2 for GAN-TTS). Both updates are jitted; each step runs
D then G (reference order), sharing one forward of the generator.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    rng: jax.Array

    @classmethod
    def create(cls, gen_params, disc_params, gen_tx, disc_tx, rng):
        return cls(step=jnp.zeros((), jnp.int32),
                   gen_params=gen_params, disc_params=disc_params,
                   gen_opt=gen_tx.init(gen_params),
                   disc_opt=disc_tx.init(disc_params), rng=rng)


class PackedGANState(struct.PyTreeNode):
    """TrainState-shaped view of a GANTrainState so CheckpointManager
    (which persists params/opt_state/step/rng) can save/restore GAN runs."""
    params: Any
    opt_state: Any
    step: Any
    rng: Any


def pack_gan_state(state: GANTrainState) -> PackedGANState:
    return PackedGANState(
        params={"gen": state.gen_params, "disc": state.disc_params},
        opt_state={"gen": state.gen_opt, "disc": state.disc_opt},
        step=state.step, rng=state.rng)


def unpack_gan_state(packed: PackedGANState) -> GANTrainState:
    return GANTrainState(
        step=packed.step, gen_params=packed.params["gen"],
        disc_params=packed.params["disc"], gen_opt=packed.opt_state["gen"],
        disc_opt=packed.opt_state["disc"], rng=packed.rng)


def make_gan_train_step(
    generator_apply: Callable,      # (gen_params, batch) -> fake wav
    discriminator_apply: Callable,  # (disc_params, wav) -> disc outs
    gen_loss_fn: Callable,          # (fake, real, fake_outs, real_outs) -> (loss, stats)
    disc_loss_fn: Callable,         # (real_outs, fake_outs) -> loss
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
) -> Callable:
    """Returns jitted (state, batch{..., 'wav_real'}) -> (state, stats)."""

    def step(state: GANTrainState, batch: Dict[str, jnp.ndarray]):
        rng, _ = jax.random.split(state.rng)
        real = batch["wav_real"]

        # --- discriminator update (generator frozen) ---
        fake = generator_apply(state.gen_params, batch)
        fake = jax.lax.stop_gradient(fake)

        def d_loss(dp):
            real_outs = discriminator_apply(dp, real)
            fake_outs = discriminator_apply(dp, fake)
            return disc_loss_fn(real_outs, fake_outs)

        dl, d_grads = jax.value_and_grad(d_loss)(state.disc_params)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        # --- generator update (new discriminator frozen) ---
        def g_loss(gp):
            fake = generator_apply(gp, batch)
            fake_outs = discriminator_apply(disc_params, fake)
            real_outs = jax.tree.map(
                jax.lax.stop_gradient, discriminator_apply(disc_params,
                                                           real))
            return gen_loss_fn(fake, real, fake_outs, real_outs)

        (gl, gstats), g_grads = jax.value_and_grad(
            g_loss, has_aux=True)(state.gen_params)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                           state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        stats = dict(gstats)
        stats["disc_loss"] = dl
        stats["gen_loss"] = gl
        return state.replace(step=state.step + 1, gen_params=gen_params,
                             disc_params=disc_params, gen_opt=gen_opt,
                             disc_opt=disc_opt, rng=rng), stats

    return jax.jit(step)
