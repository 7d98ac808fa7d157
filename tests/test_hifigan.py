"""HiFiGAN + GAN trainer tests (tiny dims)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.train.gan_trainer import (GANTrainState,
                                                make_gan_train_step)
from espnet_slurp_tpu.tts.hifigan import (HiFiGANConfig, HiFiGANDiscriminator,
                                          HiFiGANGenerator,
                                          discriminator_adv_loss,
                                          feature_matching_loss,
                                          generator_adv_loss, mel_l1_loss)

CFG = HiFiGANConfig(in_channels=16, base_channels=32,
                    upsample_rates=(4, 4, 2, 2), upsample_kernels=(8, 8, 4, 4),
                    resblock_kernels=(3,), resblock_dilations=((1, 3),),
                    periods=(2, 3), scales=2)


def test_generator_shapes():
    gen = HiFiGANGenerator(CFG)
    mel = jnp.zeros((2, 10, 16))
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (2, 10 * 4 * 4 * 2 * 2)  # T * prod(rates)
    assert (np.abs(np.asarray(wav)) <= 1.0).all()


def test_discriminator_and_losses():
    disc = HiFiGANDiscriminator(CFG)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 640), jnp.float32)
    params = disc.init(jax.random.PRNGKey(0), wav)["params"]
    outs = disc.apply({"params": params}, wav)
    assert len(outs) == len(CFG.periods) + CFG.scales
    g_adv = generator_adv_loss(outs)
    d_adv = discriminator_adv_loss(outs, outs)
    fm = feature_matching_loss(outs, outs)
    assert np.isfinite(float(g_adv)) and np.isfinite(float(d_adv))
    assert float(fm) == 0.0  # identical features


def test_gan_train_step():
    import optax
    gen = HiFiGANGenerator(CFG)
    disc = HiFiGANDiscriminator(CFG)
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
    wav_real = jnp.asarray(rng.randn(2, 8 * 64) * 0.1, jnp.float32)
    gp = gen.init(jax.random.PRNGKey(0), mel)["params"]
    dp = disc.init(jax.random.PRNGKey(1), wav_real)["params"]
    gen_tx = optax.adam(2e-4)
    disc_tx = optax.adam(2e-4)

    def gen_apply(p, batch):
        return gen.apply({"params": p}, batch["mel"])

    def disc_apply(p, wav):
        return disc.apply({"params": p}, wav)

    def gen_loss(fake, real, fake_outs, real_outs):
        adv = generator_adv_loss(fake_outs)
        fm = feature_matching_loss(real_outs, fake_outs)
        mel_l = mel_l1_loss(fake, real, n_fft=128, hop=64, n_mels=16)
        loss = adv + 2.0 * fm + 45.0 * mel_l
        return loss, {"adv": adv, "fm": fm, "mel": mel_l, "loss": loss}

    step = make_gan_train_step(gen_apply, disc_apply, gen_loss,
                               discriminator_adv_loss, gen_tx, disc_tx)
    state = GANTrainState.create(gp, dp, gen_tx, disc_tx,
                                 jax.random.PRNGKey(2))
    batch = {"mel": mel, "wav_real": wav_real}
    for _ in range(2):
        state, stats = step(state, batch)
    assert np.isfinite(float(stats["gen_loss"]))
    assert np.isfinite(float(stats["disc_loss"]))
    assert int(state.step) == 2
