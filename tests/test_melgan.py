"""MelGAN / StyleMelGAN vocoder tests (tiny dims)."""
import numpy as np
import jax
import jax.numpy as jnp

from espnet_slurp_tpu.train.gan_trainer import (GANTrainState,
                                                make_gan_train_step)
from espnet_slurp_tpu.tts.hifigan import (discriminator_adv_loss,
                                          feature_matching_loss,
                                          generator_adv_loss)
from espnet_slurp_tpu.tts.melgan import (MelGANConfig, MelGANDiscriminator,
                                         MelGANGenerator, StyleMelGANConfig,
                                         StyleMelGANDiscriminator,
                                         StyleMelGANGenerator,
                                         multi_resolution_stft_loss)

MCFG = MelGANConfig(in_channels=16, base_channels=64,
                    upsample_rates=(4, 4, 2, 2), stacks=2, scales=2)
SCFG = StyleMelGANConfig(in_channels=16, noise_dim=8, channels=16,
                         upsample_rates=(4, 4, 2, 2), kernel=5,
                         windows=(128, 256))


def test_melgan_generator_shapes():
    gen = MelGANGenerator(MCFG)
    mel = jnp.zeros((2, 10, 16))
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (2, 10 * 64)
    assert (np.abs(np.asarray(wav)) <= 1.0).all()


def test_melgan_discriminator_and_mrstft():
    disc = MelGANDiscriminator(MCFG)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 640), jnp.float32)
    params = disc.init(jax.random.PRNGKey(0), wav)["params"]
    outs = disc.apply({"params": params}, wav)
    assert len(outs) == MCFG.scales
    for score, feats in outs:
        assert score.ndim == 2 and len(feats) == 7
    # multi-resolution STFT loss: zero on identical, positive on different
    same = multi_resolution_stft_loss(wav, wav,
                                      resolutions=((256, 64), (128, 32)))
    diff = multi_resolution_stft_loss(
        wav, jnp.asarray(rng.randn(2, 640), jnp.float32),
        resolutions=((256, 64), (128, 32)))
    assert float(same) < 1e-5
    assert float(diff) > float(same)


def test_style_melgan_generator():
    gen = StyleMelGANGenerator(SCFG)
    mel = jnp.zeros((2, 6, 16))
    noise = jnp.asarray(np.random.RandomState(0).randn(2, 6, 8), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel, noise)["params"]
    wav = gen.apply({"params": params}, mel, noise)
    assert wav.shape == (2, 6 * 64)
    # Same noise -> deterministic; different noise -> different waveform.
    wav2 = gen.apply({"params": params}, mel, noise)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2))
    noise3 = jnp.asarray(np.random.RandomState(1).randn(2, 6, 8), jnp.float32)
    wav3 = gen.apply({"params": params}, mel, noise3)
    assert np.abs(np.asarray(wav) - np.asarray(wav3)).max() > 1e-6


def test_style_melgan_discriminator_windows():
    disc = StyleMelGANDiscriminator(SCFG)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 384), jnp.float32)
    params = disc.init({"params": jax.random.PRNGKey(0),
                        "windows": jax.random.PRNGKey(1)}, wav)["params"]
    outs = disc.apply({"params": params}, wav,
                      rngs={"windows": jax.random.PRNGKey(2)})
    assert len(outs) == len(SCFG.windows)
    # window sizes are static: first window 128 -> conv stack shrinks it
    assert outs[0][0].shape[0] == 2


def test_melgan_gan_train_step():
    import optax
    gen = MelGANGenerator(MCFG)
    disc = MelGANDiscriminator(MCFG)
    rng = np.random.RandomState(1)
    mel = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
    wav_real = jnp.asarray(rng.randn(2, 8 * 64) * 0.1, jnp.float32)
    gp = gen.init(jax.random.PRNGKey(0), mel)["params"]
    dp = disc.init(jax.random.PRNGKey(1), wav_real)["params"]
    gen_tx, disc_tx = optax.adam(1e-4), optax.adam(1e-4)

    def gen_apply(p, batch):
        return gen.apply({"params": p}, batch["mel"])

    def disc_apply(p, wav):
        return disc.apply({"params": p}, wav)

    def gen_loss(fake, real, fake_outs, real_outs):
        adv = generator_adv_loss(fake_outs)
        fm = feature_matching_loss(real_outs, fake_outs)
        mr = multi_resolution_stft_loss(fake, real,
                                        resolutions=((256, 64), (128, 32)))
        loss = adv + 2.0 * fm + mr
        return loss, {"adv": adv, "fm": fm, "mrstft": mr, "loss": loss}

    step = make_gan_train_step(gen_apply, disc_apply, gen_loss,
                               discriminator_adv_loss, gen_tx, disc_tx)
    state = GANTrainState.create(gp, dp, gen_tx, disc_tx,
                                 jax.random.PRNGKey(2))
    batch = {"mel": mel, "wav_real": wav_real}
    for _ in range(2):
        state, stats = step(state, batch)
    assert np.isfinite(float(stats["gen_loss"]))
    assert np.isfinite(float(stats["disc_loss"]))


def test_vocoder_task_e2e(tmp_path):
    """Train a tiny MelGAN vocoder (arch=melgan), then run tacotron2 TTS
    inference through it via Text2Speech(vocoder_exp_dir=...)."""
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.tts import (Text2Speech, TTSDataConfig,
                                            TTSTask, TTSTaskConfig)
    from espnet_slurp_tpu.tts.tacotron2 import Tacotron2Config
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=4, n_dev=2)
    fc = FrontendConfig(n_fft=128, hop_length=64, n_mels=16)
    voc_cfg = TTSTaskConfig(
        exp_dir=str(tmp_path / "voc"),
        arch="melgan",
        melgan=MelGANConfig(base_channels=32, upsample_rates=(4, 4, 2, 2),
                            stacks=1, scales=2),
        vocoder_segment_frames=16,
        optim=OptimConfig(lr=1e-4, scheduler="constant"),
        data=TTSDataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                           batch_size=4, frontend=fc),
        max_epoch=1, keep_nbest=1)
    state = TTSTask.train(voc_cfg)
    assert int(state.step) > 0

    taco = Tacotron2Config(
        vocab_size=30, n_mels=16, embed_dim=16, enc_conv_layers=1,
        enc_conv_channels=16, enc_lstm_units=16, prenet_layers=1,
        prenet_units=16, dec_lstm_units=32, dec_lstm_layers=1, att_dim=16,
        att_conv_channels=4, att_conv_kernel=7, postnet_layers=2,
        postnet_channels=16, postnet_kernel=3)
    tts_cfg = TTSTaskConfig(
        exp_dir=str(tmp_path / "tts"),
        arch="tacotron2", tacotron2=taco,
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=TTSDataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                           batch_size=4, frontend=fc,
                           mel_bucket_multiple=32),
        max_epoch=1, keep_nbest=1)
    TTSTask.train(tts_cfg)
    t2s = Text2Speech(tts_cfg.exp_dir, vocoder_exp_dir=voc_cfg.exp_dir)
    mel, wav = t2s("alpha bravo", max_frames=24)
    assert wav is not None and np.isfinite(wav).all()
    assert len(wav) == mel.shape[0] * 64  # hop upsampling


def test_parallel_wavegan_generator_and_disc():
    from espnet_slurp_tpu.tts.melgan import (ParallelWaveGANConfig,
                                             ParallelWaveGANDiscriminator,
                                             ParallelWaveGANGenerator)
    cfg = ParallelWaveGANConfig(in_channels=16, layers=4, stacks=2,
                                residual_channels=8, gate_channels=16,
                                skip_channels=8,
                                upsample_rates=(4, 4, 2, 2),
                                disc_layers=4, disc_channels=8)
    gen = ParallelWaveGANGenerator(cfg)
    mel = jnp.zeros((2, 6, 16))
    rng = np.random.RandomState(0)
    noise = jnp.asarray(rng.randn(2, 6 * 64, 1), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel, noise)["params"]
    wav = gen.apply({"params": params}, mel, noise)
    assert wav.shape == (2, 6 * 64)
    # deterministic given noise; stochastic via the rng stream
    wav2 = gen.apply({"params": params}, mel, noise)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2))
    wav3 = gen.apply({"params": params}, mel,
                     rngs={"noise": jax.random.PRNGKey(5)})
    assert wav3.shape == wav.shape
    disc = ParallelWaveGANDiscriminator(cfg)
    dp = disc.init(jax.random.PRNGKey(1), wav)["params"]
    outs = disc.apply({"params": dp}, wav)
    assert len(outs) == 1
    score, feats = outs[0]
    assert score.shape == (2, 6 * 64) and len(feats) == cfg.disc_layers


def test_parallel_wavegan_task_step(tmp_path):
    """arch=parallel_wavegan trains one epoch through the vocoder loop."""
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.tts import (TTSDataConfig, TTSTask,
                                            TTSTaskConfig)
    from espnet_slurp_tpu.train.optim import OptimConfig
    from espnet_slurp_tpu.tts.melgan import ParallelWaveGANConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=4, n_dev=2)
    fc = FrontendConfig(n_fft=128, hop_length=64, n_mels=16)
    cfg = TTSTaskConfig(
        exp_dir=str(tmp_path / "pwg"),
        arch="parallel_wavegan",
        parallel_wavegan=ParallelWaveGANConfig(
            layers=4, stacks=2, residual_channels=8, gate_channels=16,
            skip_channels=8, upsample_rates=(4, 4, 2, 2), disc_layers=3,
            disc_channels=8),
        vocoder_segment_frames=16,
        optim=OptimConfig(lr=1e-4, scheduler="constant"),
        data=TTSDataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                           batch_size=4, frontend=fc),
        max_epoch=1, keep_nbest=1)
    state = TTSTask.train(cfg)
    assert int(state.step) > 0
