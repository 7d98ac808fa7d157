"""JETS tests: forward-sum loss vs brute force, alignment module shapes,
GAN train-step smoke, inference, and task-level e2e (arch: jets).

Parity target: reference espnet2/gan_tts/jets/ (generator/loss/alignments).
"""
import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.ops.pitch import autocorr_f0
from espnet_slurp_tpu.tts.hifigan import HiFiGANConfig, HiFiGANDiscriminator
from espnet_slurp_tpu.tts.jets import (JETSConfig, JETSGenerator,
                                       average_by_duration,
                                       forward_sum_loss, jets_features,
                                       make_jets_train_step)

TINY = JETSConfig(
    vocab_size=30, d_model=16, n_head=2, d_ff=32, enc_blocks=1,
    dec_blocks=1, var_channels=8, var_layers=1, segment_size=4,
    sample_rate=16000, max_frames=64,
    frontend=FrontendConfig(n_fft=64, hop_length=16, n_mels=8),
    hifigan=HiFiGANConfig(
        in_channels=16, base_channels=16, upsample_rates=(4, 4),
        upsample_kernels=(8, 8), resblock_kernels=(3,),
        resblock_dilations=((1, 3),), periods=(2, 3), scales=2))

TINY_DISC = HiFiGANConfig(
    in_channels=16, base_channels=4, periods=(2, 3), scales=2)


def _forward_sum_brute(lp, f_len, l_len):
    """-log sum over all monotonic surjective paths, by enumeration."""
    total = -np.inf
    # compositions of f_len frames into l_len positive parts
    for cuts in itertools.combinations(range(1, f_len), l_len - 1):
        bounds = (0,) + cuts + (f_len,)
        s = 0.0
        for l in range(l_len):
            for t in range(bounds[l], bounds[l + 1]):
                s += lp[t, l]
        total = np.logaddexp(total, s)
    return -total / f_len


def test_forward_sum_matches_brute_force():
    rng = np.random.RandomState(0)
    f, l = 6, 3
    raw = rng.randn(2, f, l).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(raw), axis=-1))
    got = float(forward_sum_loss(jnp.asarray(lp), jnp.asarray([l, l]),
                                 jnp.asarray([f, f])))
    want = np.mean([_forward_sum_brute(lp[i], f, l) for i in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_average_by_duration():
    # alignment: first 2 frames -> token 0, next 3 -> token 1
    attn = np.zeros((1, 5, 2), np.float32)
    attn[0, :2, 0] = 1
    attn[0, 2:, 1] = 1
    xs = np.asarray([[1.0, 3.0, 5.0, 7.0, 9.0]], np.float32)
    mask = jnp.ones((1, 5), bool)
    avg = np.asarray(average_by_duration(jnp.asarray(attn),
                                         jnp.asarray(xs), mask))
    np.testing.assert_allclose(avg[0], [2.0, 7.0])


def _tiny_batch(rng, b=2, n=1024, l=5):
    return {
        "text": jnp.asarray(rng.randint(1, 30, (b, l)), jnp.int32),
        "text_lengths": jnp.asarray([l, l - 2], jnp.int32),
        "speech": jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([n, n - 256], jnp.int32),
    }


def test_jets_gan_train_step_and_infer():
    import optax
    from espnet_slurp_tpu.train.gan_trainer import GANTrainState
    rng = np.random.RandomState(1)
    batch = _tiny_batch(rng)
    gen = JETSGenerator(TINY)
    disc = HiFiGANDiscriminator(TINY_DISC)
    feats, flens, lf0 = jets_features(batch["speech"],
                                      batch["speech_lengths"], TINY)
    key = jax.random.PRNGKey(0)
    gp = gen.init(key, batch["text"], batch["text_lengths"], feats, flens,
                  lf0, key)["params"]
    fake0 = jnp.zeros((1, TINY.segment_size * TINY.hop_length))
    dp = disc.init(jax.random.PRNGKey(1), fake0)["params"]
    tx = optax.adam(1e-4)
    state = GANTrainState.create(gp, dp, tx, tx, jax.random.PRNGKey(2))
    step = make_jets_train_step(gen, disc, tx, tx, TINY)
    state, stats = step(state, batch)
    for k in ("gen_loss", "disc_loss", "mel_loss", "dur_loss", "pitch_loss",
              "energy_loss", "forwardsum_loss", "bin_loss"):
        assert np.isfinite(float(stats[k])), (k, stats[k])
    wav, wav_lens = gen.apply(
        {"params": state.gen_params}, batch["text"], batch["text_lengths"],
        method=lambda m, x, xl: m.infer(x, xl, max_frames=16))
    assert wav.shape == (2, 16 * TINY.hop_length)
    assert int(wav_lens[0]) > 0
    assert np.isfinite(np.asarray(wav)).all()


def test_jets_task_e2e(tmp_path):
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.tasks.tts import TTSTask, Text2Speech, \
        load_tts_config
    make_mini_corpus(tmp_path / "data", n_train=4, n_dev=2)
    cfg = load_tts_config(overrides={
        "exp_dir": str(tmp_path / "exp"),
        "arch": "jets",
        "jets": {
            "d_model": 16, "n_head": 2, "d_ff": 32, "enc_blocks": 1,
            "dec_blocks": 1, "var_channels": 8, "var_layers": 1,
            "segment_size": 4, "sample_rate": 16000, "max_frames": 64,
            "hifigan": {
                "in_channels": 16, "base_channels": 16,
                "upsample_rates": [4, 4], "upsample_kernels": [8, 8],
                "resblock_kernels": [3], "resblock_dilations": [[1, 3]],
                "periods": [2, 3], "scales": 2},
        },
        "discriminator": {"in_channels": 16, "base_channels": 4,
                          "periods": [2, 3], "scales": 2},
        "data": {"train_dir": str(tmp_path / "data/train"),
                 "valid_dir": str(tmp_path / "data/dev"),
                 "batch_size": 2,
                 "frontend": {"n_fft": 64, "hop_length": 16, "n_mels": 8}},
        "max_epoch": 1,
    })
    TTSTask.train(cfg)
    t2s = Text2Speech(cfg.exp_dir)
    mel, wav = t2s("hello world", max_frames=30)
    assert wav is not None and wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()
