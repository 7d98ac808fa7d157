"""TTS tests: Tacotron2 + FastSpeech2 forward/loss/inference, length
regulator, istft round trip, Griffin-Lim smoke."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.tts import (FastSpeech2, FastSpeech2Config, Tacotron2,
                                  Tacotron2Config, griffin_lim, istft,
                                  length_regulate)

TACO = Tacotron2Config(
    vocab_size=30, n_mels=16, embed_dim=16, enc_conv_layers=1,
    enc_conv_channels=16, enc_lstm_units=16, prenet_layers=1,
    prenet_units=16, dec_lstm_units=32, dec_lstm_layers=1, att_dim=16,
    att_conv_channels=4, att_conv_kernel=7, postnet_layers=2,
    postnet_channels=16, postnet_kernel=3)

FS2 = FastSpeech2Config(
    vocab_size=30, n_mels=16, d_model=32, n_head=2, d_ff=64, enc_blocks=1,
    dec_blocks=1, var_channels=16, var_layers=1, max_frames=64)


def _tts_batch(b=2, l=6, t=20, n_mels=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "text": jnp.asarray(rng.randint(1, 29, size=(b, l))),
        "text_lengths": jnp.asarray([l, l - 2]),
        "mel": jnp.asarray(rng.randn(b, t, n_mels).astype(np.float32)),
        "mel_lengths": jnp.asarray([t, t - 6]),
    }


def test_tacotron2_train_and_infer():
    model = Tacotron2(TACO)
    batch = _tts_batch()
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, **batch)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"l1_loss", "mse_loss", "bce_loss"} <= set(stats)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))

    mel, lens = model.apply({"params": params}, batch["text"],
                            batch["text_lengths"], 40,
                            method=lambda m, t, tl, mf: m.inference(t, tl, mf))
    assert mel.shape == (2, 40, 16)
    assert (np.asarray(lens) <= 40).all()


def test_length_regulate():
    x = jnp.asarray(np.arange(2 * 3 * 4, dtype=np.float32
                              ).reshape(2, 3, 4))
    dur = jnp.asarray([[2, 1, 3], [1, 0, 2]])
    frames, total = length_regulate(x, dur, max_frames=8)
    np.testing.assert_array_equal(np.asarray(total), [6, 3])
    f = np.asarray(frames)
    # example 0: tokens 0,0,1,2,2,2 then zeros
    np.testing.assert_allclose(f[0, 0], np.asarray(x[0, 0]))
    np.testing.assert_allclose(f[0, 1], np.asarray(x[0, 0]))
    np.testing.assert_allclose(f[0, 2], np.asarray(x[0, 1]))
    np.testing.assert_allclose(f[0, 3], np.asarray(x[0, 2]))
    np.testing.assert_allclose(f[0, 6:], 0.0)
    # example 1: token 1 has zero duration -> skipped
    np.testing.assert_allclose(f[1, 0], np.asarray(x[1, 0]))
    np.testing.assert_allclose(f[1, 1], np.asarray(x[1, 2]))


def test_fastspeech2_train_and_infer():
    model = FastSpeech2(FS2)
    batch = _tts_batch(t=24)
    rng = np.random.RandomState(1)
    dur = rng.randint(1, 5, size=(2, 6))
    # make durations sum within mel length
    batch2 = dict(batch)
    batch2["durations"] = jnp.asarray(dur)
    batch2["pitch"] = jnp.asarray(rng.randn(2, 6).astype(np.float32))
    batch2["energy"] = jnp.asarray(rng.randn(2, 6).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), **batch2)["params"]

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, **batch2)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"l1_loss", "duration_loss", "pitch_loss",
            "energy_loss"} <= set(stats)

    mel, total = model.apply(
        {"params": params}, batch["text"], batch["text_lengths"],
        method=lambda m, t, tl: m.inference(t, tl))
    assert mel.shape[0] == 2 and mel.shape[2] == 16
    assert (np.asarray(total) > 0).all()


def test_istft_roundtrip():
    from espnet_slurp_tpu.ops.stft import stft
    rng = np.random.RandomState(2)
    x = rng.randn(1, 2048).astype(np.float32)
    s = stft(jnp.asarray(x), n_fft=512, hop_length=128)
    spec = s[..., 0] + 1j * s[..., 1]
    y = np.asarray(istft(spec, n_fft=512, hop=128))
    n = min(x.shape[1], y.shape[1])
    # Interior samples reconstruct (edges lose window coverage).
    np.testing.assert_allclose(y[0, 256:n - 256], x[0, 256:n - 256],
                               atol=1e-3)


def test_griffin_lim_smoke():
    rng = np.random.RandomState(3)
    logmel = jnp.asarray(rng.randn(1, 10, 80).astype(np.float32) - 4.0)
    wav = griffin_lim(logmel, n_iter=2)
    assert wav.shape[0] == 1 and wav.shape[1] > 500
    assert np.isfinite(np.asarray(wav)).all()


def test_tts_task_e2e(tmp_path):
    """Train Tacotron2 on the mini corpus for 1 epoch, then synthesize."""
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.tts import (Text2Speech, TTSDataConfig,
                                            TTSTask, TTSTaskConfig)
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=4, n_dev=2)
    cfg = TTSTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        arch="tacotron2",
        tacotron2=TACO,
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=TTSDataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                           batch_size=4,
                           frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                   n_mels=16),
                           mel_bucket_multiple=32),
        max_epoch=1, keep_nbest=1)
    state = TTSTask.train(cfg)
    assert int(state.step) > 0
    t2s = Text2Speech(cfg.exp_dir, use_griffin_lim=True)
    mel, wav = t2s("alpha bravo", max_frames=24)
    assert mel.ndim == 2 and mel.shape[1] == 16
    if wav is not None:
        assert np.isfinite(wav).all()


def test_fastspeech2_task_e2e(tmp_path):
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.tts import (Text2Speech, TTSDataConfig,
                                            TTSTask, TTSTaskConfig)
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=4, n_dev=2)
    cfg = TTSTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        arch="fastspeech2",
        fastspeech2=FS2,
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=TTSDataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                           batch_size=4,
                           frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                   n_mels=16),
                           mel_bucket_multiple=32),
        max_epoch=1, keep_nbest=1)
    state = TTSTask.train(cfg)
    assert int(state.step) > 0
    t2s = Text2Speech(cfg.exp_dir, use_griffin_lim=False)
    mel, wav = t2s("charlie delta")
    assert mel.ndim == 2 and mel.shape[1] == 16


def test_gst_style_encoder_shapes():
    from espnet_slurp_tpu.tts.gst import StyleEncoder
    enc = StyleEncoder(gst_tokens=4, gst_token_dim=32, gst_heads=2,
                       conv_chans=(8, 8), gru_units=8)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 40, 16).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), mel)["params"]
    style = enc.apply({"params": params}, mel)
    assert style.shape == (2, 32)
    # different references -> different styles (non-degenerate)
    mel2 = jnp.asarray(rng.randn(2, 40, 16).astype(np.float32) * 3.0)
    style2 = enc.apply({"params": params}, mel2)
    assert float(jnp.abs(style - style2).max()) > 1e-5


@pytest.mark.parametrize("which", ["taco", "fs2"])
def test_gst_conditioned_tts_trains(which):
    import dataclasses
    batch = _tts_batch()
    if which == "taco":
        cfg = dataclasses.replace(TACO, use_gst=True, gst_tokens=4,
                                  gst_heads=2)
        model = Tacotron2(cfg)
        params = model.init(jax.random.PRNGKey(0), **batch)["params"]
        (loss, _), grads = jax.value_and_grad(
            lambda p: model.apply({"params": p}, **batch),
            has_aux=True)(params)
        assert "gst" in params
        mel, _ = model.apply(
            {"params": params}, batch["text"], batch["text_lengths"], 24,
            method=lambda m, t, tl, mf: m.inference(t, tl, mf,
                                                    ref_mel=batch["mel"]))
        assert mel.shape == (2, 24, 16)
    else:
        cfg = dataclasses.replace(FS2, use_gst=True, gst_tokens=4,
                                  gst_heads=2)
        model = FastSpeech2(cfg)
        rng = np.random.RandomState(1)
        durs = jnp.asarray(rng.randint(1, 4, size=(2, 6)), jnp.int32)
        fs_batch = dict(batch, durations=durs)
        params = model.init(jax.random.PRNGKey(0), **fs_batch)["params"]
        (loss, _), grads = jax.value_and_grad(
            lambda p: model.apply({"params": p}, **fs_batch),
            has_aux=True)(params)
        assert "gst" in params
        mel, _ = model.apply(
            {"params": params}, batch["text"], batch["text_lengths"],
            method=lambda m, t, tl: m.inference(t, tl,
                                                ref_mel=batch["mel"]))
        assert mel.shape[0] == 2
    assert np.isfinite(float(loss))
    # style-encoder params receive gradient through the conditioning
    gst_grads = jax.tree.leaves(grads["gst"])
    assert any(float(jnp.abs(g).max()) > 0 for g in gst_grads)


def test_transformer_tts_train_and_infer():
    from espnet_slurp_tpu.tts import TransformerTTS, TransformerTTSConfig
    cfg = TransformerTTSConfig(
        vocab_size=30, n_mels=16, d_model=32, n_head=2, d_ff=64,
        enc_blocks=1, dec_blocks=2, prenet_layers=1, prenet_units=16,
        postnet_layers=2, postnet_channels=16, postnet_kernel=3,
        dropout_rate=0.0)
    model = TransformerTTS(cfg)
    batch = _tts_batch()
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    (loss, stats), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, **batch), has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"l1_loss", "mse_loss", "bce_loss", "guided_attn_loss"} <= \
        set(stats)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    # guided attention pushes probs toward the diagonal -> loss in (0, 1)
    assert 0.0 < float(stats["guided_attn_loss"]) < 1.0

    mel, lens = model.apply({"params": params}, batch["text"],
                            batch["text_lengths"], 24,
                            method=lambda m, t, tl, mf: m.inference(t, tl,
                                                                    mf))
    assert mel.shape == (2, 24, 16)
    assert (np.asarray(lens) <= 24).all()


def test_transformer_tts_task_e2e(tmp_path):
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.tts import (Text2Speech, TTSDataConfig,
                                            TTSTask, TTSTaskConfig)
    from espnet_slurp_tpu.train.optim import OptimConfig
    from espnet_slurp_tpu.tts import TransformerTTSConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=4, n_dev=2)
    cfg = TTSTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        arch="transformer_tts",
        transformer_tts=TransformerTTSConfig(
            n_mels=16, d_model=32, n_head=2, d_ff=64, enc_blocks=1,
            dec_blocks=1, prenet_layers=1, prenet_units=16,
            postnet_layers=2, postnet_channels=16, postnet_kernel=3),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=TTSDataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                           batch_size=4,
                           frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                   n_mels=16),
                           mel_bucket_multiple=32),
        max_epoch=1, keep_nbest=1)
    state = TTSTask.train(cfg)
    assert int(state.step) > 0
    t2s = Text2Speech(cfg.exp_dir, use_griffin_lim=False)
    mel, _ = t2s("alpha bravo", max_frames=24)
    assert mel.ndim == 2 and mel.shape[1] == 16


def test_fastspeech1_train_and_infer():
    """FastSpeech (1): teacher-duration L1(before+after postnet) + dur MSE
    (reference espnet2/tts/fastspeech/fastspeech.py:407-571)."""
    from espnet_slurp_tpu.tts.fastspeech import FastSpeech, FastSpeechConfig
    cfg = FastSpeechConfig(
        vocab_size=30, n_mels=16, d_model=32, n_head=2, d_ff=64,
        enc_blocks=1, dec_blocks=1, var_channels=16, var_layers=1,
        postnet_layers=2, postnet_channels=16, postnet_kernel=3,
        max_frames=64)
    model = FastSpeech(cfg)
    batch = _tts_batch(t=24)
    rng = np.random.RandomState(1)
    batch["durations"] = jnp.asarray(rng.randint(1, 5, size=(2, 6)))
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    assert "postnet" in params and "pitch_predictor" not in params

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"l1_loss", "duration_loss"} <= set(stats)
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(grads))

    mel, total = model.apply(
        {"params": params}, batch["text"], batch["text_lengths"],
        method=lambda m, t, tl: m.inference(t, tl))
    assert mel.shape[0] == 2 and mel.shape[2] == 16
    assert (np.asarray(total) > 0).all()


def test_fastspeech1_task_e2e(tmp_path):
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.tts import (Text2Speech, TTSDataConfig,
                                            TTSTask, TTSTaskConfig)
    from espnet_slurp_tpu.train.optim import OptimConfig
    from espnet_slurp_tpu.tts.fastspeech import FastSpeechConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=4, n_dev=2)
    cfg = TTSTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        arch="fastspeech",
        fastspeech=FastSpeechConfig(
            vocab_size=30, n_mels=16, d_model=32, n_head=2, d_ff=64,
            enc_blocks=1, dec_blocks=1, var_channels=16, var_layers=1,
            postnet_layers=2, postnet_channels=16, postnet_kernel=3,
            max_frames=64),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=TTSDataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                           batch_size=4,
                           frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                   n_mels=16),
                           mel_bucket_multiple=32),
        max_epoch=1, keep_nbest=1)
    state = TTSTask.train(cfg)
    assert int(state.step) > 0
    t2s = Text2Speech(cfg.exp_dir, use_griffin_lim=False)
    mel, wav = t2s("charlie delta")
    assert mel.ndim == 2 and mel.shape[1] == 16
