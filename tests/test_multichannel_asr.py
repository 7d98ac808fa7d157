"""Multichannel ASR frontend tests (DefaultFrontend use_wpe/use_beamformer,
espnet/nets/pytorch_backend/frontends/dnn_{wpe,beamformer})."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig


def _cfg(**kw):
    return ASRConfig(
        vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None, **kw)


def _batch(channels=2):
    rng = np.random.RandomState(0)
    return {
        "speech": jnp.asarray(
            rng.randn(2, 1600, channels).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 18, size=(2, 3))),
        "text_lengths": jnp.asarray([3, 2]),
    }


@pytest.mark.parametrize("mode", ["beamformer", "wpe", "ref_only"])
def test_multichannel_asr_forward_backward(mode):
    cfg = _cfg(use_beamformer=(mode == "beamformer"),
               use_wpe=(mode == "wpe"),
               bf_hidden=16, bf_layers=1, wpe_taps=2, wpe_iters=1)
    model = ASRModel(cfg)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    if mode == "beamformer":
        assert "beamformer" in params

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, **batch)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_ref_channel_select_matches_single_channel():
    """Without wpe/beamformer, the multichannel path = log-mel of the
    reference channel."""
    cfg = _cfg(ref_channel=1)
    model = ASRModel(cfg)
    rng = np.random.RandomState(1)
    wav = rng.randn(2, 1600).astype(np.float32) * 0.1
    mc = np.stack([rng.randn(2, 1600).astype(np.float32), wav], axis=-1)
    lens = jnp.asarray([1600, 1600])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mc), lens,
                        jnp.ones((2, 3), jnp.int32),
                        jnp.asarray([3, 3]))["params"]
    hs_mc, hl_mc, _ = model.apply(
        {"params": params}, jnp.asarray(mc), lens,
        method=lambda m, s, sl: m.encode(s, sl))
    hs_1c, hl_1c, _ = model.apply(
        {"params": params}, jnp.asarray(wav), lens,
        method=lambda m, s, sl: m.encode(s, sl))
    np.testing.assert_array_equal(np.asarray(hl_mc), np.asarray(hl_1c))
    np.testing.assert_allclose(np.asarray(hs_mc), np.asarray(hs_1c),
                               rtol=1e-4, atol=1e-5)


def test_multichannel_task_e2e(tmp_path):
    """multichannel=True data flag: 2-channel wavs through the task."""
    from espnet_slurp_tpu.data.fileio import write_wav
    from espnet_slurp_tpu.tasks.asr import (ASRTask, ASRTaskConfig,
                                            DataConfig)
    from espnet_slurp_tpu.train.optim import OptimConfig
    from scipy.io import wavfile
    rng = np.random.RandomState(2)
    words = ["alpha", "bravo", "charlie"]
    for split, n_utt in (("train", 6), ("dev", 2)):
        d = tmp_path / split
        d.mkdir(parents=True)
        rows_w, rows_t = [], []
        for i in range(n_utt):
            n = 1600 + 320 * (i % 3)
            stereo = (0.1 * rng.randn(n, 2)).astype(np.float32)
            p = d / f"u{i}.wav"
            wavfile.write(str(p), 16000,
                          np.clip(stereo * 32768, -32768,
                                  32767).astype(np.int16))
            rows_w.append(f"u{i} {p}")
            rows_t.append(f"u{i} {words[i % 3]} {words[(i + 1) % 3]}")
        (d / "wav.scp").write_text("\n".join(rows_w) + "\n")
        (d / "text").write_text("\n".join(rows_t) + "\n")
    cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=_cfg(use_beamformer=True, bf_hidden=16, bf_layers=1),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(tmp_path / "train"),
                        valid_dir=str(tmp_path / "dev"),
                        token_type="word", batch_type="sorted",
                        batch_size=3, multichannel=True,
                        speech_bucket_multiple=2048,
                        text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    state = ASRTask.train(cfg)
    assert int(state.step) > 0
