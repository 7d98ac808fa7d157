"""Sinc/linear preencoder tests (reference espnet2/asr/preencoder/)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.models.preencoder import (LightweightSincConvs,
                                                SincConv, bark_bank,
                                                mel_bank)
from espnet_slurp_tpu.ops.frontend import FrontendConfig


def test_filter_banks_monotone():
    for bank in (mel_bank(16, 16000.0), bark_bank(16, 16000.0)):
        f1, f2 = bank[:, 0], bank[:, 1]
        assert (f2 > f1).all()              # positive bandwidth
        assert (np.diff(f1) > 0).all()      # increasing start frequencies
        assert f2[-1] <= 16000.0            # inside Nyquist-ish range


def test_sinc_conv_is_bandpass():
    """A tone inside a filter's band excites that channel most."""
    conv = SincConv(out_channels=16, kernel_size=101, fs=16000.0)
    n = 400
    t = np.arange(n) / 16000.0
    bank = mel_bank(16, 16000.0)
    k = 8
    f_center = (bank[k, 0] + bank[k, 1]) / 2
    x = jnp.asarray(np.sin(2 * np.pi * f_center * t,
                           dtype=np.float64)[None].astype(np.float32))
    params = conv.init(jax.random.PRNGKey(0), x)["params"]
    y = conv.apply({"params": params}, x)   # [1, D_out, 16]
    energy = np.asarray(jnp.sum(y**2, axis=(0, 1)))
    # the matched band (or a neighbor; band edges overlap) dominates
    assert abs(int(np.argmax(energy)) - k) <= 1


def test_lightweight_sinc_convs_shapes_and_grads():
    m = LightweightSincConvs(out_channels=32)
    frames = jnp.asarray(
        np.random.RandomState(0).randn(2, 5, 400).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), frames)["params"]
    out = m.apply({"params": params}, frames)
    assert out.shape[:2] == (2, 5)
    assert out.shape[2] % 32 == 0

    def loss(p):
        return jnp.sum(m.apply({"params": p}, frames) ** 2)

    grads = jax.grad(loss)(params)
    # the sinc band edges are learnable end-to-end
    g_f = np.asarray(grads["sinc"]["f"])
    assert np.isfinite(g_f).all() and (np.abs(g_f) > 0).any()


@pytest.mark.parametrize("pre", ["sinc", "linear"])
def test_asr_model_with_preencoder(pre):
    cfg = ASRConfig(
        vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3,
        preencoder=pre, preencoder_dim=16,
        frontend=FrontendConfig(
            type="sliding_window" if pre == "sinc" else "default",
            n_fft=512, win_length=400, hop_length=160, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 3200).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([3200, 1600]),
        "text": jnp.asarray(rng.randint(1, 18, size=(2, 4))),
        "text_lengths": jnp.asarray([4, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    assert "preencoder" in params

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, **batch)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
