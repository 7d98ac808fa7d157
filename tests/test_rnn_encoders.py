"""RNN / VGG-RNN encoder tests (rnn_encoder.py / vgg_rnn_encoder.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.models.rnn_encoders import VGG2L, VGGRNNEncoder
from espnet_slurp_tpu.ops.frontend import FrontendConfig


def test_vgg2l_shapes_and_lengths():
    m = VGG2L()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 21, 16),
                    dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": params}, x)
    assert y.shape == (2, 6, 128 * 4)  # ceil(21/4)=6, ceil(16/4)=4
    np.testing.assert_array_equal(
        np.asarray(VGG2L.out_length(jnp.asarray([21, 8]))), [6, 2])


def test_vggrnn_encoder_interface():
    m = VGGRNNEncoder(d_model=32, units=16, num_layers=2)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 20, 16),
                    dtype=jnp.float32)
    lens = jnp.asarray([20, 9])
    params = m.init(jax.random.PRNGKey(0), x, lens)["params"]
    hs, olens, inter = m.apply({"params": params}, x, lens)
    assert hs.shape == (2, 5, 32)
    np.testing.assert_array_equal(np.asarray(olens), [5, 3])
    assert inter == []


def test_rnnp_seq_lengths_invariance():
    """Content beyond seq_lengths must not change valid outputs: the
    forward scan never reads it by position, and the REVERSE scan must
    start at the true end (pack_padded_sequence analogue), not the padded
    end. (The VGG conv front has the usual receptive-field halo at the
    padding boundary, exactly like the reference's zero-padded batches, so
    the invariance property is asserted on the RNNP stack.)"""
    from espnet_slurp_tpu.models.rnn_encoders import RNNPEncoder
    m = RNNPEncoder(d_model=16, units=8, num_layers=2)
    rng = np.random.RandomState(2)
    x = rng.randn(1, 9, 8).astype(np.float32)
    lens = jnp.asarray([6])
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), lens)["params"]
    h1, _ = m.apply({"params": params}, jnp.asarray(x), lens)
    xg = x.copy()
    xg[:, 6:] = 7.0  # garbage beyond the true length
    h2, _ = m.apply({"params": params}, jnp.asarray(xg), lens)
    np.testing.assert_allclose(np.asarray(h1)[0, :6],
                               np.asarray(h2)[0, :6], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("enc", ["rnn", "vgg_rnn"])
def test_asr_model_with_rnn_encoders(enc):
    cfg = ASRConfig(
        vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3,
        encoder=enc, rnn_encoder_units=16, rnn_encoder_layers=2,
        rnn_encoder_subsample=(2, 2),
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 18, size=(2, 4))),
        "text_lengths": jnp.asarray([4, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, **batch)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
