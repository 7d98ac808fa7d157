"""ST/MT model tests."""
import numpy as np
import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.asr_model import ASRConfig
from espnet_slurp_tpu.models.st_mt import MTConfig, MTModel, STModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig


def test_st_model():
    cfg = ASRConfig(
        vocab_size=25, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = STModel(cfg, src_vocab_size=15, asr_ctc_weight=0.3)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 24, size=(2, 5))),
        "text_lengths": jnp.asarray([5, 3]),
        "src_text": jnp.asarray(rng.randint(1, 14, size=(2, 4))),
        "src_text_lengths": jnp.asarray([4, 2]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "loss_asr_ctc" in stats and "loss_att" in stats
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_mt_model():
    cfg = MTConfig(src_vocab_size=15, vocab_size=25, d_model=32, n_head=2,
                   d_ff=64, num_encoder_blocks=1, num_decoder_blocks=1)
    model = MTModel(cfg)
    rng = np.random.RandomState(1)
    batch = {
        "src_text": jnp.asarray(rng.randint(1, 14, size=(2, 6))),
        "src_text_lengths": jnp.asarray([6, 4]),
        "text": jnp.asarray(rng.randint(1, 24, size=(2, 5))),
        "text_lengths": jnp.asarray([5, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    loss, stats = model.apply({"params": params}, **batch)
    assert np.isfinite(float(loss))
    assert 0 <= float(stats["acc"]) <= 1
