"""MaskCTC tests: training loss + mask-predict decode."""
import numpy as np
import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.asr_model import ASRConfig
from espnet_slurp_tpu.models.maskctc import MaskCTCModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig

CFG = ASRConfig(
    vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
    num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
    ctc_weight=0.3,
    frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
    specaug=None)


def test_maskctc_train_and_decode():
    model = MaskCTCModel(CFG)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 18, size=(2, 5))),
        "text_lengths": jnp.asarray([5, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch,
                        mask_rng=jax.random.PRNGKey(1))["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch,
                           mask_rng=jax.random.PRNGKey(1))

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"loss_ctc", "loss_mlm", "acc_mlm"} <= set(stats)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))

    tokens, lengths = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"], 8, 2,
        method=lambda m, s, sl, ml, it: m.decode(s, sl, max_len=ml,
                                                 n_iterations=it))
    assert tokens.shape == (2, 8)
    assert (np.asarray(lengths) <= 8).all()
    # no mask tokens remain
    assert not (np.asarray(tokens) == CFG.vocab_size - 1).any()
