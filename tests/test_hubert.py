"""HuBERT-style SSL pretraining test."""
import numpy as np
import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.hubert import HubertConfig, HubertModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig


def test_hubert_pretrain_step():
    cfg = HubertConfig(n_clusters=20, d_model=32, n_head=2, d_ff=64,
                       num_blocks=1, kernel_size=7, mask_prob=0.2,
                       mask_span=4,
                       frontend=FrontendConfig(n_fft=128, hop_length=64,
                                               n_mels=16))
    model = HubertModel(cfg)
    rng = np.random.RandomState(0)
    t_enc = (((1 + 1600 // 64) - 1) // 2 - 1) // 2
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "cluster_ids": jnp.asarray(
            rng.randint(0, 20, size=(2, t_enc)).astype(np.int32)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch,
                        mask_rng=jax.random.PRNGKey(1))["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch,
                           mask_rng=jax.random.PRNGKey(1))

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert 0 < float(stats["mask_ratio"]) < 1
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
