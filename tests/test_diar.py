"""Diarization model tests."""
import numpy as np
import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.diar import DiarConfig, DiarModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig


def test_diar_model_trains():
    cfg = DiarConfig(n_spk=2, d_model=32, n_head=2, d_ff=64, num_blocks=1,
                     frontend=FrontendConfig(n_fft=128, hop_length=64,
                                             n_mels=16))
    model = DiarModel(cfg)
    rng = np.random.RandomState(0)
    t_frames = 1 + 1600 // 64
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "spk_labels": jnp.asarray(
            rng.randint(0, 2, size=(2, t_frames, 2)).astype(np.float32)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    logits, flens = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.activity(s, sl))
    assert logits.shape[-1] == 2
