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
    logits, flens, att = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.activity(s, sl))
    assert logits.shape[-1] == 2
    assert att is None  # SA-EEND path has no attractors


def _eda_batch(seed=0, n=1600):
    rng = np.random.RandomState(seed)
    t_frames = 1 + n // 64
    return {
        "speech": jnp.asarray(rng.randn(2, n).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([n, n // 2]),
        "spk_labels": jnp.asarray(
            rng.randint(0, 2, size=(2, t_frames, 2)).astype(np.float32)),
    }


def test_eda_attractor_trains():
    cfg = DiarConfig(n_spk=2, d_model=32, n_head=2, d_ff=64, num_blocks=1,
                     use_attractor=True,
                     frontend=FrontendConfig(n_fft=128, hop_length=64,
                                             n_mels=16))
    model = DiarModel(cfg)
    batch = _eda_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "shuffle": jax.random.PRNGKey(1)}, train=True, **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, train=True,
                           rngs={"shuffle": jax.random.PRNGKey(2)}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "attractor_loss" in stats and "pit_loss" in stats
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    # attractor LSTMs received gradient
    att_g = jax.tree.leaves(grads["attractor"])
    assert max(float(jnp.abs(g).max()) for g in att_g) > 0

    probs, flens, n_est = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"], 0.5,
        method=lambda m, s, sl, th: m.estimate_activity(s, sl, th))
    assert probs.shape[-1] == 2
    assert ((np.asarray(n_est) >= 0) & (np.asarray(n_est) <= 2)).all()
    # estimated-inactive speakers have exactly-zero posteriors
    p = np.asarray(probs)
    for i, k in enumerate(np.asarray(n_est)):
        assert (p[i, :, k:] == 0).all()


def test_shuffle_valid_frames_preserves_set():
    from espnet_slurp_tpu.models.diar import shuffle_valid_frames
    x = jnp.asarray(np.arange(2 * 10, dtype=np.float32).reshape(2, 10, 1))
    lengths = jnp.asarray([10, 6])
    out = np.asarray(shuffle_valid_frames(jax.random.PRNGKey(3), x,
                                          lengths))
    ref = np.asarray(x)
    # valid prefix is a permutation of the original prefix
    assert sorted(out[0, :, 0]) == sorted(ref[0, :, 0])
    assert sorted(out[1, :6, 0]) == sorted(ref[1, :6, 0])
    # padding frames stay at the tail, untouched as a set
    assert sorted(out[1, 6:, 0]) == sorted(ref[1, 6:, 0])
