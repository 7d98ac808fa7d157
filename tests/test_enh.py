"""Enhancement tests: SI-SNR properties, PIT, separation model training."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.enh import EnhConfig, EnhModel, pit_wrapper, si_snr_loss


def test_si_snr_perfect_reconstruction():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    # perfect (scaled) estimate -> very high SI-SNR -> very negative loss
    loss = si_snr_loss(2.0 * x, x)
    assert (np.asarray(loss) < -40).all()
    # uncorrelated noise -> low SI-SNR
    noise = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    loss_n = si_snr_loss(noise, x)
    assert (np.asarray(loss_n) > -5).all()


def test_si_snr_respects_lengths():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 100).astype(np.float32))
    est = x.at[:, 50:].set(999.0)  # garbage past the valid region
    loss = si_snr_loss(est, x, lengths=jnp.array([50]))
    assert float(loss[0]) < -40


def test_pit_picks_best_permutation():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(1, 500).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 500).astype(np.float32))
    ref = jnp.stack([a, b], axis=1)  # [1, 2, N]
    est_swapped = jnp.stack([b, a], axis=1)
    loss, perm = pit_wrapper(lambda e, r: si_snr_loss(e, r), est_swapped, ref)
    assert float(loss[0]) < -40  # swapped order still matches via PIT
    assert int(perm[0]) == 1     # permutation (1, 0) chosen


def test_enh_model_trains():
    cfg = EnhConfig(n_spk=2, n_fft=128, hop_length=64, hidden=32,
                    num_layers=1)
    model = EnhModel(cfg)
    rng = np.random.RandomState(3)
    s1 = rng.randn(2, 2000).astype(np.float32) * 0.3
    s2 = rng.randn(2, 2000).astype(np.float32) * 0.3
    batch = {
        "speech_mix": jnp.asarray(s1 + s2),
        "speech_mix_lengths": jnp.asarray([2000, 1500]),
        "speech_ref": jnp.asarray(np.stack([s1, s2], 1)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "si_snr" in stats
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    est, flens = model.apply({"params": params}, batch["speech_mix"],
                             batch["speech_mix_lengths"],
                             method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape[0] == 2 and est.shape[1] == 2


def test_enh_transformer_separator():
    cfg = EnhConfig(n_spk=2, n_fft=128, hop_length=64, hidden=32,
                    num_layers=1, separator="transformer")
    model = EnhModel(cfg)
    rng = np.random.RandomState(4)
    mix = jnp.asarray(rng.randn(1, 1000).astype(np.float32))
    ref = jnp.asarray(rng.randn(1, 2, 1000).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mix, jnp.array([1000]),
                        ref)["params"]
    loss, _ = model.apply({"params": params}, mix, jnp.array([1000]), ref)
    assert np.isfinite(float(loss))
