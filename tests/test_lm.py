"""LM tests: full-sequence forward == step-by-step decode; loss sanity."""
import numpy as np
import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.lm import LMConfig, LSTMLM, TransformerLM, lm_loss

TCFG = LMConfig(vocab_size=30, d_model=16, n_head=2, d_ff=32, num_blocks=2)
LCFG = LMConfig(vocab_size=30, arch="lstm", d_model=16, num_layers=2)


def test_transformer_lm_step_matches_full():
    model = TransformerLM(TCFG)
    ys = jnp.asarray([[1, 5, 7, 2], [3, 4, 2, 2]])
    lens = jnp.array([4, 3])
    params = model.init(jax.random.PRNGKey(0), ys, lens)["params"]
    full = model.apply({"params": params}, ys, lens)

    cache = model.apply({"params": params},
                        method=lambda m: m.init_cache(2, 4))
    outs = []
    for t in range(4):
        logits, cache = model.apply({"params": params}, ys[:, t], cache,
                                    method=lambda m, y, c: m.step(y, c))
        outs.append(logits)
    step = jnp.stack(outs, axis=1)
    # Compare only valid (unpadded) positions: the full forward masks keys
    # past ys_lengths, the incremental path is only ever called on valid
    # prefixes.
    np.testing.assert_allclose(np.asarray(full)[0, :4],
                               np.asarray(step)[0, :4], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(full)[1, :3],
                               np.asarray(step)[1, :3], rtol=2e-4, atol=2e-4)


def test_lstm_lm_step_matches_full():
    model = LSTMLM(LCFG)
    ys = jnp.asarray([[1, 5, 7], [3, 4, 2]])
    lens = jnp.array([3, 3])
    params = model.init(jax.random.PRNGKey(0), ys, lens)["params"]
    full = model.apply({"params": params}, ys, lens)
    carry = model.apply({"params": params},
                        method=lambda m: m.init_carry(2))
    outs = []
    for t in range(3):
        logits, carry = model.apply({"params": params}, ys[:, t], carry,
                                    method=lambda m, y, c: m.step(y, c))
        outs.append(logits)
    step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step),
                               rtol=2e-4, atol=2e-4)


def test_lm_loss():
    logits = jnp.zeros((2, 3, 10))
    tgt = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    loss, ppl, n = lm_loss(logits, tgt, jnp.array([3, 2]))
    np.testing.assert_allclose(float(loss), np.log(10), rtol=1e-5)
    assert int(n) == 5
