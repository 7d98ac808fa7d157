"""Failure-detection tests (SURVEY §5: invalid-grad skip + all-invalid
abort, reference trainer.py:434-440,651-667)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from espnet_slurp_tpu.train.state import TrainState, make_train_step
from espnet_slurp_tpu.train.trainer import Trainer, TrainerOptions
from espnet_slurp_tpu.train.checkpoint import CheckpointManager


class _NaNModel:
    """Minimal model-like object whose loss is always NaN."""

    def apply(self, variables, *, train=False, specaug_rng=None,
              mvn_stats=None, rngs=None, **batch):
        p = variables["params"]["w"]
        loss = jnp.sum(p * batch["x"]) * jnp.nan
        return loss, {"loss": loss}


def _batch():
    return {"x": jnp.ones((2, 4))}


def test_nonfinite_update_skipped():
    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((2, 4))}
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(_NaNModel(), tx, donate=False)
    new_state, stats = step(state, _batch())
    assert float(stats["skipped"]) == 1.0
    np.testing.assert_array_equal(np.asarray(new_state.params["w"]),
                                  np.asarray(params["w"]))  # unchanged


def test_all_invalid_epoch_aborts(tmp_path):
    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((2, 4))}
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(_NaNModel(), tx, donate=False)

    def eval_step(state, batch):
        return {"loss": jnp.zeros(())}

    trainer = Trainer(step, eval_step,
                      CheckpointManager(tmp_path / "exp", 1),
                      TrainerOptions(max_epoch=3, resume=False,
                                     nbest_average=1, log_interval=100))

    def factory(epoch):
        for _ in range(3):
            yield _batch()

    with pytest.raises(RuntimeError, match="non-finite gradients"):
        trainer.run(state, factory, lambda e: iter(()))
