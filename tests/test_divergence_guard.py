"""Divergence guard: grad-norm spike skip + epoch-level rollback/backoff.

Reference behavior being exceeded: espnet2/train/trainer.py:651-670 skips
non-finite steps and e2e_asr.py:575-581 guards on a loss threshold; the r4
TCPGen ablation arm showed that is not enough (grad_norm 4 -> 512 over
epochs 16-25 with finite losses throughout, campaign decoded the diverged
model). The guard adds (a) per-step spike skip against an accepted-step
grad-norm EMA, (b) per-epoch rollback to the best checkpoint with LR
backoff when the valid criterion explodes.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from espnet_slurp_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from espnet_slurp_tpu.train.state import TrainState, make_train_step  # noqa: E402
from espnet_slurp_tpu.train.trainer import Trainer, TrainerOptions  # noqa: E402


def _mk_state(guard=True):
    tx = optax.sgd(0.1)
    params = {"w": jnp.zeros((2,), jnp.float32)}
    return TrainState.create(params, tx, jax.random.PRNGKey(0),
                             guard=guard), tx


def test_spike_skip_drops_outlier_updates():
    state, tx = _mk_state()

    def apply_fn(params, batch, dropout_rng, specaug_rng):
        loss = jnp.sum(params["w"] * batch["x"])
        return loss, {"loss": loss}

    step = make_train_step(None, tx, apply_fn=apply_fn, donate=False,
                           spike_factor=5.0)
    # warm up the EMA with unit-scale grads
    for _ in range(30):
        state, stats = step(state, {"x": jnp.ones((2,), jnp.float32)})
    assert float(stats["spike_skipped"]) == 0.0
    w_before = np.asarray(state.params["w"]).copy()
    ema_before = float(state.gnorm_ema)
    # a 100x grad spike must be skipped whole (params + EMA untouched)
    state, stats = step(state, {"x": 100.0 * jnp.ones((2,), jnp.float32)})
    assert float(stats["spike_skipped"]) == 1.0
    assert float(stats["skipped"]) == 1.0
    np.testing.assert_array_equal(np.asarray(state.params["w"]), w_before)
    assert float(state.gnorm_ema) == pytest.approx(ema_before)
    # normal steps keep flowing afterwards
    state, stats = step(state, {"x": jnp.ones((2,), jnp.float32)})
    assert float(stats["spike_skipped"]) == 0.0
    assert not np.array_equal(np.asarray(state.params["w"]), w_before)


def test_lr_scale_multiplies_updates():
    state, tx = _mk_state()
    state = state.replace(lr_scale=jnp.asarray(0.5, jnp.float32))

    def apply_fn(params, batch, dropout_rng, specaug_rng):
        loss = jnp.sum(params["w"] * batch["x"])
        return loss, {"loss": loss}

    step = make_train_step(None, tx, apply_fn=apply_fn, donate=False)
    state2, _ = step(state, {"x": jnp.ones((2,), jnp.float32)})
    # sgd(0.1) on grad 1 -> update -0.1; halved -> -0.05
    np.testing.assert_allclose(np.asarray(state2.params["w"]), -0.05,
                               rtol=1e-5)


def test_trainer_rollback_on_valid_explosion(tmp_path):
    state, tx = _mk_state()
    ckpt = CheckpointManager(tmp_path, keep_nbest=5)

    # valid loss schedule: improves, then explodes at epoch 3
    valid_loss = {1: 2.0, 2: 1.5, 3: 900.0, 4: 1.4}

    def train_step(st, batch):
        # drift params each epoch so rollback is observable
        new = {"w": st.params["w"] + 1.0}
        return st.replace(step=st.step + 1, params=new), {"loss": 1.0}

    def eval_step(st, batch):
        return {"loss": batch["loss"]}

    def train_factory(epoch):
        yield {"x": np.ones((2,), np.float32)}

    def valid_factory(epoch):
        yield {"loss": valid_loss[epoch]}

    trainer = Trainer(train_step, eval_step, ckpt,
                      TrainerOptions(max_epoch=4, keep_nbest=5,
                                     nbest_average=1, tensorboard=False,
                                     plot_curves=False,
                                     guard_factor=5.0, guard_backoff=0.5))
    final = trainer.run(state, train_factory, valid_factory)
    # epoch 3 exploded (900 > 5 x 1.5): state must have been rolled back to
    # epoch 2's checkpoint before epoch 4 trained on top of it.
    # w after: epoch1 -> 1, epoch2 -> 2 (saved), epoch3 -> 3 (rolled back
    # to 2), epoch4 -> 3.
    np.testing.assert_allclose(np.asarray(final.params["w"]),
                               3.0 * np.ones(2))
    assert float(final.lr_scale) == pytest.approx(0.5)


def test_trainer_rollback_limit(tmp_path):
    state, tx = _mk_state()
    ckpt = CheckpointManager(tmp_path, keep_nbest=5)
    calls = []

    def train_step(st, batch):
        return st.replace(step=st.step + 1), {"loss": 1.0}

    def eval_step(st, batch):
        return {"loss": batch["loss"]}

    def train_factory(epoch):
        yield {}

    def valid_factory(epoch):
        calls.append(epoch)
        # good first epoch, then a permanent explosion
        yield {"loss": 1.0 if epoch == 1 else 1e6}

    trainer = Trainer(train_step, eval_step, ckpt,
                      TrainerOptions(max_epoch=10, keep_nbest=5,
                                     nbest_average=1, tensorboard=False,
                                     plot_curves=False,
                                     guard_factor=5.0, guard_max=2))
    with pytest.raises(RuntimeError, match="divergence guard"):
        trainer.run(state, train_factory, valid_factory)


def test_checkpoint_roundtrips_guard_fields(tmp_path):
    state, tx = _mk_state()
    state = state.replace(lr_scale=jnp.asarray(0.25, jnp.float32),
                          gnorm_ema=jnp.asarray(3.5, jnp.float32))
    ckpt = CheckpointManager(tmp_path, keep_nbest=3)
    from espnet_slurp_tpu.train.reporter import Reporter
    ckpt.save_epoch(1, state, Reporter())
    fresh, _ = _mk_state()
    restored = ckpt.restore(1, fresh)
    assert float(restored.lr_scale) == pytest.approx(0.25)
    assert float(restored.gnorm_ema) == pytest.approx(3.5)


def test_guard_negative_valid_loss(tmp_path):
    """Negative valid criteria must not invert the threshold.

    Observed (KA2G campaign, exp_nokb): the CTC criterion went negative;
    with best=-0.17 the old multiplicative test ``cur > best * factor``
    compared against -0.85, so every later fluctuation "diverged" and the
    guard rolled back until the abort. The additive-margin guard must (a)
    pass small fluctuations around a negative best, (b) still fire on a
    real explosion from a negative best."""
    ckpt = CheckpointManager(tmp_path, keep_nbest=8)

    valid_loss = {1: -0.07, 2: -0.17, 3: -0.12, 4: -0.18,
                  5: -0.16, 6: 40.0}
    rolled_epochs = []

    def train_step(st, batch):
        return st.replace(step=st.step + 1,
                          params={"w": st.params["w"] + 1.0}), {"loss": 1.0}

    def eval_step(st, batch):
        return {"loss": batch["loss"]}

    def train_factory(epoch):
        yield {"x": np.ones((2,), np.float32)}

    def valid_factory(epoch):
        yield {"loss": valid_loss[epoch]}

    state, tx = _mk_state()
    trainer = Trainer(train_step, eval_step, ckpt,
                      TrainerOptions(max_epoch=6, keep_nbest=8,
                                     nbest_average=1, tensorboard=False,
                                     plot_curves=False,
                                     guard_factor=5.0, guard_backoff=0.5,
                                     guard_max=3))
    orig_guard = trainer._guard

    def spy(state_, reporter, epoch, phase, key, mode):
        out, rolled = orig_guard(state_, reporter, epoch, phase, key, mode)
        if rolled:
            rolled_epochs.append(epoch)
        return out, rolled

    trainer._guard = spy
    final = trainer.run(state, train_factory, valid_factory)
    # only the real explosion (epoch 6: -0.18 best -> +40) rolls back
    assert rolled_epochs == [6]
    assert float(final.lr_scale) == pytest.approx(0.5)
