"""Optimizer/scheduler family tests (espnet2/optimizers + schedulers/)."""
import numpy as np
import pytest

import jax.numpy as jnp
import optax

from espnet_slurp_tpu.train.optim import (OptimConfig, build_optimizer,
                                          build_schedule)


@pytest.mark.parametrize("name", ["adam", "adamw", "sgd", "adadelta",
                                  "adagrad", "rmsprop"])
def test_optimizer_updates_finite_and_descend(name):
    params = {"w": jnp.ones((4, 4))}
    g = {"w": jnp.full((4, 4), 0.1)}
    cfg = OptimConfig(name=name, scheduler="constant", lr=1e-2,
                      momentum=0.9)
    tx = build_optimizer(cfg)
    st = tx.init(params)
    up, st = tx.update(g, st, params)
    p2 = optax.apply_updates(params, up)
    w2 = np.asarray(p2["w"])
    assert np.isfinite(w2).all()
    assert (w2 < 1.0).all()  # positive gradient -> params decrease


@pytest.mark.parametrize("sched", ["warmuplr", "noam", "warmup_step",
                                   "exponential", "cosine", "constant"])
def test_schedules_finite_nonnegative(sched):
    cfg = OptimConfig(scheduler=sched, warmup_steps=100, decay_steps=50,
                      decay_rate=0.5)
    f = build_schedule(cfg)
    vals = [float(f(t)) for t in (1, 10, 100, 500, 1000)]
    assert all(np.isfinite(v) and v >= 0 for v in vals)


def test_warmup_step_decays_after_warmup():
    cfg = OptimConfig(scheduler="warmup_step", warmup_steps=10,
                      decay_steps=10, decay_rate=0.5)
    base = OptimConfig(scheduler="warmuplr", warmup_steps=10)
    f, g = build_schedule(cfg), build_schedule(base)
    # identical through warmup, halved per decay period afterwards
    assert float(f(10)) == pytest.approx(float(g(10)))
    assert float(f(30)) == pytest.approx(float(g(30)) * 0.25)
