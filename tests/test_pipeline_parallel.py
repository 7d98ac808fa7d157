"""Pipeline-parallelism tests (parallel/pipeline.py, GPipe over 'pipe').

New-capability target (SURVEY.md §2.10): the reference has no pipeline
parallelism. Checks: (1) the SPMD wavefront equals the serial stage
composition exactly; (2) gradients through the pipeline equal serial
gradients (the scan + ppermute schedule trains); (3) a conformer-block
train step — stacked stage params, CTC-style loss, optimizer update —
runs pipelined on a 4-device virtual mesh and matches the serial loss.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from espnet_slurp_tpu.parallel.pipeline import (PIPE_AXIS, pipeline,
                                                stack_stages)


def _mesh(n=4):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), (PIPE_AXIS,))


def test_pipeline_matches_serial_forward():
    mesh = _mesh()
    p, d = 4, 16
    rng = np.random.RandomState(0)
    stages = [{"w": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3),
               "b": jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)}
              for _ in range(p)]

    def stage_fn(params, x):
        return jnp.tanh(x @ params["w"] + params["b"])

    x = jnp.asarray(rng.randn(8, d).astype(np.float32))
    want = x
    for s in stages:
        want = stage_fn(s, want)
    got = pipeline(mesh, stage_fn, stack_stages(stages), x, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_serial():
    mesh = _mesh()
    p, d = 4, 8
    rng = np.random.RandomState(1)
    stages = [{"w": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3)}
              for _ in range(p)]
    stacked = stack_stages(stages)
    x = jnp.asarray(rng.randn(8, d).astype(np.float32))
    tgt = jnp.asarray(rng.randn(8, d).astype(np.float32))

    def stage_fn(params, h):
        return jnp.tanh(h @ params["w"])

    def loss_pipe(sp):
        y = pipeline(mesh, stage_fn, sp, x, n_micro=2)
        return jnp.mean((y - tgt) ** 2)

    def loss_serial(sp):
        h = x
        for k in range(p):
            h = stage_fn(jax.tree.map(lambda a: a[k], sp), h)
        return jnp.mean((h - tgt) ** 2)

    lp, gp = jax.value_and_grad(loss_pipe)(stacked)
    ls, gs = jax.value_and_grad(loss_serial)(stacked)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pipelined_conformer_train_step():
    """Full jitted train step with the encoder blocks pipelined: 4 stages of
    conformer blocks, masked-CE loss over the last stage's output, adam
    update — loss and grads match the serial composition."""
    import flax.linen as nn
    import optax
    from espnet_slurp_tpu.models.conformer import ConformerBlock

    mesh = _mesh()
    p, b, t, d = 4, 8, 32, 16
    block = ConformerBlock(d_model=d, n_head=2, d_ff=32, kernel_size=7,
                           dropout_rate=0.0)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    pos = jnp.asarray(rng.randn(1, 2 * t - 1, d).astype(np.float32) * 0.1)
    pad = jnp.ones((b, t), bool)
    tgt = jnp.asarray(rng.randint(0, d, size=(b, t)), jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(0), p)
    stage_trees = [block.init(k, x[:1], pos[:, :, :], None, pad[:1], True)
                   ["params"] for k in keys]
    stacked = stack_stages(stage_trees)

    def stage_fn(params, h):
        mb_pad = jnp.ones((h.shape[0], t), bool)
        return block.apply({"params": params}, h, pos, None, mb_pad, True)

    def loss_from(y):
        logits = y  # d_model == n_classes for the test
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], -1))

    def loss_pipe(sp):
        return loss_from(pipeline(mesh, stage_fn, sp, x, n_micro=2))

    def loss_serial(sp):
        h = x
        for k in range(p):
            h = stage_fn(jax.tree.map(lambda a: a[k], sp), h)
        return loss_from(h)

    tx = optax.adam(1e-3)
    opt_state = tx.init(stacked)

    @jax.jit
    def train_step(sp, opt_state):
        loss, grads = jax.value_and_grad(loss_pipe)(sp)
        updates, opt_state = tx.update(grads, opt_state, sp)
        return optax.apply_updates(sp, updates), opt_state, loss

    ls, gs = jax.value_and_grad(loss_serial)(stacked)
    sp2, opt_state, lp = train_step(stacked, opt_state)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-4)
    # params actually moved
    moved = sum(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree.leaves(sp2), jax.tree.leaves(stacked)))
    assert moved > 0
    # one more step decreases the loss on this fixed batch
    _, _, lp2 = train_step(sp2, opt_state)
    assert float(lp2) < float(lp)


def test_pipeline_composes_with_data_axis():
    """(data=2, pipe=4) mesh: each data row pipelines its batch shard;
    results equal the serial composition on the full batch."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("data", PIPE_AXIS))
    p, d = 4, 8
    rng = np.random.RandomState(3)
    stages = [{"w": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3)}
              for _ in range(p)]

    def stage_fn(params, x):
        return jnp.tanh(x @ params["w"])

    x = jnp.asarray(rng.randn(8, d).astype(np.float32))
    want = x
    for s in stages:
        want = stage_fn(s, want)
    got = pipeline(mesh, stage_fn, stack_stages(stages), x, n_micro=2,
                   data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
