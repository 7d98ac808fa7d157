"""Sequence-parallelism tests: time-axis activation sharding compiles,
executes, and is numerically identical to the unsharded path.

New-capability target (SURVEY.md §2.10): the reference has no sequence
parallelism; long-input handling there is batch-1 chunked iteration.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.parallel.mesh import make_mesh, shard_batch
from espnet_slurp_tpu.parallel.seq import (activation_sharding,
                                           constrain_acts)


def _tiny_model():
    cfg = ASRConfig(
        vocab_size=32, d_model=32, n_head=2, d_ff=64,
        num_encoder_blocks=2, num_decoder_blocks=1, decoder_d_ff=64,
        kernel_size=7, dropout_rate=0.0, use_mvn="none", specaug=None,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16))
    return ASRModel(cfg), cfg


def test_constrain_acts_noop_outside_context():
    x = jnp.ones((2, 8, 4))
    assert constrain_acts(x) is x


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_seq_sharded_forward_matches_unsharded():
    model, cfg = _tiny_model()
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(4, 4096).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([4096, 4096, 3000, 2048], jnp.int32),
        "text": jnp.asarray(rng.randint(1, 31, (4, 5)), jnp.int32),
        "text_lengths": jnp.asarray([5, 4, 5, 3], jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p, b):
        loss, _ = model.apply({"params": p}, **b)
        return loss

    want = float(jax.jit(loss_fn)(params, batch))

    from espnet_slurp_tpu.parallel.sharding import shard_params
    mesh = make_mesh(n_data=2, n_seq=2, n_model=2)
    assert mesh.axis_names == ("data", "seq", "model")
    sbatch = shard_batch(mesh, batch)
    tp_params = shard_params(params, mesh)  # the real training setup
    with activation_sharding(mesh):
        got = float(jax.jit(loss_fn)(tp_params, sbatch))
    np.testing.assert_allclose(got, want, rtol=2e-5)

    # gradients also match through the sharded graph (this pins the
    # P((data, model), seq) spec choice — see parallel/seq.py docstring:
    # an idle mesh axis in seq-sharded conv compute doubles conv grads)
    grad_want = jax.jit(jax.grad(loss_fn))(params, batch)
    with activation_sharding(mesh):
        grad_got = jax.jit(jax.grad(loss_fn))(tp_params, sbatch)
    for a, b in zip(jax.tree.leaves(grad_want), jax.tree.leaves(grad_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_seq_only_mesh_matches():
    """(data, seq) mesh without tensor parallelism is also exact."""
    model, cfg = _tiny_model()
    rng = np.random.RandomState(1)
    batch = {
        "speech": jnp.asarray(rng.randn(4, 2048).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([2048, 2048, 1500, 1024], jnp.int32),
        "text": jnp.asarray(rng.randint(1, 31, (4, 4)), jnp.int32),
        "text_lengths": jnp.asarray([4, 3, 4, 2], jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p, b):
        loss, _ = model.apply({"params": p}, **b)
        return loss

    want = float(jax.jit(loss_fn)(params, batch))
    mesh = make_mesh(n_data=4, n_seq=2, n_model=1)
    sbatch = shard_batch(mesh, batch)
    with activation_sharding(mesh):
        got = float(jax.jit(loss_fn)(params, sbatch))
    np.testing.assert_allclose(got, want, rtol=2e-5)
