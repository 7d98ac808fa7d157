"""Fused FFN Pallas kernel (ops/pallas/ffn.py) vs the pure-JAX path.

Mirrors the flash-attention test strategy: interpret mode on CPU pins the
kernel's math (fwd + all five grads); the dropout path checks determinism
given a fixed seed, the expected zero fraction, and mask consistency
between forward and backward (recompute scheme).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_slurp_tpu.ops.pallas.ffn import fused_ffn

B, T, D, F = 2, 128, 256, 512


def _ref(x, w1, b1, w2, b2):
    h = jax.nn.swish(x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1)
    return (h @ w2.astype(jnp.float32) + b2).astype(x.dtype)


def _inputs(dtype=jnp.float32, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(B, T, D), dtype) * 0.5
    w1 = jnp.asarray(r.randn(D, F) / np.sqrt(D), dtype)
    b1 = jnp.asarray(r.randn(F), jnp.float32) * 0.1
    w2 = jnp.asarray(r.randn(F, D) / np.sqrt(F), dtype)
    b2 = jnp.asarray(r.randn(D), jnp.float32) * 0.1
    return x, w1, b1, w2, b2


def test_forward_matches_reference():
    x, w1, b1, w2, b2 = _inputs()
    out = fused_ffn(x, w1, b1, w2, b2, interpret=True)
    ref = _ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_reference():
    x, w1, b1, w2, b2 = _inputs(seed=1)
    cot = jnp.asarray(np.random.RandomState(2).randn(B, T, D), jnp.float32)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(fused_ffn(x, w1, b1, w2, b2, interpret=True) * cot)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(_ref(x, w1, b1, w2, b2) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, name in zip(gf, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_bf16_forward_tolerance():
    x, w1, b1, w2, b2 = _inputs(dtype=jnp.bfloat16, seed=3)
    out = fused_ffn(x, w1, b1, w2, b2, interpret=True)
    ref = _ref(x, w1, b1, w2, b2)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_dropout_deterministic_and_scaled():
    x, w1, b1, w2, b2 = _inputs(seed=4)
    seed = jnp.asarray([7], jnp.int32)
    o1 = fused_ffn(x, w1, b1, w2, b2, seed, dropout_rate=0.5, interpret=True)
    o2 = fused_ffn(x, w1, b1, w2, b2, seed, dropout_rate=0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # A different seed must change the mask.
    o3 = fused_ffn(x, w1, b1, w2, b2, jnp.asarray([8], jnp.int32),
                   dropout_rate=0.5, interpret=True)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


def test_dropout_grads_consistent_with_fwd_mask():
    """Backward regenerates the same mask as forward: extract the realized
    mask (identity W2 returns the dropped hidden), rebuild the exact same
    function with that mask explicit, and compare all five grads."""
    x, w1, b1, w2, b2 = _inputs(seed=5)
    seed = jnp.asarray([11], jnp.int32)
    rate = 0.3
    hd = fused_ffn(x, w1, b1, jnp.eye(F, dtype=jnp.float32),
                   jnp.zeros((F,), jnp.float32), seed, dropout_rate=rate,
                   interpret=True)
    mask = np.asarray(hd) != 0.0  # keep-mask realized by the kernel

    def ref(x, w1, b1, w2, b2):
        h = jax.nn.swish(x @ w1 + b1)
        h = jnp.where(mask, h / (1.0 - rate), 0.0)
        return h @ w2 + b2

    cot = jnp.asarray(np.random.RandomState(6).randn(B, T, D), jnp.float32)

    def loss_fused(*a):
        return jnp.sum(fused_ffn(*a, seed, dropout_rate=rate,
                                 interpret=True) * cot)

    def loss_ref(*a):
        return jnp.sum(ref(*a) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, name in zip(gf, gr, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_conformer_block_uses_fused_path():
    """FeedForward(use_flash=True) on 128-multiple shapes routes through
    the kernel (interpret on CPU) and keeps the w1/w2 param tree."""
    from espnet_slurp_tpu.models.conformer import FeedForward
    x = jnp.asarray(np.random.RandomState(7).randn(2, 128, 256), jnp.float32)
    ff = FeedForward(256, 512, dropout_rate=0.0, use_flash=True)
    params = ff.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"w1", "w2"}
    out_fused = ff.apply({"params": params}, x)
    out_plain = FeedForward(256, 512, dropout_rate=0.0,
                            use_flash=False).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t", [100, 130])
def test_non_tileable_falls_back(t):
    """Shapes that don't tile (T not a 128 multiple) use the plain path."""
    from espnet_slurp_tpu.models.conformer import FeedForward
    x = jnp.asarray(np.random.RandomState(8).randn(2, t, 256), jnp.float32)
    ff = FeedForward(256, 512, dropout_rate=0.0, use_flash=True)
    params = ff.init(jax.random.PRNGKey(0), x)["params"]
    out = ff.apply({"params": params}, x)
    assert out.shape == (2, t, 256)
