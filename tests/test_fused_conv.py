"""Fused conv-module Pallas kernel vs the unfused flax ConvModule.

The fused path (ops/pallas/conv_module.py) must match the layer-by-layer
flax composition — outputs AND gradients (params + input) — including
ragged pad masks and the causal variant. Runs in interpret mode on the CPU
test mesh; the Mosaic lowering shares the identical kernel body.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_slurp_tpu.models.conformer import ConvModule


def _mk(batch=3, t=37, d=128, k=15, causal=False, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(batch, t, d).astype(np.float32))
    lens = jnp.asarray([t, t - 9, t // 2][:batch], jnp.int32)
    pad_mask = jnp.arange(t)[None, :] < lens[:, None]
    ref = ConvModule(d, kernel_size=k, causal=causal, use_flash=False)
    fused = ConvModule(d, kernel_size=k, causal=causal, use_flash=True)
    params = ref.init(jax.random.key(seed), x, pad_mask)
    # give the weights scale so gradient comparisons are non-trivial
    params = jax.tree.map(
        lambda p: p + 0.02 * jnp.asarray(rng.randn(*p.shape), p.dtype)
        if p.ndim >= 1 else p, params)
    return x, pad_mask, ref, fused, params


@pytest.mark.parametrize("causal", [False, True])
def test_fused_conv_forward_matches(causal):
    x, pad_mask, ref, fused, params = _mk(causal=causal)
    y_ref = ref.apply(params, x, pad_mask)
    y_fused = fused.apply(params, x, pad_mask)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=0, atol=2e-4)


def test_fused_conv_grads_match():
    x, pad_mask, ref, fused, params = _mk()
    gvec = jnp.asarray(np.random.RandomState(7).randn(*x.shape)
                       .astype(np.float32))

    def loss(mod):
        def f(p, xx):
            return jnp.sum(mod.apply(p, xx, pad_mask) * gvec)
        return jax.grad(f, argnums=(0, 1))(params, x)

    gp_ref, gx_ref = loss(ref)
    gp_fused, gx_fused = loss(fused)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref),
                               rtol=0, atol=3e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(gp_ref)
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(gp_fused))
    for path, leaf in flat_ref:
        got = flat_fused[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), rtol=0,
            atol=3e-3 * max(1.0, float(jnp.abs(leaf).max())),
            err_msg=str(path))


def test_fused_conv_no_mask():
    x, _, ref, fused, params = _mk(t=32)
    y_ref = ref.apply(params, x, None)
    y_fused = fused.apply(params, x, None)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=0, atol=2e-4)


def test_fused_conv_padding_isolated():
    """Content after the valid length must not change valid-frame outputs."""
    x, pad_mask, _, fused, params = _mk(t=40)
    y1 = fused.apply(params, x, pad_mask)
    noise = jnp.where(pad_mask[..., None], 0.0, 37.0)
    y2 = fused.apply(params, x + noise, pad_mask)
    valid = np.asarray(pad_mask)
    np.testing.assert_allclose(np.asarray(y1)[valid], np.asarray(y2)[valid],
                               rtol=0, atol=2e-4)
