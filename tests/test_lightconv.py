"""Lightweight/dynamic convolution decoder variants.

Parity targets: espnet/nets/pytorch_backend/transformer/{lightconv,
lightconv2d,dynamic_conv,dynamic_conv2d}.py and the decoder classes in
espnet2/asr/decoder/transformer_decoder.py:283-528.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_slurp_tpu.models.lightconv import LightweightConvolution
from espnet_slurp_tpu.models.transformer import TransformerDecoder

VARIANTS = ["lightconv", "lightconv2d", "dynamicconv", "dynamicconv2d"]


def _mod(variant, use_kernel_mask=True, k=5):
    return LightweightConvolution(
        wshare=2, n_feat=16, kernel_size=k, use_kernel_mask=use_kernel_mask,
        use_bias=True, two_dim=variant.endswith("2d"),
        dynamic=variant.startswith("dynamic"))


@pytest.mark.parametrize("variant", VARIANTS)
def test_causal_masking(variant):
    mod = _mod(variant)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 16))
    params = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(params, x)
    assert y.shape == (2, 9, 16)
    # perturb the future: outputs at positions <= 4 must not move
    x2 = x.at[:, 5:].add(10.0)
    y2 = mod.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y[:, :5]), np.asarray(y2[:, :5]),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(y[:, 5:]), np.asarray(y2[:, 5:]))


@pytest.mark.parametrize("variant", VARIANTS)
def test_noncausal_pad_masking(variant):
    mod = _mod(variant, use_kernel_mask=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 7, 16))
    params = mod.init(jax.random.PRNGKey(1), x)
    pad = jnp.array([[True] * 5 + [False] * 2])
    y = mod.apply(params, x, pad_mask=pad)
    assert y.shape == (1, 7, 16)


@pytest.mark.parametrize("variant", VARIANTS)
def test_step_matches_full_forward(variant):
    """Step-by-step decode through the ring-buffer cache must reproduce the
    full teacher-forced forward (the KV-cache equivalence the reference
    checks for its decoders)."""
    mod = _mod(variant, k=5)
    b, t, d = 2, 7, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    params = mod.init(jax.random.PRNGKey(1), x)
    full = mod.apply(params, x)
    cache = mod.apply(params, b, t, method=LightweightConvolution.init_cache)
    outs = []
    for i in range(t):
        y, cache = mod.apply(params, x[:, i:i + 1], cache, i,
                             method=LightweightConvolution.step)
        outs.append(y)
    step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("selfattn", ["lightconv", "dynamicconv"])
def test_decoder_step_equivalence(selfattn):
    dec = TransformerDecoder(vocab_size=11, d_model=16, n_head=2, d_ff=32,
                             num_blocks=2, selfattn_type=selfattn,
                             conv_kernel=5)
    b, l, tm = 2, 6, 9
    ys = jnp.array([[1, 2, 3, 4, 5, 6], [2, 3, 4, 5, 6, 7]])
    ys_lengths = jnp.array([6, 6])
    memory = jax.random.normal(jax.random.PRNGKey(0), (b, tm, 16))
    mlens = jnp.array([9, 7])
    params = dec.init(jax.random.PRNGKey(1), ys, ys_lengths, memory, mlens)
    full = dec.apply(params, ys, ys_lengths, memory, mlens)
    cache = dec.apply(params, b, l, method=TransformerDecoder.init_cache)
    mem_kv = dec.apply(params, memory,
                       method=TransformerDecoder.precompute_memory)
    logits = []
    for i in range(l):
        lg, cache = dec.apply(params, ys[:, i], i, cache, mem_kv, mlens, l,
                              method=TransformerDecoder.step)
        logits.append(lg)
    step = jnp.stack(logits, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(step),
                               rtol=2e-4, atol=2e-4)


def test_asr_model_conv_decoder_trains():
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel

    cfg = ASRConfig(vocab_size=12, d_model=32, n_head=2, d_ff=64,
                    num_encoder_blocks=1, num_decoder_blocks=1,
                    decoder_d_ff=64, decoder="dynamic_conv",
                    decoder_conv_kernel=5, ctc_weight=0.3,
                    dropout_rate=0.0, specaug=None)
    model = ASRModel(cfg)
    b, t = 2, 2000
    speech = jax.random.normal(jax.random.PRNGKey(0), (b, t)) * 0.1
    speech_lengths = jnp.array([t, t - 400])
    text = jnp.array([[3, 4, 5, -1], [6, 7, -1, -1]])
    text_lengths = jnp.array([3, 2])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, speech_lengths, text, text_lengths)
    (loss, stats), grads = jax.value_and_grad(
        lambda p: model.apply(p, speech, speech_lengths, text, text_lengths,
                              train=False), has_aux=True)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
