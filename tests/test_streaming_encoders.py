"""Longformer sliding-window + contextual-block encoder tests.

Reference parity targets: espnet2/asr/encoder/longformer_encoder.py
(attention_window) and contextual_block_conformer_encoder.py
(block_size/hop_size/look_ahead with context inheritance).
"""
import numpy as np
import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel, \
    build_encoder
from espnet_slurp_tpu.models.contextual_block import \
    ContextualBlockConformerEncoder
from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.ops.masks import band_mask


def _feats(b=2, t=64, f=16, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, t, f).astype(np.float32))
    lens = jnp.asarray([t, t - 10], np.int32)
    return x, lens


def test_band_mask():
    m = np.asarray(band_mask(5, 1))
    assert m[2, 1] and m[2, 2] and m[2, 3]
    assert not m[2, 0] and not m[2, 4]


def test_longformer_encoder_window_limits_receptive_field():
    cfg = ASRConfig(vocab_size=11, encoder="longformer", attention_window=2,
                    d_model=16, n_head=2, d_ff=32, num_encoder_blocks=1,
                    kernel_size=3, dropout_rate=0.0,
                    frontend=FrontendConfig(n_fft=128, hop_length=64,
                                            n_mels=16))
    enc = build_encoder(cfg)
    x, lens = _feats()
    params = enc.init(jax.random.PRNGKey(0), x, lens)["params"]
    y, olens, _ = enc.apply({"params": params}, x, lens)
    assert y.shape[0] == 2 and y.shape[2] == 16
    assert np.isfinite(np.asarray(y)).all()
    # Perturb the tail; with window=2 and 1 block (+ conv kernel 3,
    # + subsample receptive field) early frames must be unaffected.
    x2 = x.at[:, 40:, :].add(100.0)
    y2, _, _ = enc.apply({"params": params}, x2, lens)
    t_safe = 3  # post-subsample frame well outside the receptive field
    np.testing.assert_allclose(np.asarray(y[:, :t_safe]),
                               np.asarray(y2[:, :t_safe]), atol=1e-4)


def test_contextual_block_shapes_and_grads():
    enc = ContextualBlockConformerEncoder(
        d_model=16, n_head=2, d_ff=32, num_blocks=2, kernel_size=3,
        block_size=8, hop_size=4, look_ahead=2)
    x, lens = _feats(t=80)
    params = enc.init(jax.random.PRNGKey(0), x, lens)["params"]
    y, olens, inter = enc.apply({"params": params}, x, lens)
    t_out = y.shape[1]
    assert y.shape == (2, t_out, 16)
    assert int(olens[0]) <= t_out
    assert np.isfinite(np.asarray(y)).all()
    # Padded region zeroed.
    assert float(jnp.abs(y[1, int(olens[1]):]).max()) == 0.0

    def loss(p):
        out, _, _ = enc.apply({"params": p}, x, lens)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_contextual_block_streaming_causality():
    """Future input beyond a block's look-ahead must not change its output
    (right-to-left flow is bounded; left-to-right rides the context)."""
    enc = ContextualBlockConformerEncoder(
        d_model=16, n_head=2, d_ff=32, num_blocks=2, kernel_size=3,
        block_size=8, hop_size=4, look_ahead=2)
    rng = np.random.RandomState(1)
    t = 160
    x = jnp.asarray(rng.randn(1, t, 16).astype(np.float32))
    lens = jnp.asarray([t], np.int32)
    params = enc.init(jax.random.PRNGKey(0), x, lens)["params"]
    y, _, _ = enc.apply({"params": params}, x, lens)
    # Perturb inputs far in the future (feature frames >= 120 ->
    # post-subsample frames >= ~30).
    x2 = x.at[:, 120:, :].add(50.0)
    y2, _, _ = enc.apply({"params": params}, x2, lens)
    # Block 0 output frames (post-subsample 0..3) depend on frames
    # < block_size + margin; they must be identical.
    np.testing.assert_allclose(np.asarray(y[:, :4]), np.asarray(y2[:, :4]),
                               atol=1e-4)


def test_asr_model_with_contextual_block_encoder():
    cfg = ASRConfig(vocab_size=11, encoder="contextual_block_conformer",
                    d_model=16, n_head=2, d_ff=32, num_encoder_blocks=1,
                    num_decoder_blocks=1, decoder_d_ff=32, kernel_size=3,
                    dropout_rate=0.0, block_size=8, hop_size=4, look_ahead=2,
                    frontend=FrontendConfig(n_fft=128, hop_length=64,
                                            n_mels=16), specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    b, n, u = 2, 6400, 5
    speech = jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.1)
    slen = jnp.full((b,), n, jnp.int32)
    text = jnp.asarray(rng.randint(1, 10, (b, u)), jnp.int32)
    tlen = jnp.full((b,), u, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), speech, slen, text,
                        tlen)["params"]
    loss, stats = model.apply({"params": params}, speech, slen, text, tlen)
    assert np.isfinite(float(loss))
