"""Conformer encoder completeness: subsampling factors, linear input layer,
stochastic depth, interCTC self-conditioning.

Parity targets: reference transformer/subsampling.py (Conv2dSubsampling2/6/8),
espnet2/asr/encoder/conformer_encoder.py:114-186 (input_layer), 232-241
(stochastic_depth_rate), 336-358 (interctc_use_conditioning).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espnet_slurp_tpu.models.conformer import ConformerEncoder
from espnet_slurp_tpu.models.embedding import Conv2dSubsampling


@pytest.mark.parametrize("factor", [2, 4, 6, 8])
def test_subsampling_factors(factor):
    mod = Conv2dSubsampling(odim=32, factor=factor)
    x = jnp.ones((2, 61, 40))
    y, _ = mod.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape[0] == 2 and y.shape[2] == 32
    assert y.shape[1] == Conv2dSubsampling.out_length_static(61, factor)
    # array out_length agrees with static
    lens = Conv2dSubsampling.out_length(jnp.array([61, 45]), factor)
    assert int(lens[0]) == y.shape[1]
    # the factor actually reduces time by roughly that factor
    assert 61 // factor - 4 <= y.shape[1] <= 61 // factor + 1


def test_out_length_factor4_matches_legacy():
    # legacy formula (((T-1)//2)-1)//2 must be preserved exactly
    t = jnp.arange(8, 200)
    legacy = (((t - 1) // 2) - 1) // 2
    np.testing.assert_array_equal(
        np.asarray(Conv2dSubsampling.out_length(t, 4)), np.asarray(legacy))


def _encode(enc, feats, lens, rng=0, deterministic=True):
    params = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, lens, deterministic=True)
    return enc.apply(params, feats, lens, deterministic=deterministic,
                     rngs={"dropout": jax.random.PRNGKey(rng)}), params


def test_linear_input_layer():
    enc = ConformerEncoder(d_model=32, n_head=2, d_ff=64, num_blocks=1,
                           input_layer="linear", flash="off")
    feats = jnp.ones((2, 17, 40))
    lens = jnp.array([17, 11])
    (x, olens, inter), _ = _encode(enc, feats, lens)
    assert x.shape == (2, 17, 32)
    np.testing.assert_array_equal(np.asarray(olens), [17, 11])


def test_encoder_subsampling_factor_6():
    enc = ConformerEncoder(d_model=32, n_head=2, d_ff=64, num_blocks=1,
                           subsampling_factor=6, flash="off")
    feats = jnp.ones((2, 67, 40))
    lens = jnp.array([67, 43])
    (x, olens, _), _ = _encode(enc, feats, lens)
    assert x.shape[1] == Conv2dSubsampling.out_length_static(67, 6)
    assert int(olens[1]) == int(Conv2dSubsampling.out_length(
        jnp.array([43]), 6)[0])


def test_stochastic_depth_skips_layers():
    kw = dict(d_model=32, n_head=2, d_ff=64, num_blocks=4, dropout_rate=0.0,
              flash="off")
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 29, 40))
    lens = jnp.array([29, 29])
    enc_sd = ConformerEncoder(stochastic_depth_rate=0.5, **kw)
    (y1, _, _), params = _encode(enc_sd, feats, lens, rng=3,
                                 deterministic=False)
    y2, _, _ = enc_sd.apply(params, feats, lens, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(4)})
    # different draws -> different layer subsets -> different outputs
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # rate 0 at train time (no dropout) == deterministic forward
    enc0 = ConformerEncoder(stochastic_depth_rate=0.0, **kw)
    (a, _, _), p0 = _encode(enc0, feats, lens, deterministic=False)
    b, _, _ = enc0.apply(p0, feats, lens, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_self_conditioning_taps_are_logits():
    vocab = 11
    enc = ConformerEncoder(d_model=32, n_head=2, d_ff=64, num_blocks=2,
                           interctc_layers=(1,), self_cond_vocab=vocab,
                           flash="off")
    feats = jnp.ones((2, 29, 40))
    lens = jnp.array([29, 21])
    (x, olens, inter), params = _encode(enc, feats, lens)
    assert len(inter) == 1
    layer, logits = inter[0]
    assert layer == 1
    assert logits.shape == (2, x.shape[1], vocab)
    # conditioning head exists and is shared (one sc_ctc kernel)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("sc_ctc" in n for n in names)
    assert any("sc_cond" in n for n in names)


def test_asr_model_self_conditioned_interctc_trains():
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel

    cfg = ASRConfig(vocab_size=12, d_model=32, n_head=2, d_ff=64,
                    num_encoder_blocks=2, num_decoder_blocks=1,
                    decoder_d_ff=64, ctc_weight=0.5, interctc_weight=0.3,
                    interctc_layers=(1,), self_conditioning=True,
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

    def loss_fn(p):
        loss, stats = model.apply(
            p, speech, speech_lengths, text, text_lengths, train=False)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "loss_interctc" in stats
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
