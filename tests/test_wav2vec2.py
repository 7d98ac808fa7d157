"""wav2vec2 tests: HF weight-import equivalence, contrastive pretraining
step, and raw-waveform ASR encoder integration.

Parity target: reference espnet2/asr/encoder/wav2vec2_encoder.py
(FairSeqWav2Vec2Encoder) — parity = the in-framework encoder reproduces a
real (randomly initialized) HF Wav2Vec2Model's hidden states through the
converted weights.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.wav2vec2 import (Wav2Vec2Config,
                                              Wav2Vec2Encoder,
                                              Wav2Vec2PretrainModel,
                                              conv_out_lengths,
                                              wav2vec2_params_from_torch)

TINY = Wav2Vec2Config(
    conv_dim=(16, 16), conv_kernel=(8, 4), conv_stride=(4, 2),
    d_model=32, n_head=2, d_ff=64, num_blocks=2, pos_conv_kernel=16,
    pos_conv_groups=2, mask_prob=0.3, mask_span=3, n_negatives=8,
    quantizer_groups=2, quantizer_entries=10, vq_dim=16, final_dim=16)


def test_wav2vec2_matches_hf():
    hf_cfg = transformers.Wav2Vec2Config(
        conv_dim=(16, 16), conv_kernel=(8, 4), conv_stride=(4, 2),
        hidden_size=32, num_attention_heads=2, intermediate_size=64,
        num_hidden_layers=2, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2, feat_extract_norm="group",
        do_stable_layer_norm=False, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        hidden_act="gelu")
    tm = transformers.Wav2Vec2Model(hf_cfg).eval()
    wav = torch.randn(2, 800)
    with torch.no_grad():
        want = tm(wav).last_hidden_state

    params = wav2vec2_params_from_torch(tm.state_dict(), TINY)
    enc = Wav2Vec2Encoder(TINY)
    hs, lens, _ = enc.apply({"params": jax.tree.map(jnp.asarray, params)},
                            jnp.asarray(wav.numpy()),
                            jnp.asarray([800, 800]))
    got = np.asarray(hs)
    assert got.shape == tuple(want.shape)
    err = np.max(np.abs(got - want.numpy()))
    assert err < 2e-4, err


def test_conv_out_lengths():
    lens = conv_out_lengths(jnp.asarray([800, 400]), TINY.conv_kernel,
                            TINY.conv_stride)
    # torch conv math: (800-8)//4+1 = 199 -> (199-4)//2+1 = 98
    np.testing.assert_array_equal(np.asarray(lens), [98, 48])


def test_wav2vec2_pretrain_step():
    import optax
    model = Wav2Vec2PretrainModel(TINY)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 800).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([800, 600], jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(2)},
        **batch, mask_rng=jax.random.PRNGKey(1))["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch,
                           mask_rng=jax.random.PRNGKey(1),
                           rngs={"dropout": jax.random.PRNGKey(2)})

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(stats["acc_masked"]) <= 1.0
    assert float(stats["mask_ratio"]) > 0.0
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    # one step reduces loss on the same batch (learnable objective)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    for _ in range(3):
        (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        ups, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, ups)
    loss2, _ = loss_fn(params)
    assert float(loss2) < float(loss)


def test_wav2vec2_as_asr_encoder():
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    cfg = ASRConfig(vocab_size=20, encoder="wav2vec2", wav2vec2=TINY,
                    d_model=32, n_head=2, d_ff=64, num_decoder_blocks=1,
                    decoder_d_ff=64, ctc_weight=0.3, specaug=None,
                    use_mvn="none")
    model = ASRModel(cfg)
    rng = np.random.RandomState(1)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 800).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([800, 600], jnp.int32),
        "text": jnp.asarray(rng.randint(1, 19, (2, 4)), jnp.int32),
        "text_lengths": jnp.asarray([4, 3], jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
