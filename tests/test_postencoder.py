"""HF-transformers postencoder tests (espnet2/asr/postencoder/)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig


def test_asr_model_with_postencoder_and_length_adaptor():
    cfg = ASRConfig(
        vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3,
        postencoder="hf_bert", postencoder_layers=1, postencoder_hidden=32,
        postencoder_heads=2, postencoder_ff=64,
        postencoder_length_adaptor=1,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 18, size=(2, 3))),
        "text_lengths": jnp.asarray([3, 2]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    assert "postencoder" in params

    hs, hl, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    assert hs.shape[-1] == 32  # linear_out back to d_model
    # length adaptor halves frame counts
    hs0, hl0, _ = ASRModel(
        ASRConfig(**{**cfg.__dict__, "postencoder": ""})).apply(
        {"params": {k: v for k, v in params.items()
                    if k != "postencoder"}},
        batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    np.testing.assert_array_equal(np.asarray(hl),
                                  -(-np.asarray(hl0) // 2))

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, **batch)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_bert_inputs_embeds_matches_torch():
    """inputs_embeds path reproduces HF torch hidden states (the acoustic
    postencoder feed)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from espnet_slurp_tpu.models.hf_transformer import (
        BertConfig, BertModel, bert_params_from_torch)

    hf_cfg = transformers.BertConfig(
        vocab_size=50, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    tm = transformers.BertModel(hf_cfg).eval()
    embeds = torch.randn(2, 7, 32)
    mask = torch.ones(2, 7, dtype=torch.long)
    mask[1, 5:] = 0
    with torch.no_grad():
        want = tm(inputs_embeds=embeds,
                  attention_mask=mask).last_hidden_state

    cfg = BertConfig(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=40)
    params = bert_params_from_torch(tm.state_dict(), cfg)
    got = BertModel(cfg).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, None,
        attention_mask=jnp.asarray(mask.numpy()),
        inputs_embeds=jnp.asarray(embeds.numpy()))
    valid = np.asarray(mask)[:, :, None].astype(bool)
    err = np.max(np.abs(np.where(valid, np.asarray(got) - want.numpy(), 0)))
    assert err < 2e-5, err
