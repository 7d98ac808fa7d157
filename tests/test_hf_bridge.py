"""HF pretrained-LM bridge tests: converted weights reproduce torch hidden
states (reference hugging_face_transformers_postdecoder.py / modality/
roberta.py use the torch models directly; parity = matching outputs).

Uses randomly-initialized HF models built from configs (no network);
released checkpoints load through the same state_dict path.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.hf_transformer import (
    BertConfig, BertModel, GPT2Config, GPT2Model, bert_params_from_torch,
    gpt2_params_from_torch)


def test_bert_matches_torch():
    hf_cfg = transformers.BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    tm = transformers.BertModel(hf_cfg).eval()
    ids = torch.randint(0, 100, (2, 9))
    mask = torch.ones(2, 9, dtype=torch.long)
    mask[1, 6:] = 0
    with torch.no_grad():
        want = tm(input_ids=ids, attention_mask=mask).last_hidden_state

    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=40)
    params = bert_params_from_torch(tm.state_dict(), cfg)
    got = BertModel(cfg).apply({"params": jax.tree.map(jnp.asarray, params)},
                               jnp.asarray(ids.numpy()),
                               jnp.asarray(mask.numpy()))
    valid = np.asarray(mask)[:, :, None].astype(bool)
    err = np.max(np.abs(np.where(valid, np.asarray(got) - want.numpy(), 0)))
    assert err < 2e-5, err


def test_gpt2_matches_torch():
    hf_cfg = transformers.GPT2Config(
        vocab_size=120, n_embd=32, n_layer=2, n_head=2, n_positions=40,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    tm = transformers.GPT2Model(hf_cfg).eval()
    ids = torch.randint(0, 120, (2, 11))
    with torch.no_grad():
        want = tm(input_ids=ids).last_hidden_state

    cfg = GPT2Config(vocab_size=120, n_embd=32, n_layer=2, n_head=2,
                     n_positions=40)
    params = gpt2_params_from_torch(tm.state_dict(), cfg)
    got = GPT2Model(cfg).apply({"params": jax.tree.map(jnp.asarray, params)},
                               jnp.asarray(ids.numpy()))
    err = np.max(np.abs(np.asarray(got) - want.numpy()))
    assert err < 2e-5, err


def test_dir_roundtrip(tmp_path):
    """load_bert_from_dir reads a saved HF checkpoint directory."""
    hf_cfg = transformers.BertConfig(
        vocab_size=60, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=24, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    tm = transformers.BertModel(hf_cfg).eval()
    tm.save_pretrained(tmp_path / "bert", safe_serialization=False)
    from espnet_slurp_tpu.models.hf_transformer import load_bert_from_dir
    model, params = load_bert_from_dir(str(tmp_path / "bert"))
    ids = torch.randint(0, 60, (1, 7))
    with torch.no_grad():
        want = tm(input_ids=ids).last_hidden_state
    got = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    assert np.max(np.abs(np.asarray(got) - want.numpy())) < 2e-5


def test_slu_bert_postdecoder_and_grafting(tmp_path):
    """Two-pass SLU with postdecoder='bert': loss runs, and pretrained HF
    weights graft into the text_encoder subtree byte-for-byte."""
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.slu.model import SLUConfig, SLUModel
    from espnet_slurp_tpu.tasks.slu import SLUTask
    import dataclasses

    hf_cfg = transformers.BertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=24, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    tm = transformers.BertModel(hf_cfg).eval()
    tm.save_pretrained(tmp_path / "bert", safe_serialization=False)

    cfg = SLUConfig(
        asr=ASRConfig(vocab_size=30, d_model=16, n_head=2, d_ff=32,
                      num_encoder_blocks=1, num_decoder_blocks=1,
                      decoder_d_ff=32, kernel_size=7, dropout_rate=0.0,
                      frontend=FrontendConfig(n_fft=128, hop_length=64,
                                              n_mels=16), specaug=None),
        two_pass=True, transcript_vocab_size=50, text_encoder_blocks=1,
        text_encoder_d_ff=32, postdecoder="bert",
        postdecoder_hf_dir=str(tmp_path / "bert"))
    model = SLUModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 28, (2, 5))),
        "text_lengths": jnp.asarray([5, 3]),
        "transcript": jnp.asarray(rng.randint(1, 49, (2, 7))),
        "transcript_lengths": jnp.asarray([7, 4]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    params = SLUTask.load_postdecoder_weights(params, cfg)
    # grafted weights match the torch checkpoint exactly
    got = np.asarray(
        params["text_encoder"]["bert"]["word_embeddings"]["embedding"])
    want = tm.state_dict()["embeddings.word_embeddings.weight"].numpy()
    assert np.array_equal(got, want)
    loss, stats = model.apply({"params": params}, **batch)
    assert np.isfinite(float(loss))


def test_gpt2_joint_text_with_slot_generator():
    """KA2G: slot generator over GPT-2 transcript hidden states."""
    from espnet_slurp_tpu.slu.generator import (GPT2JointText, SlotGenConfig,
                                                SlotGenerator)
    rng = np.random.RandomState(0)
    joint = GPT2JointText(vocab_size=40, d_model=32, n_layer=1, n_head=2,
                          n_embd=32)
    tokens = jnp.asarray(rng.randint(1, 39, (2, 6)))
    lengths = jnp.asarray([6, 4])
    jp = joint.init(jax.random.PRNGKey(0), tokens, lengths)["params"]
    memory, mask = joint.apply({"params": jp}, tokens, lengths)
    assert memory.shape == (2, 6, 32)

    cfg = SlotGenConfig(n_slots=3, value_vocab_size=40, d_model=32,
                        n_head=2, d_ff=64, num_blocks=1, max_value_len=4,
                        use_tcpgen=False)
    gen = SlotGenerator(cfg)
    values = jnp.asarray(rng.randint(1, 39, (2, 3, 4)))
    vlens = jnp.full((2, 3), 4)
    present = jnp.asarray([[1, 0, 1], [0, 1, 0]])
    gp = gen.init(jax.random.PRNGKey(1), memory, mask, present, values,
                  vlens)["params"]
    loss, stats = gen.apply({"params": gp}, memory, mask, present, values,
                            vlens)
    assert np.isfinite(float(loss))
