"""Cross-framework numerical parity vs the reference PyTorch implementation.

Each test instantiates the actual reference module from /root/reference (via
tests/ref_compat.py shims), converts its randomly-initialized torch weights
into our flax parameter trees, feeds identical inputs to both, and asserts
allclose in fp32. This turns "capabilities match" from a claim into a
measurement.

Reference anchors:
  * espnet2/layers/stft.py:56-170 (torch.stft wrapper)
  * espnet2/layers/log_mel.py:9-84
  * espnet/nets/pytorch_backend/transformer/attention.py:212-308 (+ rel_shift)
  * espnet/nets/pytorch_backend/conformer/encoder_layer.py:17-157
  * espnet2/asr/encoder/conformer_encoder.py:292-368 (full encoder)
  * espnet2/asr/decoder/transformer_decoder.py:90-240 (forward +
    forward_one_step incremental cache)
  * espnet/nets/ctc_prefix_score.py:12-188 (CTCPrefixScoreTH)
  * espnet/nets/pytorch_backend/rnn/decoders.py:215-228 (TCPGen pointer math)
"""
from __future__ import annotations

import numpy as np
import pytest

import ref_compat

if not ref_compat.ref_available():  # pragma: no cover
    pytest.skip("torch or /root/reference unavailable", allow_module_level=True)

ref_compat.install_shims()

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

SEED = 1234


def _rng():
    g = torch.Generator().manual_seed(SEED)
    return g


def _np_rng():
    return np.random.default_rng(SEED)


# ---------------------------------------------------------------------------
# 1. STFT
# ---------------------------------------------------------------------------

def test_stft_parity():
    from espnet2.layers.stft import Stft as RefStft
    from espnet_slurp_tpu.ops.stft import stft

    rng = _np_rng()
    b, n = 3, 4000
    x = rng.standard_normal((b, n)).astype(np.float32)
    ilens = np.array([4000, 3777, 2100])

    ref = RefStft(n_fft=512, win_length=400, hop_length=128, window="hann",
                  center=True, normalized=False, onesided=True)
    with torch.no_grad():
        ref_out, ref_olens = ref(torch.from_numpy(x.copy()),
                                 torch.from_numpy(ilens))

    mine = np.array(stft(jnp.asarray(x), n_fft=512, win_length=400,
                         hop_length=128, window="hann", center=True))
    # Zero padded frames the way the reference does before comparing.
    olens = np.asarray(ref_olens)
    for i, l in enumerate(olens):
        mine[i, l:] = 0.0
    ref_np = ref_out.numpy()
    assert mine.shape == ref_np.shape
    np.testing.assert_allclose(mine, ref_np, rtol=1e-4, atol=1e-4)

    from espnet_slurp_tpu.ops.stft import stft_out_lengths
    np.testing.assert_array_equal(
        np.asarray(stft_out_lengths(jnp.asarray(ilens), n_fft=512,
                                    hop=128, center=True)), olens)


# ---------------------------------------------------------------------------
# 2. LogMel (shared Slaney matrix; validates clamp/log/mask pipeline)
# ---------------------------------------------------------------------------

def test_logmel_parity():
    from espnet2.layers.log_mel import LogMel as RefLogMel
    from espnet_slurp_tpu.ops.mel import logmel

    rng = _np_rng()
    b, t, nbins = 3, 50, 257
    power = (rng.standard_normal((b, t, nbins)) ** 2).astype(np.float32)
    ilens = np.array([50, 31, 17])

    ref = RefLogMel(fs=16000, n_fft=512, n_mels=80)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(power), torch.from_numpy(ilens))

    mine = np.asarray(logmel(jnp.asarray(power), jnp.asarray(ilens),
                             fs=16000, n_fft=512, n_mels=80))
    np.testing.assert_allclose(mine, ref_out.numpy(), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# 3. Rel-pos multi-head attention (+ rel_shift + RelPositionalEncoding)
# ---------------------------------------------------------------------------

def _make_ref_relpos(d, h, g):
    from espnet.nets.pytorch_backend.transformer.attention import (
        RelPositionMultiHeadedAttention,
    )
    mod = RelPositionMultiHeadedAttention(h, d, dropout_rate=0.0)
    for p in mod.parameters():
        p.data.uniform_(-0.3, 0.3, generator=g)
    mod.eval()
    return mod


def test_relpos_attention_parity():
    from espnet.nets.pytorch_backend.transformer.embedding import (
        RelPositionalEncoding,
    )
    from espnet_slurp_tpu.models.attention import RelPosMultiHeadAttention
    from espnet_slurp_tpu.models.embedding import rel_positional_embedding
    from espnet_slurp_tpu.ops.masks import attention_bias, length_mask

    d, h, b, t = 64, 4, 3, 17
    g = _rng()
    ref = _make_ref_relpos(d, h, g)
    rng = _np_rng()
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    lens = np.array([17, 12, 5])

    pe = RelPositionalEncoding(d, dropout_rate=0.0)
    pe.eval()
    with torch.no_grad():
        _, pos_emb_t = pe(torch.from_numpy(x))
        mask_t = torch.arange(t)[None, :] < torch.from_numpy(lens)[:, None]
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(x),
                      torch.from_numpy(x), pos_emb_t, mask_t[:, None, :])

    pos_emb_mine = rel_positional_embedding(t, d)
    np.testing.assert_allclose(np.asarray(pos_emb_mine),
                               pos_emb_t.numpy(), rtol=1e-5, atol=1e-5)

    mine = RelPosMultiHeadAttention(n_head=h, n_feat=d, dropout_rate=0.0)
    params = ref_compat.relpos_attention(ref)
    bias = attention_bias(
        length_mask(jnp.asarray(lens), t)[:, None, None, :])
    out = mine.apply({"params": params}, jnp.asarray(x), pos_emb_mine, bias)
    out = np.asarray(out)
    # Padded query rows see all-masked scores in ours vs garbage-but-finite
    # in the reference; compare valid rows only.
    for i, l in enumerate(lens):
        np.testing.assert_allclose(out[i, :l], ref_out.numpy()[i, :l],
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# 4. Full conformer EncoderLayer (macaron + rel-pos MHSA + conv w/ BatchNorm)
# ---------------------------------------------------------------------------

def _make_ref_conformer_layer(d, h, d_ff, kernel, g):
    from espnet.nets.pytorch_backend.conformer.convolution import (
        ConvolutionModule,
    )
    from espnet.nets.pytorch_backend.conformer.encoder_layer import (
        EncoderLayer,
    )
    from espnet.nets.pytorch_backend.transformer.positionwise_feed_forward import (  # noqa: E501
        PositionwiseFeedForward,
    )

    swish = torch.nn.SiLU()
    layer = EncoderLayer(
        d,
        _make_ref_relpos(d, h, g),
        PositionwiseFeedForward(d, d_ff, 0.0, swish),
        PositionwiseFeedForward(d, d_ff, 0.0, swish),
        ConvolutionModule(d, kernel, swish),
        dropout_rate=0.0,
        normalize_before=True,
    )
    for name, p in layer.named_parameters():
        if "self_attn" not in name:
            p.data.uniform_(-0.1, 0.1, generator=g)
    # Non-trivial frozen BatchNorm running stats.
    layer.conv_module.norm.running_mean.uniform_(-0.5, 0.5, generator=g)
    layer.conv_module.norm.running_var.uniform_(0.5, 1.5, generator=g)
    layer.eval()
    return layer


def test_conformer_layer_parity():
    from espnet.nets.pytorch_backend.transformer.embedding import (
        RelPositionalEncoding,
    )
    from espnet_slurp_tpu.models.conformer import ConformerBlock
    from espnet_slurp_tpu.models.embedding import rel_positional_embedding
    from espnet_slurp_tpu.ops.masks import attention_bias, length_mask

    d, h, d_ff, kernel, b, t = 64, 4, 128, 15, 2, 21
    g = _rng()
    layer = _make_ref_conformer_layer(d, h, d_ff, kernel, g)
    rng = _np_rng()
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    lens = np.array([t, t])  # full lengths: the reference conv has no
    # pad-masking inside the module, so padded comparisons are out of scope

    pe = RelPositionalEncoding(d, dropout_rate=0.0)
    pe.eval()
    with torch.no_grad():
        _, pos_emb_t = pe(torch.from_numpy(x))
        mask_t = (torch.arange(t)[None, :]
                  < torch.from_numpy(lens)[:, None])[:, None, :]
        (ref_out, _), _ = layer((torch.from_numpy(x), pos_emb_t), mask_t)

    params, stats = ref_compat.conformer_encoder_layer(layer)
    block = ConformerBlock(d_model=d, n_head=h, d_ff=d_ff,
                           kernel_size=kernel, dropout_rate=0.0,
                           conv_norm="batch")
    pos_emb = rel_positional_embedding(t, d)
    pad = length_mask(jnp.asarray(lens), t)
    bias = attention_bias(pad[:, None, None, :])
    out = block.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), pos_emb, bias, pad)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 5. Full ConformerEncoder (conv2d x4 subsampling + N blocks + after_norm)
# ---------------------------------------------------------------------------

def test_conformer_encoder_parity():
    from espnet2.asr.encoder.conformer_encoder import (
        ConformerEncoder as RefEncoder,
    )
    from espnet_slurp_tpu.models.conformer import ConformerEncoder

    idim, d, h, d_ff, blocks, b, t = 40, 64, 4, 128, 2, 2, 70
    torch.manual_seed(SEED)
    ref = RefEncoder(
        input_size=idim, output_size=d, attention_heads=h, linear_units=d_ff,
        num_blocks=blocks, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="conv2d",
        rel_pos_type="latest",
        pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
        activation_type="swish", macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=15)
    g = _rng()
    for p in ref.parameters():
        p.data.uniform_(-0.15, 0.15, generator=g)
    for layer in ref.encoders:
        layer.conv_module.norm.running_mean.uniform_(-0.5, 0.5, generator=g)
        layer.conv_module.norm.running_var.uniform_(0.5, 1.5, generator=g)
    ref.eval()

    rng = _np_rng()
    x = rng.standard_normal((b, t, idim)).astype(np.float32)
    lens = np.array([t, t])
    with torch.no_grad():
        ref_out, ref_olens, _ = ref(torch.from_numpy(x),
                                    torch.from_numpy(lens))

    params, stats = ref_compat.conformer_encoder(ref, idim, d)
    mine = ConformerEncoder(d_model=d, n_head=h, d_ff=d_ff,
                            num_blocks=blocks, kernel_size=15,
                            dropout_rate=0.0, conv_norm="batch", flash="off")
    out, olens, _ = mine.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(olens), ref_olens.numpy())
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# 6. TransformerDecoder: full forward + incremental forward_one_step
# ---------------------------------------------------------------------------

def test_transformer_decoder_parity():
    from espnet2.asr.decoder.transformer_decoder import (
        TransformerDecoder as RefDecoder,
    )
    from espnet.nets.pytorch_backend.transformer.mask import subsequent_mask
    from espnet_slurp_tpu.models.transformer import TransformerDecoder

    v, d, h, d_ff, blocks, b, tm, l = 31, 64, 4, 128, 2, 2, 11, 7
    torch.manual_seed(SEED)
    ref = RefDecoder(vocab_size=v, encoder_output_size=d, attention_heads=h,
                     linear_units=d_ff, num_blocks=blocks, dropout_rate=0.0,
                     positional_dropout_rate=0.0,
                     self_attention_dropout_rate=0.0,
                     src_attention_dropout_rate=0.0)
    g = _rng()
    for p in ref.parameters():
        p.data.uniform_(-0.15, 0.15, generator=g)
    ref.eval()

    rng = _np_rng()
    memory = rng.standard_normal((b, tm, d)).astype(np.float32)
    mlens = np.array([tm, tm - 3])
    ys = rng.integers(0, v, size=(b, l)).astype(np.int64)
    ylens = np.array([l, l])

    with torch.no_grad():
        ref_logits, _ = ref(torch.from_numpy(memory), torch.from_numpy(mlens),
                            torch.from_numpy(ys), torch.from_numpy(ylens))

    mine = TransformerDecoder(vocab_size=v, d_model=d, n_head=h, d_ff=d_ff,
                              num_blocks=blocks, dropout_rate=0.0)
    params = ref_compat.transformer_decoder(ref)
    logits = mine.apply({"params": params}, jnp.asarray(ys),
                        jnp.asarray(ylens), jnp.asarray(memory),
                        jnp.asarray(mlens))
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=2e-4, atol=2e-4)

    # Incremental decode: my fixed-shape KV-cache step vs the reference's
    # growing-cache forward_one_step, token by token. forward_one_step
    # passes memory_mask=None (single unpadded utterance in beam search), so
    # compare with full memory lengths.
    full_mlens = np.array([tm, tm])
    max_len = l
    cache_t = None
    mem_t = torch.from_numpy(memory)
    step_fn = lambda *a, **k: mine.apply({"params": params}, *a, **k,
                                         method=TransformerDecoder.step)
    mem_kv = mine.apply({"params": params}, jnp.asarray(memory),
                        method=TransformerDecoder.precompute_memory)
    cache = mine.apply({"params": params}, b, max_len,
                       method=TransformerDecoder.init_cache)
    for i in range(l):
        with torch.no_grad():
            m = subsequent_mask(i + 1).unsqueeze(0)
            ref_lp, cache_t = ref.forward_one_step(
                torch.from_numpy(ys[:, :i + 1]), m, mem_t, cache=cache_t)
        logits_i, cache = step_fn(jnp.asarray(ys[:, i]), i, cache, mem_kv,
                                  jnp.asarray(full_mlens), max_len)
        lp = jax.nn.log_softmax(logits_i.astype(jnp.float32), axis=-1)
        np.testing.assert_allclose(np.asarray(lp), ref_lp.numpy(),
                                   rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 7. CTC prefix scoring (CTCPrefixScoreTH)
# ---------------------------------------------------------------------------

def test_ctc_prefix_parity():
    from espnet.nets.ctc_prefix_score import CTCPrefixScoreTH
    from espnet_slurp_tpu.decode import ctc_prefix

    rng = _np_rng()
    v, t = 8, 12
    blank, eos = 0, v - 1
    logits = rng.standard_normal((1, t, v)).astype(np.float32) * 2.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    lens = np.array([t])

    ref = CTCPrefixScoreTH(torch.from_numpy(lp.copy()),
                           torch.from_numpy(lens), blank, eos)

    lp_j = jnp.asarray(lp)
    lens_j = jnp.asarray(lens)
    state = ctc_prefix.init_state(lp_j, lens_j)
    cand = jnp.arange(v)[None, :]  # score every token each step

    seq = [3, 5, 5, 2]  # prefix to walk (no blanks/eos)
    prefix = [eos]  # reference uses sos(=eos id) as the seed token
    ref_state = None
    abs_prev = 0.0
    for step_i, tok in enumerate(seq):
        ref_inc, ref_state = ref([torch.as_tensor(prefix)], ref_state)
        ref_abs = ref_inc.numpy()[0] + abs_prev  # absolute log psi
        psi_new, r_new = ctc_prefix.score_candidates(
            state, lp_j, lens_j, cand, jnp.asarray([step_i]))
        mine_abs = np.asarray(psi_new)[0]
        # eos entry: reference puts prefix-complete score there; mine comes
        # from final_score.
        eos_mine = float(np.asarray(ctc_prefix.final_score(state, lens_j))[0])
        for c in range(v):
            if c == blank:
                continue
            if c == eos:
                np.testing.assert_allclose(eos_mine, ref_abs[c], rtol=1e-4,
                                           atol=1e-4)
                continue
            if ref_abs[c] < -1e5 and mine_abs[c] < -1e5:
                continue  # both "impossible"; logzero conventions differ
            np.testing.assert_allclose(mine_abs[c], ref_abs[c], rtol=1e-4,
                                       atol=1e-4,
                                       err_msg=f"step {step_i} token {c}")
        # advance both along `tok`
        abs_prev = ref_abs[tok]
        best = torch.as_tensor([[tok]])
        ref_state = ref.index_select_state(
            (ref_state[0], torch.from_numpy(ref_abs[None, :].copy()),
             ref_state[2], ref_state[3], ref_state[4]), best)
        state = ctc_prefix.select(r_new, psi_new, cand,
                                  jnp.asarray([tok]), state)
        prefix.append(tok)


# ---------------------------------------------------------------------------
# 8. TCPGen pointer math (get_meetingKB_emb_map) on an identical tiny KB
# ---------------------------------------------------------------------------

def test_tcpgen_pointer_parity():
    from espnet.nets.pytorch_backend.rnn.decoders import Decoder as RefDecoder
    from espnet_slurp_tpu.models.tcpgen import TCPGen

    rng = _np_rng()
    d, v, mb = 32, 20, 5  # model dim, vocab, max branching (children slots)
    n_children = 3
    torch.manual_seed(SEED)
    kproj_t = torch.nn.Linear(d, d)
    qproj_t = torch.nn.Linear(d, d)
    g = _rng()
    for m in (kproj_t, qproj_t):
        for p in m.parameters():
            p.data.uniform_(-0.3, 0.3, generator=g)

    child_tokens = np.array([4, 9, 13])
    child_embs = rng.standard_normal((n_children, d)).astype(np.float32)
    ookb_emb = rng.standard_normal((1, d)).astype(np.float32)
    raw_query = rng.standard_normal((1, d)).astype(np.float32)

    # --- reference: unbound call with the minimal attribute namespace
    import types as _types
    ns = _types.SimpleNamespace(dropout_KB=torch.nn.Identity(),
                                Kproj=kproj_t)
    # meeting_embs rows: children, pad slots (ookb emb), ookb slot (last)
    pad = mb - n_children
    embs_rows = np.concatenate(
        [child_embs] + [ookb_emb] * pad + [ookb_emb], axis=0)  # (mb+1, d)
    mask = np.array([0] * n_children + [1] * pad + [0], np.float32)
    back = np.zeros((mb + 1, v + 1), np.float32)
    for i, tok in enumerate(child_tokens):
        back[i, tok] = 1.0
    for i in range(n_children, mb + 1):
        back[i, v] = 1.0  # pad + ookb slots -> ooKB id
    with torch.no_grad():
        query_t = qproj_t(torch.from_numpy(raw_query))
        kb_emb_ref, ptr_ref = RefDecoder.get_meetingKB_emb_map(
            ns, query_t, torch.from_numpy(mask[None]),
            torch.from_numpy(embs_rows[None]), torch.from_numpy(back[None]))

    # --- mine: same trie expressed as flat padded arrays
    trie = {
        "trie_children_tok": jnp.asarray(
            np.stack([np.pad(child_tokens, (0, pad)),
                      np.zeros(mb, np.int64)]).astype(np.int32)),
        "trie_children_node": jnp.asarray(
            np.stack([np.arange(1, mb + 1),
                      np.zeros(mb)]).astype(np.int32)),
        "trie_n_children": jnp.asarray([n_children, 0], jnp.int32),
    }
    tree_encs = jnp.asarray(
        np.concatenate([np.zeros((1, d), np.float32), child_embs,
                        np.zeros((mb - n_children, d), np.float32)], axis=0))
    mine = TCPGen(d_model=d, vocab_size=v)
    params = {
        "Qproj": ref_compat.linear(qproj_t),
        "Kproj": ref_compat.linear(kproj_t),
        "pointer_gate": {"kernel": np.zeros((2 * d, 1), np.float32),
                         "bias": np.zeros((1,), np.float32)},
        "ooKBemb": jnp.asarray(ookb_emb),
        "tree_encoder": {},  # pre-encoded embeddings passed directly
    }
    init = mine.init(jax.random.PRNGKey(0), jnp.asarray(raw_query),
                     jnp.asarray([0]), trie, tree_encs)["params"]
    init.update({k: v for k, v in params.items() if k != "tree_encoder"})
    ptr, kb_emb = mine.apply({"params": init}, jnp.asarray(raw_query),
                             jnp.asarray([0], jnp.int32), trie, tree_encs)
    np.testing.assert_allclose(np.asarray(kb_emb), kb_emb_ref.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ptr), ptr_ref.numpy(),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# 9. Hypothesis-level beam-search parity: same converted weights, same
#    encoder output -> the reference BeamSearch (espnet/nets/beam_search.py
#    :281-408, decoder + CTC prefix + length bonus) and the repo's
#    batched lax.while_loop search return the same n-best tokens + scores.
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_beam_search_hypothesis_parity():
    from espnet.nets.beam_search import BeamSearch as RefBeamSearch
    from espnet.nets.scorers.ctc import CTCPrefixScorer as RefCTCScorer
    from espnet.nets.scorers.length_bonus import LengthBonus
    from espnet2.asr.ctc import CTC as RefCTC
    from espnet2.asr.decoder.transformer_decoder import (
        TransformerDecoder as RefDecoder,
    )
    from espnet_slurp_tpu.decode.beam import (BeamSearchConfig,
                                              batch_beam_search)
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig

    v, d, h, d_ff, blocks, t_enc = 14, 32, 2, 64, 2, 24
    sos = eos = v - 1
    torch.manual_seed(SEED)
    ref_dec = RefDecoder(vocab_size=v, encoder_output_size=d,
                         attention_heads=h, linear_units=d_ff,
                         num_blocks=blocks, dropout_rate=0.0,
                         positional_dropout_rate=0.0,
                         self_attention_dropout_rate=0.0,
                         src_attention_dropout_rate=0.0)
    ref_ctc = RefCTC(odim=v, encoder_output_size=d, dropout_rate=0.0)
    g = _rng()
    for p in list(ref_dec.parameters()) + list(ref_ctc.parameters()):
        p.data.uniform_(-0.25, 0.25, generator=g)
    # nudge eos up so every beam terminates naturally well before maxlen
    # (the reference scores a maxlen-forced eos differently: it appends
    # eos WITHOUT a decoder step, beam_search.py:437-443)
    ref_dec.output_layer.bias.data[eos] += 1.5
    ref_dec.eval()
    ref_ctc.eval()

    rng = _np_rng()
    hs = rng.standard_normal((1, t_enc, d)).astype(np.float32)

    ctc_weight, bonus, beam = 0.3, 0.4, 4
    ref_bs = RefBeamSearch(
        scorers={"decoder": ref_dec,
                 "ctc": RefCTCScorer(ctc=ref_ctc, eos=eos),
                 "length_bonus": LengthBonus(v)},
        weights={"decoder": 1.0 - ctc_weight, "ctc": ctc_weight,
                 "length_bonus": bonus},
        beam_size=beam, vocab_size=v, sos=sos, eos=eos,
        pre_beam_ratio=100.0, pre_beam_score_key="full")
    with torch.no_grad():
        # maxlenratio > 0 disables end_detect's early stop; 2*t_enc frames
        # is far beyond natural eos here
        nbest = ref_bs.forward(torch.from_numpy(hs[0]), maxlenratio=2.0)

    cfg = ASRConfig(vocab_size=v, d_model=d, n_head=h, d_ff=d_ff,
                    num_encoder_blocks=1, num_decoder_blocks=blocks,
                    decoder_d_ff=d_ff, kernel_size=7, dropout_rate=0.0,
                    ctc_weight=ctc_weight, flash_attention="off",
                    frontend=FrontendConfig(n_fft=128, hop_length=64,
                                            n_mels=16),
                    specaug=None)
    model = ASRModel(cfg)
    batch = {
        "speech": jnp.asarray(rng.standard_normal((1, 1600)),
                              jnp.float32) * 0.1,
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[1, 2, 3]], jnp.int32),
        "text_lengths": jnp.asarray([3]),
    }
    params = dict(model.init(jax.random.PRNGKey(0), **batch)["params"])
    params["decoder"] = ref_compat.transformer_decoder(ref_dec)
    params["ctc"] = ref_compat.linear(ref_ctc.ctc_lo)

    bcfg = BeamSearchConfig(beam_size=beam, pre_beam_size=v,
                            max_len=2 * t_enc, ctc_weight=ctc_weight,
                            length_bonus=bonus)
    tokens, lengths, nb_tokens, nb_lengths, nb_scores = batch_beam_search(
        model, params, jnp.asarray(hs), jnp.asarray([t_enc]), bcfg,
        return_nbest=True)

    # top-1: same token sequence, same total score
    want = [int(x) for x in nbest[0].yseq[1:-1]]  # strip sos/eos
    got = [int(x) for x in np.asarray(tokens[0])[: int(lengths[0])]]
    assert got == want, (got, want)
    np.testing.assert_allclose(float(nb_scores[0, 0]),
                               float(nbest[0].score), rtol=1e-3, atol=1e-3)
    # n-best prefix: compare as score-sorted SETS over the top 3 (ties in
    # total score can swap adjacent ranks between implementations)
    k_cmp = min(3, len(nbest))
    ref_set = {(tuple(int(x) for x in h_.yseq[1:-1]),
                round(float(h_.score), 3)) for h_ in nbest[:k_cmp]}
    mine_set = set()
    for j in range(k_cmp):
        lj = int(nb_lengths[0, j])
        mine_set.add((tuple(int(x) for x in np.asarray(nb_tokens[0, j])[:lj]),
                      round(float(nb_scores[0, j]), 3)))
    assert mine_set == ref_set, (mine_set, ref_set)


# ---------------------------------------------------------------------------
# 10. Transducer `default` beam parity: converted prediction-net (LSTM) +
#     joint weights, same encoder output -> reference default_beam_search
#     (beam_search_transducer.py:255-355) and the repo's fixed-pool
#     redesign return the same best hypothesis (bounds the documented
#     deviations: expansion cap, kept-pool top-K truncation).
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_transducer_default_beam_parity():
    from espnet2.asr.decoder.transducer_decoder import (
        TransducerDecoder as RefTDecoder,
    )
    from espnet2.asr.transducer.beam_search_transducer import (
        BeamSearchTransducer,
    )
    from espnet2.asr_transducer.joint_network import (
        JointNetwork as RefJoint,
    )
    from espnet_slurp_tpu.decode.transducer_beam import (DefaultBeamConfig,
                                                         default_beam_search)
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.models.transducer import (TransducerConfig,
                                                    TransducerModel)
    from espnet_slurp_tpu.ops.frontend import FrontendConfig

    v, d, t_enc = 10, 16, 9
    torch.manual_seed(SEED)
    ref_dec = RefTDecoder(vocab_size=v, rnn_type="lstm", num_layers=1,
                          hidden_size=d, dropout=0.0, dropout_embed=0.0)
    ref_joint = RefJoint(output_size=v, encoder_size=d, decoder_size=d,
                         joint_space_size=d)
    g = _rng()
    for p in list(ref_dec.parameters()) + list(ref_joint.parameters()):
        p.data.uniform_(-0.4, 0.4, generator=g)
    ref_dec.eval()
    ref_joint.eval()

    cfg = TransducerConfig(
        asr=ASRConfig(vocab_size=v, d_model=d, n_head=2, d_ff=32,
                      num_encoder_blocks=1, kernel_size=7, dropout_rate=0.0,
                      ctc_weight=0.0, flash_attention="off",
                      frontend=FrontendConfig(n_fft=128, hop_length=64,
                                              n_mels=16),
                      specaug=None),
        prediction="lstm", pred_layers=1, pred_dim=d, joint_dim=d)
    model = TransducerModel(cfg)
    rng = _np_rng()
    batch = {
        "speech": jnp.asarray(rng.standard_normal((1, 1600)),
                              jnp.float32) * 0.1,
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[1, 2, 3]], jnp.int32),
        "text_lengths": jnp.asarray([3]),
    }
    params = dict(model.init(jax.random.PRNGKey(0), **batch)["params"])
    params["prediction"] = ref_compat.transducer_prediction(ref_dec)
    params["joint"] = ref_compat.transducer_joint(ref_joint)

    # module-level guard: converted LSTM prediction net == reference
    seq = np.array([[0, 3, 1, 4, 2]], np.int64)
    with torch.no_grad():
        emb = ref_dec.embed(torch.from_numpy(seq))
        ref_g, _ = ref_dec.decoder[0](emb)
    mine_g = model.apply({"params": params}, jnp.asarray(seq),
                         method=lambda m, s: m.prediction(s))
    np.testing.assert_allclose(np.asarray(mine_g), ref_g.numpy(),
                               rtol=2e-4, atol=2e-4)

    hs = rng.standard_normal((1, t_enc, d)).astype(np.float32) * 1.5
    beam = 4
    ref_bs = BeamSearchTransducer(decoder=ref_dec, joint_network=ref_joint,
                                  beam_size=beam, search_type="default",
                                  score_norm=False, nbest=beam)
    with torch.no_grad():
        nbest = ref_bs(torch.from_numpy(hs[0]))
    want = [int(x) for x in nbest[0].yseq[1:]]  # strip leading blank

    tokens, lengths = default_beam_search(
        model, params, jnp.asarray(hs), jnp.asarray([t_enc]),
        DefaultBeamConfig(beam_size=beam, max_len=16, max_expansions=12))
    got = [int(x) for x in np.asarray(tokens[0])[: int(lengths[0])]]
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# 11. GCN tree encoder vs the reference forward_gcn
#     (espnet/nets/pytorch_backend/rnn/decoders.py:468-487)
# ---------------------------------------------------------------------------

def _random_tree(n_nodes, max_branch, rng):
    """Random rooted forest: returns (children_node [N, MB], n_children [N],
    adjacency rows in the reference's [self, children...] format)."""
    children = [[] for _ in range(n_nodes)]
    for child in range(1, n_nodes):
        parent = int(rng.integers(0, child))
        while len(children[parent]) >= max_branch:
            parent = int(rng.integers(0, child))
        children[parent].append(child)
    children_node = np.zeros((n_nodes, max_branch), np.int32)
    n_children = np.zeros((n_nodes,), np.int32)
    adjacency = []
    for i, kids in enumerate(children):
        n_children[i] = len(kids)
        children_node[i, : len(kids)] = kids
        adjacency.append([i] + kids)
    return children_node, n_children, adjacency


def test_gcn_tree_encoder_parity():
    from espnet.nets.pytorch_backend.rnn.decoders import Decoder
    from espnet_slurp_tpu.models.tcpgen import GCNTreeEncoder

    d, n_nodes, mb = 24, 17, 4
    rng = _np_rng()
    g = _rng()
    children_node, n_children, adjacency = _random_tree(n_nodes, mb, rng)
    feats = rng.standard_normal((n_nodes, d)).astype(np.float32)

    # forward_gcn only touches gcn_l1/gcn_l2/gcn_l3 and treetype: drive the
    # real unbound reference function with a stub carrying torch Linears.
    import types
    stub = types.SimpleNamespace(treetype="gcn2")
    stub.gcn_l1 = torch.nn.Linear(d, d)
    stub.gcn_l2 = torch.nn.Linear(d, d)
    for lin in (stub.gcn_l1, stub.gcn_l2):
        lin.weight.data.uniform_(-0.3, 0.3, generator=g)
        lin.bias.data.uniform_(-0.1, 0.1, generator=g)
    embeddings = [torch.from_numpy(feats[i : i + 1]) for i in range(n_nodes)]
    with torch.no_grad():
        ref_out = Decoder.forward_gcn(stub, None, embeddings, adjacency)

    params = {
        "gcn_l1": ref_compat.linear(stub.gcn_l1),
        "gcn_l2": ref_compat.linear(stub.gcn_l2),
    }
    enc = GCNTreeEncoder(d_model=d, num_layers=2)
    out = enc.apply({"params": params}, jnp.asarray(feats),
                    jnp.asarray(children_node), jnp.asarray(n_children))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# 12. GAT tree encoder vs the reference GAT network (IMP2, the layer type
#     decoders.py:549-556 actually drives with a dense adjacency matrix)
# ---------------------------------------------------------------------------

def test_gat_tree_encoder_parity():
    from espnet.nets.pytorch_backend.GAT import GAT, LayerType
    from espnet_slurp_tpu.models.tcpgen import GATTreeEncoder

    d, n_nodes, mb, nh = 16, 13, 3, 4
    rng = _np_rng()
    g = _rng()
    children_node, n_children, adjacency = _random_tree(n_nodes, mb, rng)
    feats = rng.standard_normal((n_nodes, d)).astype(np.float32)

    net = GAT(num_of_layers=2, num_heads_per_layer=[nh, 1],
              num_features_per_layer=[d, d, d], add_skip_connection=True,
              bias=True, dropout=0.0, layer_type=LayerType.IMP2)
    for p in net.parameters():
        if p.dim() >= 2:
            p.data.uniform_(-0.3, 0.3, generator=g)
        else:
            p.data.uniform_(-0.05, 0.05, generator=g)
    net.eval()
    adj = torch.zeros(n_nodes, n_nodes)
    for row in adjacency:
        for j in row:
            adj[row[0], j] = 1.0
    with torch.no_grad():
        ref_out, _ = net((torch.from_numpy(feats), adj))

    params = {}
    for li, layer in enumerate(net.gat_net):
        params[f"proj_l{li}"] = {
            "kernel": ref_compat.t2n(layer.linear_proj.weight).T}
        params[f"a_src_l{li}"] = ref_compat.t2n(
            layer.scoring_fn_source)[0]
        params[f"a_tgt_l{li}"] = ref_compat.t2n(
            layer.scoring_fn_target)[0]
        params[f"bias_l{li}"] = ref_compat.t2n(layer.bias)
        if li == 1:  # FIN(nh*d) != FOUT(d): the projected skip engages
            params[f"skip_l{li}"] = {
                "kernel": ref_compat.t2n(layer.skip_proj.weight).T}
    enc = GATTreeEncoder(d_model=d, num_layers=2, n_head=nh)
    out = enc.apply({"params": params}, jnp.asarray(feats),
                    jnp.asarray(children_node), jnp.asarray(n_children))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 13. SpecAug mask statistics vs the reference mask_along_axis draw law
#     (espnet2/layers/mask_along_axis.py:8-68)
# ---------------------------------------------------------------------------

def test_specaug_mask_statistics():
    from espnet2.layers.mask_along_axis import mask_along_axis
    from espnet_slurp_tpu.ops.specaug import _mask_along_axis

    b, t, f = 16, 120, 80
    w_range, num_mask = (0, 30), 2
    n_rounds = 60
    torch.manual_seed(SEED)

    ref_frac = []
    ones_t = torch.ones(b, t, f)
    lens_t = torch.full((b,), t, dtype=torch.long)
    for _ in range(n_rounds):
        masked, _ = mask_along_axis(ones_t.clone(), lens_t,
                                    mask_width_range=w_range, dim=1,
                                    num_mask=num_mask)
        ref_frac.append(1.0 - masked.mean().item())

    key = jax.random.key(SEED)
    mine_frac = []
    ones_j = jnp.ones((b, t, f))
    for i in range(n_rounds):
        sub = jax.random.fold_in(key, i)
        out = _mask_along_axis(sub, ones_j, t, w_range, num_mask, axis=1)
        mine_frac.append(1.0 - float(out.mean()))

    ref_mean, mine_mean = np.mean(ref_frac), np.mean(mine_frac)
    # Same draw law => same expected masked fraction. 60 rounds x 16 rows
    # gives a tight empirical mean; 3-sigma band ~ 0.008 at this scale.
    sigma = np.std(ref_frac) / np.sqrt(n_rounds)
    assert abs(ref_mean - mine_mean) < max(4 * sigma, 0.01), (
        ref_mean, mine_mean, sigma)


# ---------------------------------------------------------------------------
# 14. Conformer layer in TRAIN mode: BatchNorm batch statistics
#     (conformer/convolution.py nn.BatchNorm1d in .train())
# ---------------------------------------------------------------------------

def test_conformer_layer_train_batchnorm_parity():
    from espnet.nets.pytorch_backend.transformer.embedding import (
        RelPositionalEncoding,
    )
    from espnet_slurp_tpu.models.conformer import ConformerBlock
    from espnet_slurp_tpu.models.embedding import rel_positional_embedding
    from espnet_slurp_tpu.ops.masks import attention_bias, length_mask

    d, h, d_ff, kernel, b, t = 64, 4, 128, 15, 3, 19
    g = _rng()
    layer = _make_ref_conformer_layer(d, h, d_ff, kernel, g)
    layer.train()  # dropout_rate=0.0, so train-mode == batch-stat BatchNorm
    rng = _np_rng()
    x = rng.standard_normal((b, t, d)).astype(np.float32)
    lens = np.array([t] * b)

    pe = RelPositionalEncoding(d, dropout_rate=0.0)
    pe.eval()
    with torch.no_grad():
        _, pos_emb_t = pe(torch.from_numpy(x))
        mask_t = (torch.arange(t)[None, :]
                  < torch.from_numpy(lens)[:, None])[:, None, :]
        (ref_out, _), _ = layer((torch.from_numpy(x), pos_emb_t), mask_t)

    params, stats = ref_compat.conformer_encoder_layer(layer)
    block = ConformerBlock(d_model=d, n_head=h, d_ff=d_ff,
                           kernel_size=kernel, dropout_rate=0.0,
                           conv_norm="batch", conv_bn_train_stats=True)
    pos_emb = rel_positional_embedding(t, d)
    pad = length_mask(jnp.asarray(lens), t)
    bias = attention_bias(pad[:, None, None, :])
    out, _ = block.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(x), pos_emb, bias, pad,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=2e-4, atol=2e-4)
