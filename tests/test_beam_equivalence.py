"""Batched beam search vs a slow python reference beam.

Mirrors the reference's test_batch_beam_search.py strategy (batch beam must
equal serial beam). The python reference implements plain attention-only
label-synchronous beam search with per-hypothesis decoder calls.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.decode.beam import BeamSearchConfig, batch_beam_search
from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig

CFG = ASRConfig(
    vocab_size=12, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
    num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
    ctc_weight=0.0,
    frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
    specaug=None)


def python_beam_search(model, params, hs, h_lengths, beam, max_len):
    """Slow reference: expand all V tokens per hyp via full-prefix decoder
    forward, keep top-K; ended hyps freeze."""
    sos, eos = model.cfg.sos_id, model.cfg.eos_id
    hyps = [([sos], 0.0, False)]
    for step in range(max_len):
        if all(h[2] for h in hyps):
            break
        cand = []
        for toks, score, ended in hyps:
            if ended:
                cand.append((toks, score, True))
                continue
            ys = jnp.asarray([toks])
            logits = model.apply(
                {"params": params}, ys, jnp.asarray([len(toks)]), hs,
                h_lengths,
                method=lambda m, y, yl, mem, ml: m.decoder(y, yl, mem, ml))
            logp = np.asarray(jax.nn.log_softmax(
                logits[0, len(toks) - 1].astype(jnp.float32)))
            # force eos at the final step (batched search semantics)
            if step == max_len - 1:
                ids = [eos]
            else:
                ids = range(model.cfg.vocab_size)
            for v in ids:
                cand.append((toks + [v], score + logp[v], v == eos))
        cand.sort(key=lambda x: -x[1])
        hyps = cand[:beam]
    best = max(hyps, key=lambda x: x[1])
    return best[0][1:], best[1]  # strip sos


@pytest.mark.parametrize("beam", [2, 4])
def test_batched_beam_matches_python(beam):
    model = ASRModel(CFG)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32) * 0.3),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[1, 2, 3]]), "text_lengths": jnp.asarray([3]),
    }
    params = model.init(jax.random.PRNGKey(3), **batch)["params"]
    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))

    max_len = 5
    ref_toks, ref_score = python_beam_search(model, params, hs, h_lengths,
                                             beam, max_len)
    tokens, lengths = batch_beam_search(
        model, params, hs, h_lengths,
        BeamSearchConfig(beam_size=beam, pre_beam_size=CFG.vocab_size,
                         max_len=max_len, ctc_weight=0.0))
    got = list(np.asarray(tokens)[0][: int(lengths[0])])
    ref_no_eos = [t for t in ref_toks if t != CFG.eos_id]
    assert got == ref_no_eos, (got, ref_toks, ref_score)


# ---------------------------------------------------------------------------
# Hardened equivalence: joint CTC+attention, LM fusion, TCPGen biasing
# (round-1 weak #5: the easy attention-only slice was the only coverage).
# The python reference implements espnet's non-batched semantics
# (beam_search.py + ctc_prefix_score.py:CTCPrefixScore + decoders.py biasing)
# independently of the lax.while_loop implementation.
# ---------------------------------------------------------------------------

def _py_ctc_init(lp):
    """lp: [T, V] log-probs. Initial (r_nb, r_b) for the empty prefix."""
    t = lp.shape[0]
    r_b = np.cumsum(lp[:, 0])
    r_nb = np.full((t,), -np.inf)
    return r_nb, r_b


def _py_ctc_extend(lp, r_nb_prev, r_b_prev, last, v):
    """espnet CTCPrefixScore.__call__ for one candidate token v.

    Returns (r_nb, r_b, psi) where psi = prefix score of the extended hyp.
    """
    t = lp.shape[0]
    r_sum = np.logaddexp(r_nb_prev, r_b_prev)
    phi = np.where(v == last, r_b_prev, r_sum)
    r_nb = np.full((t,), -np.inf)
    r_b = np.full((t,), -np.inf)
    r_nb[0] = lp[0, v] if last is None else -np.inf
    r_b[0] = -np.inf
    psi = r_nb[0]
    for i in range(1, t):
        r_nb[i] = np.logaddexp(r_nb[i - 1], phi[i - 1]) + lp[i, v]
        r_b[i] = np.logaddexp(r_nb[i - 1], r_b[i - 1]) + lp[i, 0]
        psi = np.logaddexp(psi, phi[i - 1] + lp[i, v])
    return r_nb, r_b, psi


def _py_trie_step(trie, node, v, boundary, dead, root=0):
    """decoders.py:get_lextree_step_embs_inference walk semantics."""
    ct = np.asarray(trie.children_tok)
    cn = np.asarray(trie.children_node)
    nc = np.asarray(trie.n_children)
    row = ct[node, : nc[node]]
    hit = np.nonzero(row == v)[0]
    child = int(cn[node, hit[0]]) if hit.size else None
    if boundary[v]:
        if child is not None and nc[child] > 0:
            return child, 0
        return root, 0
    if child is not None:
        return child, 0
    return dead, 1


def python_joint_beam(model, params, hs, h_lengths, beam, max_len, *,
                      ctc_weight=0.0, ctc_lp=None, lm=None, lm_params=None,
                      lm_weight=0.0, biasing_py=None):
    """Serial reference beam with joint CTC prefix scores, LM fusion, and
    TCPGen biasing; mirrors batched semantics (all tokens as candidates)."""
    from espnet_slurp_tpu.models.tcpgen import tcpgen_final_logprobs
    sos, eos = model.cfg.sos_id, model.cfg.eos_id
    v_size = model.cfg.vocab_size
    w_att = 1.0 - ctc_weight
    t_enc = int(h_lengths[0])
    if ctc_lp is not None:
        lp = np.asarray(ctc_lp[0])[:t_enc]
        r_nb0, r_b0 = _py_ctc_init(lp)
        psi0 = 0.0
    # hyp: (tokens, total, ended, ctc_state(r_nb, r_b, psi), node, pmask)
    init_ctc = (r_nb0, r_b0, psi0) if ctc_lp is not None else None
    node0 = biasing_py["trie"].dead * 0 if biasing_py else None
    hyps = [([sos], 0.0, False, init_ctc, 0, 0)]
    for step in range(max_len):
        if all(h[2] for h in hyps):
            break
        cand = []
        for toks, total, ended, ctc_st, node, pmask in hyps:
            if ended:
                cand.append((toks, total, True, ctc_st, node, pmask))
                continue
            ys = jnp.asarray([toks])
            if biasing_py is not None:
                logits, hidden = model.apply(
                    {"params": params}, ys, jnp.asarray([len(toks)]), hs,
                    h_lengths,
                    method=lambda m, y, yl, mem, ml: m.decoder(
                        y, yl, mem, ml, return_hidden=True))
                h_last = hidden[0, len(toks) - 1]
                trie_d = biasing_py["trie_jnp"]
                encs = biasing_py["tree_encs"]
                ptr, kb = model.apply(
                    {"params": params}, h_last[None], jnp.asarray([node]),
                    trie_d, encs,
                    method=lambda m, h, nd, t, e: m.tcpgen(h, nd, t, e))
                p_gen = model.apply(
                    {"params": params}, h_last[None], kb,
                    jnp.asarray([pmask]), biasing_py["smoothprob"],
                    method=lambda m, h, k2, pm, sp: m.tcpgen.gen_prob(
                        h, k2, pm, sp))
                att_lp = np.asarray(tcpgen_final_logprobs(
                    logits[0, len(toks) - 1], ptr[0], p_gen[0]))
            else:
                logits = model.apply(
                    {"params": params}, ys, jnp.asarray([len(toks)]), hs,
                    h_lengths,
                    method=lambda m, y, yl, mem, ml: m.decoder(y, yl, mem,
                                                               ml))
                att_lp = np.asarray(jax.nn.log_softmax(
                    logits[0, len(toks) - 1].astype(jnp.float32)))
            if lm is not None:
                lm_logits = lm.apply({"params": lm_params}, ys,
                                     jnp.asarray([len(toks)]))
                lm_lp = np.asarray(jax.nn.log_softmax(
                    lm_logits[0, len(toks) - 1].astype(jnp.float32)))
            else:
                lm_lp = np.zeros((v_size,))
            ids = [eos] if step == max_len - 1 else range(v_size)
            for v in ids:
                delta = w_att * att_lp[v] + lm_weight * lm_lp[v]
                new_ctc = ctc_st
                if ctc_lp is not None:
                    r_nb, r_b, psi_prev = ctc_st
                    if v == 0:  # blank is not a valid prefix extension
                        delta += ctc_weight * -1e30  # (ctc_prefix_score.py
                        # :185-186 log_psi[:, blank] = logzero)
                    elif v == eos:
                        fin = np.logaddexp(r_nb[-1], r_b[-1])
                        delta += ctc_weight * (fin - psi_prev)
                    else:
                        last = toks[-1] if len(toks) > 1 else None
                        nr_nb, nr_b, psi = _py_ctc_extend(lp, r_nb, r_b,
                                                          last, v)
                        delta += ctc_weight * (psi - psi_prev)
                        new_ctc = (nr_nb, nr_b, psi)
                nnode, npmask = node, pmask
                if biasing_py is not None and v != eos:
                    nnode, npmask = _py_trie_step(
                        biasing_py["trie"], node, v,
                        biasing_py["boundary"], biasing_py["trie"].dead)
                cand.append((toks + [v], total + delta, v == eos, new_ctc,
                             nnode, npmask))
        cand.sort(key=lambda x: -x[1])
        hyps = cand[:beam]
    best = max(hyps, key=lambda x: x[1])
    return [t for t in best[0][1:] if t != eos], best[1]


@pytest.mark.parametrize("beam", [2, 3])
def test_joint_ctc_attention_equivalence(beam):
    cfg = ASRConfig(
        vocab_size=16, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(7)
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32) * 0.3),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[1, 2, 3]]), "text_lengths": jnp.asarray([3]),
    }
    params = model.init(jax.random.PRNGKey(5), **batch)["params"]
    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    ctc_lp = model.apply({"params": params}, hs,
                         method=lambda m, x: m.ctc_logprobs(x))

    max_len = 6
    ref_toks, ref_score = python_joint_beam(
        model, params, hs, h_lengths, beam, max_len, ctc_weight=0.3,
        ctc_lp=ctc_lp)
    tokens, lengths, nbt, nbl, nbs = batch_beam_search(
        model, params, hs, h_lengths,
        BeamSearchConfig(beam_size=beam, pre_beam_size=cfg.vocab_size,
                         max_len=max_len, ctc_weight=0.3),
        return_nbest=True)
    got = list(np.asarray(tokens)[0][: int(lengths[0])])
    assert got == ref_toks, (got, ref_toks)
    assert abs(float(nbs[0, 0]) - ref_score) < 1e-3


def test_lm_fusion_equivalence():
    from espnet_slurp_tpu.models.lm import LMConfig, TransformerLM
    from espnet_slurp_tpu.tasks.lm import make_lm_fusion
    cfg = ASRConfig(
        vocab_size=16, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(11)
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32) * 0.3),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[1, 2, 3]]), "text_lengths": jnp.asarray([3]),
    }
    params = model.init(jax.random.PRNGKey(2), **batch)["params"]
    lm_cfg = LMConfig(vocab_size=16, d_model=32, n_head=2, d_ff=64,
                      num_blocks=1, dropout_rate=0.0)
    lm = TransformerLM(lm_cfg)
    lm_params = lm.init(jax.random.PRNGKey(9), jnp.asarray([[1, 2]]),
                        jnp.asarray([2]))["params"]
    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    ctc_lp = model.apply({"params": params}, hs,
                         method=lambda m, x: m.ctc_logprobs(x))

    max_len = 6
    beam = 3
    ref_toks, ref_score = python_joint_beam(
        model, params, hs, h_lengths, beam, max_len, ctc_weight=0.3,
        ctc_lp=ctc_lp, lm=lm, lm_params=lm_params, lm_weight=0.4)
    lm_step, lm_init = make_lm_fusion(lm, lm_params, beam, max_len)
    tokens, lengths = batch_beam_search(
        model, params, hs, h_lengths,
        BeamSearchConfig(beam_size=beam, pre_beam_size=cfg.vocab_size,
                         max_len=max_len, ctc_weight=0.3, lm_weight=0.4),
        lm_step=lm_step, lm_init=lm_init)
    got = list(np.asarray(tokens)[0][: int(lengths[0])])
    assert got == ref_toks, (got, ref_toks)


def test_tcpgen_biased_equivalence():
    from espnet_slurp_tpu.slu.kb import build_trie
    cfg = ASRConfig(
        vocab_size=16, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.0, use_tcpgen=True,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(3)
    trie = build_trie([[3, 4], [3, 5, 6], [7, 8]])
    trie_jnp = {"trie_token": jnp.asarray(trie.token),
                "trie_children_tok": jnp.asarray(trie.children_tok),
                "trie_children_node": jnp.asarray(trie.children_node),
                "trie_n_children": jnp.asarray(trie.n_children)}
    boundary = np.zeros((17,), bool)
    boundary[4] = boundary[6] = boundary[8] = True
    nodes = np.zeros((1, 4), np.int32)
    pgm = np.zeros((1, 4), np.int32)
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32) * 0.3),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[3, 4, 7]]), "text_lengths": jnp.asarray([3]),
        "trie_token": trie_jnp["trie_token"],
        "trie_children_tok": trie_jnp["trie_children_tok"],
        "trie_children_node": trie_jnp["trie_children_node"],
        "trie_n_children": trie_jnp["trie_n_children"],
        "node": jnp.asarray(nodes), "p_gen_mask": jnp.asarray(pgm),
    }
    params = model.init(jax.random.PRNGKey(8), **batch)["params"]
    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    tree_encs = model.apply({"params": params}, trie_jnp,
                            method=lambda m, t: m.tcpgen_tree_encs(t))

    biasing_py = {"trie": trie, "trie_jnp": trie_jnp, "tree_encs": tree_encs,
                  "boundary": boundary, "smoothprob": 1.0}
    max_len = 6
    beam = 3
    ref_toks, _ = python_joint_beam(model, params, hs, h_lengths, beam,
                                    max_len, biasing_py=biasing_py)
    biasing = {"trie": trie_jnp,
               "boundary_mask": jnp.asarray(boundary),
               "dead": trie.dead, "smoothprob": 1.0}
    tokens, lengths = batch_beam_search(
        model, params, hs, h_lengths,
        BeamSearchConfig(beam_size=beam, pre_beam_size=cfg.vocab_size,
                         max_len=max_len, ctc_weight=0.0),
        biasing=biasing)
    got = list(np.asarray(tokens)[0][: int(lengths[0])])
    assert got == ref_toks, (got, ref_toks)
