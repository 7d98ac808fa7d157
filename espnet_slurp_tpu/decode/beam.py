"""Batched label-synchronous joint CTC/attention beam search.

Parity target: reference espnet/nets/beam_search.py:36-512 +
batch_beam_search.py:31-348 (joint scoring: decoder full scores, CTC prefix
partial scores on pre-beam candidates, length bonus, optional LM) — redesigned
the TPU way (SURVEY.md §7): the whole search is ONE lax.while_loop over
fixed-shape [B, K] hypothesis state; hypotheses never leave the device, ended
hypotheses freeze in place proposing only eos at zero delta. Pre-beam keeps
the CTC lattice work at [B*K, P] instead of [B*K, V]
(beam_search.py:303-309 pre-beam semantics, with eos always forced into the
candidate set so ending is always reachable).

Optional TCPGen biasing (`biasing` arg): per-hypothesis trie-node state is
carried in the beam state, the pointer distribution is mixed into the
decoder scores each step, and the node advances via the vectorized
trie_step — the reference's per-hypothesis dict walk
(decoders.py:recognize_beam:864-1442) collapses into batched gathers.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.asr_model import ASRModel
from . import ctc_prefix
from .greedy import init_decoder_cache


@dataclasses.dataclass(frozen=True)
class BeamSearchConfig:
    beam_size: int = 10
    pre_beam_size: int = 30          # P (includes the forced eos slot)
    max_len: int = 128
    ctc_weight: float = 0.3
    lm_weight: float = 0.0
    length_bonus: float = 0.0
    # Internal-LM subtraction for density-ratio fusion (HAT/ILME-style):
    # score = log p_att - ilm_weight * log p_ilm + lm_weight * log p_ext,
    # where p_ilm is the decoder run against a ZEROED encoder memory.
    # Plain shallow fusion double-counts the grammar the decoder already
    # internalized; subtracting the internal LM makes room for the
    # external one. Ignored in the TCPGen-biasing branch.
    ilm_weight: float = 0.0


class _BeamState(NamedTuple):
    i: jnp.ndarray
    tokens: jnp.ndarray      # [B, K, L]
    total: jnp.ndarray       # [B, K] combined score
    att: jnp.ndarray         # [B, K] cumulative decoder log-prob
    ended: jnp.ndarray       # [B, K]
    y_prev: jnp.ndarray      # [B, K]
    cache: dict              # decoder KV cache, leaves [B*K, L, H, Dh]
    ctc: Optional[ctc_prefix.CTCPrefixState]
    lm_state: Optional[dict]
    node: Optional[jnp.ndarray]       # [B, K] TCPGen trie node
    pmask: Optional[jnp.ndarray]      # [B, K] TCPGen p_gen disable mask
    # selection-LM KB choice (biasing['selection']): per-hyp class root +
    # word-trie node + selection LM state
    bias_root: Optional[jnp.ndarray]  # [B, K]
    word_node: Optional[jnp.ndarray]  # [B, K]
    sel_state: Optional[dict]


def _gather_beam(x, parent):
    """x: [B, K, ...]; parent: [B, K] -> gathered along K."""
    idx = parent.reshape(*parent.shape,
                         *([1] * (x.ndim - 2)))
    return jnp.take_along_axis(x, idx, axis=1)


def batch_beam_search(
    model: ASRModel, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    cfg: BeamSearchConfig,
    lm_step=None, lm_init=None, lm_weight: Optional[float] = None,
    biasing: Optional[dict] = None,
    return_nbest: bool = False,
    ilm_weight=None,
) -> Tuple[jnp.ndarray, ...]:
    """Returns (tokens [B, max_len] eos-padded, lengths [B]) of best hyps.

    With return_nbest=True, additionally returns the ranked beam
    (nb_tokens [B, K, L], nb_lengths [B, K], nb_scores [B, K]).

    lm_step(y_prev [N], state) -> (logp [N, V], state) enables shallow fusion.
    biasing: {'trie': {trie_* arrays}, 'boundary_mask': [V+1] bool,
    'dead': int, 'smoothprob': float} enables TCPGen contextual biasing.
    An optional biasing['selection'] enables automatic KB-class choice
    (asr_recog.py --select --classlm topk=1, decoders.py:1074-1097): a
    selection LM with a class head runs at each word boundary on the word
    id from a word-trie walk, and the hypothesis's TCPGen reset root
    switches to the chosen class's subtree root:
      {'word_trie': decode/word_lm.py WordTrie, 'word_unk': int,
       'sel_step': (word_ids [N], state) -> (class_logits [N, C], state),
       'sel_init': n -> state, 'class_roots': [C] int}
    """
    mcfg = model.cfg
    b, t_enc, _ = hs.shape
    k, p, l = cfg.beam_size, cfg.pre_beam_size, cfg.max_len
    sos, eos = mcfg.sos_id, mcfg.eos_id
    v = mcfg.vocab_size
    p = min(p, v)
    w_ctc = cfg.ctc_weight
    w_att = 1.0 - w_ctc
    w_lm = cfg.lm_weight if lm_weight is None else lm_weight
    n = b * k

    # Encoder-derived tensors, expanded to the beam ([B*K, ...]).
    mem_kv = model.apply({"params": params}, hs,
                         method=lambda m, x: m.decoder.precompute_memory(x))
    mem_kv = jax.tree.map(
        lambda x: jnp.repeat(x, k, axis=0), mem_kv)
    h_lengths_beam = jnp.repeat(h_lengths, k, axis=0)
    # ilm_weight may be a traced scalar (fusion-weight sweeps reuse ONE
    # compiled program; a Python-float weight would be baked into the HLO
    # and recompile every sweep point over the remote-TPU transport).
    use_ilm = biasing is None and (
        ilm_weight is not None or cfg.ilm_weight > 0.0)
    w_ilm = cfg.ilm_weight if ilm_weight is None else ilm_weight
    if use_ilm:
        # Internal-LM pass: the same decoder against zeroed encoder states
        # (cross-attention sees only the memory projections' biases).
        mem_kv_zero = model.apply(
            {"params": params}, jnp.zeros_like(hs),
            method=lambda m, x: m.decoder.precompute_memory(x))
        mem_kv_zero = jax.tree.map(
            lambda x: jnp.repeat(x, k, axis=0), mem_kv_zero)

    use_ctc = w_ctc > 0.0
    if use_ctc:
        ctc_lp = model.apply({"params": params}, hs,
                             method=lambda m, x: m.ctc_logprobs(x))
        ctc_lp_beam = jnp.repeat(ctc_lp, k, axis=0)  # [N, T, V]
        ctc0 = ctc_prefix.init_state(ctc_lp_beam, h_lengths_beam)
    else:
        ctc0 = None

    cache0 = init_decoder_cache(mcfg, n, l, t_enc=t_enc,
                                memory_lengths=h_lengths_beam)
    if use_ilm:
        # the ILM pass keeps its own self-attn cache (its layer inputs
        # diverge from the main pass after the first cross-attention)
        cache0 = {"main": cache0,
                  "ilm": init_decoder_cache(mcfg, n, l, t_enc=t_enc,
                                            memory_lengths=h_lengths_beam)}
    lm_state0 = lm_init(n) if lm_init is not None else None

    use_bias = biasing is not None
    use_sel = use_bias and biasing.get("selection") is not None
    if use_bias:
        from ..models.tcpgen import tcpgen_final_logprobs, trie_step
        trie = biasing["trie"]
        tree_encs = model.apply({"params": params}, trie,
                                method=lambda m, t: m.tcpgen_tree_encs(t))
        node0 = jnp.zeros((b, k), jnp.int32)
        pmask0 = jnp.zeros((b, k), jnp.int32)
    else:
        node0 = None
        pmask0 = None
    if use_sel:
        from .word_lm import _trie_as_jnp, _walk
        sel = biasing["selection"]
        wtrie_j = _trie_as_jnp(sel["word_trie"])
        class_roots = jnp.asarray(sel["class_roots"])
        root0 = jnp.zeros((b, k), jnp.int32)
        wnode0 = jnp.zeros((b, k), jnp.int32)
        sel_state0 = sel["sel_init"](n)
        node0 = jnp.broadcast_to(root0, (b, k))
    else:
        root0 = None
        wnode0 = None
        sel_state0 = None

    neg = jnp.float32(-1e30)
    total0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((k - 1,), neg)])[None], (b, 1))
    state0 = _BeamState(
        i=jnp.zeros((), jnp.int32),
        tokens=jnp.full((b, k, l), eos, jnp.int32),
        total=total0.astype(jnp.float32),
        att=jnp.zeros((b, k), jnp.float32),
        ended=jnp.zeros((b, k), bool),
        y_prev=jnp.full((b, k), sos, jnp.int32),
        cache=cache0, ctc=ctc0, lm_state=lm_state0, node=node0,
        pmask=pmask0, bias_root=root0, word_node=wnode0,
        sel_state=sel_state0)

    def dec_step(mdl, y_t, idx, cache):
        return mdl.decoder.step(y_t, idx, cache, mem_kv, h_lengths_beam, l,
                                return_hidden=use_bias)

    def cond(st: _BeamState):
        return (st.i < l) & ~jnp.all(st.ended)

    def body(st: _BeamState):
        if use_bias:
            logits, cache, hidden = model.apply(
                {"params": params}, st.y_prev.reshape(n), st.i, st.cache,
                method=dec_step)
            ptr_dist, kb_emb = model.apply(
                {"params": params}, hidden, st.node.reshape(n), trie,
                tree_encs,
                method=lambda m, h, nd, t, e: m.tcpgen(h, nd, t, e))
            p_gen = model.apply(
                {"params": params}, hidden, kb_emb, st.pmask.reshape(n),
                biasing.get("smoothprob", 1.0),
                method=lambda m, h, kb, pm, sp: m.tcpgen.gen_prob(
                    h, kb, pm, sp))
            force = biasing.get("force_p_gen")
            if force is not None:
                # Diagnostic override (VERDICT r4): pin p_gen where the walk
                # is live to separate gate-collapse failures from trie-walk
                # misalignment at decode time.
                p_gen = jnp.where(st.pmask.reshape(n) > 0, 0.0,
                                  jnp.float32(force))
            att_lp = tcpgen_final_logprobs(logits, ptr_dist, p_gen)
        elif use_ilm:
            logits, mcache = model.apply(
                {"params": params}, st.y_prev.reshape(n), st.i,
                st.cache["main"], method=dec_step)
            ilm_logits, icache = model.apply(
                {"params": params}, st.y_prev.reshape(n), st.i,
                st.cache["ilm"],
                method=lambda mdl, y_t, idx, c: mdl.decoder.step(
                    y_t, idx, c, mem_kv_zero, h_lengths_beam, l))
            cache = {"main": mcache, "ilm": icache}
            att_lp = (jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                      - w_ilm * jax.nn.log_softmax(
                          ilm_logits.astype(jnp.float32), -1))
        else:
            logits, cache = model.apply(
                {"params": params}, st.y_prev.reshape(n), st.i, st.cache,
                method=dec_step)
            att_lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

        if lm_step is not None and w_lm > 0.0:
            lm_lp, lm_state = lm_step(st.y_prev.reshape(n), st.lm_state)
            fused = att_lp * w_att + w_lm * lm_lp
        else:
            lm_state = st.lm_state
            fused = att_lp * w_att

        # Pre-beam: top-(P-1) by fused score + forced eos slot. eos is
        # masked out of the top-k so the forced slot P-1 is the ONLY eos
        # candidate — otherwise a top-ranked eos would occupy two candidate
        # slots with identical totals and duplicate a beam entry.
        _, cand = lax.top_k(fused.at[:, eos].set(neg), p - 1)  # [N, P-1]
        cand = jnp.concatenate(
            [cand, jnp.full((n, 1), eos, cand.dtype)], axis=1)  # [N, P]
        delta = jnp.take_along_axis(fused, cand, axis=1)  # [N, P]

        if use_ctc:
            psi_new, r_new = ctc_prefix.score_candidates(
                st.ctc, ctc_lp_beam, h_lengths_beam, cand, st.i,
                mcfg.blank_id)
            fin = ctc_prefix.final_score(st.ctc, h_lengths_beam)  # [N]
            is_eos = cand == eos
            ctc_cand = jnp.where(is_eos, fin[:, None], psi_new)
            # blank is not a valid prefix extension: the reference zeroes
            # it out of the candidate scores (ctc_prefix_score.py:185-186,
            # 352-353 log_psi[:, blank] = logzero)
            ctc_cand = jnp.where(cand == mcfg.blank_id, neg, ctc_cand)
            delta = delta + w_ctc * (ctc_cand - st.ctc.psi[:, None])
        delta = delta + cfg.length_bonus

        # Ended hypotheses: freeze (only eos at delta 0 — slot P-1).
        ended_n = st.ended.reshape(n)
        frozen = jnp.full((n, p), neg).at[:, p - 1].set(0.0)
        delta = jnp.where(ended_n[:, None], frozen, delta)
        # Last step: force eos (slot P-1) so every hyp terminates.
        last_step = st.i == (l - 1)
        forced = jnp.where(jnp.arange(p)[None, :] == p - 1, delta, neg)
        delta = jnp.where(last_step, forced, delta)

        totals = st.total.reshape(n)[:, None] + delta  # [N, P]
        flat = totals.reshape(b, k * p)
        new_total, idx = lax.top_k(flat, k)  # [B, K]
        parent = idx // p
        choice = idx % p  # index into P axis

        cand_bk = cand.reshape(b, k, p)
        tok = jnp.take_along_axis(
            _gather_beam(cand_bk, parent), choice[..., None], axis=2)[..., 0]

        tokens = _gather_beam(st.tokens, parent)
        tokens = lax.dynamic_update_slice_in_dim(
            tokens, tok[..., None], st.i, axis=2)
        att_g = _gather_beam(
            st.att.reshape(b, k, 1)
            + jnp.take_along_axis(att_lp, cand, axis=1).reshape(b, k, p),
            parent)
        att_new = jnp.take_along_axis(att_g, choice[..., None],
                                      axis=2)[..., 0]
        ended_parent = _gather_beam(st.ended[..., None], parent)[..., 0]
        # Frozen hyps accumulate nothing.
        att_new = jnp.where(ended_parent,
                            _gather_beam(st.att[..., None], parent)[..., 0],
                            att_new)
        ended = ended_parent | (tok == eos)

        # Gather caches along the beam axis.
        parent_n = (parent + jnp.arange(b)[:, None] * k).reshape(n)

        def gather_n(x):
            return x[parent_n]

        cache = jax.tree.map(gather_n, cache)
        if use_ctc:
            psi_g = gather_n(psi_new)         # [N, P] -> parent-gathered
            r_g = gather_n(r_new)
            cand_g = gather_n(cand)
            new_ctc = ctc_prefix.select(
                r_g, psi_g, cand_g, choice.reshape(n), st.ctc)
            # Ended hyps: keep psi frozen at parent's value (unused anyway).
            old_r = jax.tree.map(gather_n, st.ctc.r)
            old_psi = gather_n(st.ctc.psi)
            old_last = gather_n(st.ctc.last)
            e = ended.reshape(n)
            new_ctc = ctc_prefix.CTCPrefixState(
                r=jnp.where(e[:, None, None], old_r, new_ctc.r),
                psi=jnp.where(e, old_psi, new_ctc.psi),
                last=jnp.where(e, old_last, new_ctc.last))
        else:
            new_ctc = None
        if lm_state is not None:
            lm_state = jax.tree.map(gather_n, lm_state)
        new_root, new_wnode, sel_state = st.bias_root, st.word_node, \
            st.sel_state
        if use_sel:
            # word-trie walk + per-boundary selection-LM class choice
            tok_n = tok.reshape(n)
            wnode_g = gather_n(st.word_node.reshape(n))
            is_b = biasing["boundary_mask"][tok_n]
            wid_here = wtrie_j["wid"][wnode_g]
            w = jnp.where(wid_here >= 0, wid_here,
                          sel["word_unk"]).astype(jnp.int32)
            sel_state_g = jax.tree.map(gather_n, st.sel_state)
            cls_logits, sel_new = sel["sel_step"](w, sel_state_g)
            sel_state = jax.tree.map(
                lambda a, o: jnp.where(
                    is_b.reshape((n,) + (1,) * (a.ndim - 1)), a, o),
                sel_new, sel_state_g)
            from .word_lm import select_class_roots
            root_g = gather_n(st.bias_root.reshape(n))
            new_root = jnp.where(
                is_b, select_class_roots(cls_logits, class_roots),
                root_g).astype(jnp.int32)
            child, found = _walk(wtrie_j, wnode_g, tok_n)
            new_wnode = jnp.where(
                is_b, 0, jnp.where(found, child,
                                   sel["word_trie"].dead)).astype(jnp.int32)
            new_root = new_root.reshape(b, k)
            new_wnode = new_wnode.reshape(b, k)
        if use_bias:
            root_arg = new_root.reshape(n) if use_sel else 0
            new_node, new_pmask = trie_step(
                trie, gather_n(st.node.reshape(n)), tok.reshape(n),
                biasing["boundary_mask"], eos, biasing["dead"],
                root=root_arg,
                prefix_boundary=biasing.get("prefix_boundary", False))
            new_node = new_node.reshape(b, k)
            new_pmask = new_pmask.reshape(b, k)
        else:
            new_node, new_pmask = st.node, st.pmask

        return _BeamState(
            i=st.i + 1, tokens=tokens, total=new_total,
            att=att_new, ended=ended, y_prev=tok, cache=cache,
            ctc=new_ctc, lm_state=lm_state, node=new_node, pmask=new_pmask,
            bias_root=new_root, word_node=new_wnode, sel_state=sel_state)

    final = lax.while_loop(cond, body, state0)
    best = jnp.argmax(final.total, axis=1)  # [B]
    tokens = jnp.take_along_axis(
        final.tokens, best[:, None, None], axis=1)[:, 0]  # [B, L]
    lengths = jnp.sum(
        jnp.cumprod((tokens != eos).astype(jnp.int32), axis=1), axis=1)
    if return_nbest:
        # Ranked n-best (beam_search.py:336-458 returns List[Hypothesis];
        # here: fixed-shape [B, K, L] + per-hyp scores). top_k keeps rows
        # sorted each step but argsort anyway for a hard guarantee.
        order = jnp.argsort(-final.total, axis=1)  # [B, K]
        nb_tokens = jnp.take_along_axis(final.tokens, order[..., None],
                                        axis=1)  # [B, K, L]
        nb_scores = jnp.take_along_axis(final.total, order, axis=1)
        nb_lengths = jnp.sum(jnp.cumprod(
            (nb_tokens != eos).astype(jnp.int32), axis=2), axis=2)
        return tokens, lengths, nb_tokens, nb_lengths, nb_scores
    return tokens, lengths
