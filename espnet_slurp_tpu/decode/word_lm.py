"""Word-level LM fusion for subword beam search: LookAhead / MultiLevel.

Parity target: reference espnet/lm/pytorch_backend/extlm.py
(LookAheadWordLM :118-210, MultiLevelLM :18-115) + the lexical tree with
per-node word-id ranges (espnet/lm/lm_utils.py:make_lexical_tree:274-293).

TPU redesign: the per-hypothesis python dict walk becomes a flat word trie
(padded child tables + per-node word id / [lo, hi) cumulative-range) and the
scorers become batched ``lm_step(y_prev [N], state) -> (logp [N, V], state)``
hooks that plug straight into decode/beam.py's shallow-fusion interface.
Every hypothesis advances in lockstep; the word LM is stepped every label
but its new state is SELECTED only for hypotheses at a word boundary
(lax-friendly: no data-dependent control flow).

Semantics per step (LookAheadWordLM.forward):
  * boundary token (space / word-piece ending in '▁'): feed the finished
    word (node wid, else <unk>) to the word LM; cumsum <- softmax; node <-
    root.
  * else intra-word: node <- child(node, token) or OPEN-VOCAB (dead) when
    no path.
  * output log-probs: children get (cumsum[hi]-cumsum[lo])/sum_prob,
    default = unk_prob * oov_penalty, boundary/eos slots get the word-end
    probability; open-vocab nodes emit zeros (transition prob 1).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOGZERO = -1e10
ZERO = 1e-10


@dataclasses.dataclass
class WordTrie:
    """Flat lexical tree over the WORD vocabulary.

    children_tok[n, k]: subword id of edge k from node n; children_node
    likewise; wid[n]: word id if node n ends a word else -1;
    lo[n], hi[n]: word-id range of the subtree (make_lexical_tree's
    ``(wid-1, wid)`` min/max convention — sum of subtree word probs is
    cumsum[hi] - cumsum[lo]). Node 0 = root, ``dead`` = open-vocab sink.
    """
    children_tok: np.ndarray
    children_node: np.ndarray
    n_children: np.ndarray
    wid: np.ndarray
    lo: np.ndarray
    hi: np.ndarray
    dead: int


def build_word_trie(word_subwords: Sequence[Sequence[int]],
                    word_ids: Optional[Sequence[int]] = None,
                    skip: Sequence[int] = ()) -> WordTrie:
    """word_subwords[i] = subword-id sequence of word with id word_ids[i]
    (default: i). Mirrors make_lexical_tree (lm_utils.py:274-293).

    Do NOT include the boundary token in the sequences — the boundary
    CLOSES a word (its probability comes from the word-end override), and
    an in-word boundary edge would be clobbered by that override. Also mark
    sos in ``boundary_mask`` when decoding so hypotheses start at the word
    root (the reference init treats start-of-sentence as <space>).
    """
    if word_ids is None:
        word_ids = list(range(len(word_subwords)))
    nodes = [{"succ": {}, "wid": -1, "lo": 10 ** 9, "hi": -1}]

    def new_node():
        nodes.append({"succ": {}, "wid": -1, "lo": 10 ** 9, "hi": -1})
        return len(nodes) - 1

    for seq, wid in zip(word_subwords, word_ids):
        if wid in skip:
            continue
        cur = 0
        for i, c in enumerate(seq):
            succ = nodes[cur]["succ"]
            if c not in succ:
                succ[c] = new_node()
            cur = succ[c]
            nodes[cur]["lo"] = min(nodes[cur]["lo"], wid - 1)
            nodes[cur]["hi"] = max(nodes[cur]["hi"], wid)
            if i == len(seq) - 1:
                nodes[cur]["wid"] = wid
    dead = new_node()
    n = len(nodes)
    mb = max(1, max(len(nd["succ"]) for nd in nodes))
    ct = np.full((n, mb), -1, np.int32)
    cn = np.zeros((n, mb), np.int32)
    nc = np.zeros((n,), np.int32)
    wid = np.full((n,), -1, np.int32)
    lo = np.zeros((n,), np.int32)
    hi = np.zeros((n,), np.int32)
    for i, nd in enumerate(nodes):
        for k, (c, child) in enumerate(sorted(nd["succ"].items())):
            ct[i, k] = c
            cn[i, k] = child
        nc[i] = len(nd["succ"])
        wid[i] = nd["wid"]
        lo[i] = 0 if nd["lo"] == 10 ** 9 else nd["lo"]
        hi[i] = max(nd["hi"], 0)
    return WordTrie(ct, cn, nc, wid, lo, hi, dead)


def _trie_as_jnp(t: WordTrie) -> Dict[str, jnp.ndarray]:
    return {"ct": jnp.asarray(t.children_tok),
            "cn": jnp.asarray(t.children_node),
            "nc": jnp.asarray(t.n_children),
            "wid": jnp.asarray(t.wid),
            "lo": jnp.asarray(t.lo), "hi": jnp.asarray(t.hi)}


def _walk(trie_j, node, y):
    """Batched intra-word walk: child(node, y) or dead. [N] -> [N]."""
    mb = trie_j["ct"].shape[1]
    ct = trie_j["ct"][node]
    cn = trie_j["cn"][node]
    nc = trie_j["nc"][node]
    valid = jnp.arange(mb)[None, :] < nc[:, None]
    hit = (ct == y[:, None]) & valid
    found = jnp.any(hit, axis=1)
    child = jnp.sum(jnp.where(hit, cn, 0), axis=1)
    return jnp.where(found, child, -1), found


def _child_vocab_scatter(trie_j, node, values, default, vocab_size):
    """Scatter per-child values [N, MB] into the subword vocab axis."""
    mb = trie_j["ct"].shape[1]
    ct = trie_j["ct"][node]
    nc = trie_j["nc"][node]
    valid = jnp.arange(mb)[None, :] < nc[:, None]
    tok = jnp.where(valid, ct, vocab_size).astype(jnp.int32)
    n = node.shape[0]
    y = jnp.full((n, vocab_size + 1), 0.0, jnp.float32) + default[:, None]
    y = y.at[jnp.arange(n)[:, None], tok].set(
        jnp.where(valid, values, 0.0))
    return y[:, :vocab_size]


def make_lookahead_fusion(
    wordlm_step: Callable, wordlm_init: Callable, *,
    trie: WordTrie, vocab_size: int, space_id: int, eos_id: int,
    boundary_mask: np.ndarray, word_eos: int, word_unk: int,
    oov_penalty: float = 1e-4,
) -> Tuple[Callable, Callable]:
    """(lm_step, lm_init) hooks implementing LookAheadWordLM.

    wordlm_step(w_prev [N], state) -> (logits [N, W], state) over the WORD
    vocabulary (e.g. tasks/lm.py make_lm_fusion internals); boundary_mask:
    [V] bool marking word-boundary subword tokens (incl. space).
    """
    trie_j = _trie_as_jnp(trie)
    bnd = jnp.asarray(boundary_mask)

    def lm_init(n):
        st, cum = _advance(wordlm_init(n), jnp.full((n,), word_eos,
                                                    jnp.int32))
        return {"wlm": st, "cum": cum,
                "node": jnp.zeros((n,), jnp.int32)}

    def _advance(wlm_state, w):
        logits, st = wordlm_step(w, wlm_state)
        cum = jnp.cumsum(jax.nn.softmax(logits.astype(jnp.float32), -1), -1)
        return st, cum

    def lm_step(y_prev, state):
        node, cum, wlm = state["node"], state["cum"], state["wlm"]
        n = y_prev.shape[0]
        is_b = bnd[y_prev]
        # finished word of boundary hyps (wid of the node REACHED by y_prev
        # if it's a trie edge... reference: boundary token itself closes the
        # word at the current node)
        wid_here = trie_j["wid"][node]
        w = jnp.where(wid_here >= 0, wid_here, word_unk)
        new_wlm, new_cum = _advance(wlm, w.astype(jnp.int32))
        wlm = jax.tree.map(lambda a, b: jnp.where(
            is_b.reshape((n,) + (1,) * (a.ndim - 1)), a, b), new_wlm, wlm)
        cum = jnp.where(is_b[:, None], new_cum, cum)
        child, found = _walk(trie_j, node, y_prev)
        node = jnp.where(is_b, 0,
                         jnp.where(found, child, trie.dead)).astype(jnp.int32)
        open_vocab = node == trie.dead

        # look-ahead distribution from the (possibly new) node
        sum_prob = jnp.where(
            node == 0, 1.0,
            jnp.take_along_axis(cum, trie_j["hi"][node, None], 1)[:, 0]
            - jnp.take_along_axis(cum, trie_j["lo"][node, None], 1)[:, 0])
        unk_prob = (jnp.take_along_axis(cum, jnp.full((n, 1), word_unk), 1)
                    - jnp.take_along_axis(
                        cum, jnp.full((n, 1), max(word_unk - 1, 0)), 1))[:, 0]
        child_nodes = trie_j["cn"][node]
        child_p = (jnp.take_along_axis(cum[:, None].repeat(
            child_nodes.shape[1], 1).reshape(n * child_nodes.shape[1], -1),
            trie_j["hi"][child_nodes].reshape(-1, 1), 1)
            - jnp.take_along_axis(cum[:, None].repeat(
                child_nodes.shape[1], 1).reshape(
                    n * child_nodes.shape[1], -1),
                trie_j["lo"][child_nodes].reshape(-1, 1), 1)).reshape(
                    n, -1) / jnp.maximum(sum_prob[:, None], ZERO)
        y = _child_vocab_scatter(trie_j, node, child_p,
                                 unk_prob * oov_penalty, vocab_size)
        # boundary/eos columns: word-end probability at this node
        wid_new = trie_j["wid"][node]
        # wid >= 0: word-end prob; at a fresh root (just after boundary):
        # ZERO; mid-word non-end: keep the unk default (extlm.py:198-205).
        w_end = jnp.where(
            wid_new >= 0,
            (jnp.take_along_axis(cum, jnp.maximum(wid_new, 0)[:, None], 1)
             - jnp.take_along_axis(
                 cum, jnp.maximum(wid_new - 1, 0)[:, None], 1))[:, 0]
            / jnp.maximum(sum_prob, ZERO),
            jnp.where(is_b, ZERO, unk_prob * oov_penalty))
        bcols = bnd[None, :] | (jnp.arange(vocab_size) == eos_id)[None, :]
        y = jnp.where(bcols, w_end[:, None], y)
        logp = jnp.log(jnp.maximum(y, ZERO))
        logp = jnp.where((sum_prob < ZERO)[:, None], LOGZERO, logp)
        logp = jnp.where(open_vocab[:, None], 0.0, logp)
        return logp, {"wlm": wlm, "cum": cum, "node": node}

    return lm_step, lm_init


def make_multilevel_fusion(
    wordlm_step: Callable, wordlm_init: Callable,
    subwordlm_step: Callable, subwordlm_init: Callable, *,
    trie: WordTrie, vocab_size: int, space_id: int, eos_id: int,
    boundary_mask: np.ndarray, word_eos: int, word_unk: int,
    subwordlm_weight: float = 0.8, oov_penalty: float = 1.0,
) -> Tuple[Callable, Callable]:
    """(lm_step, lm_init) hooks implementing MultiLevelLM: subword-LM scores
    within words, word-LM probability injected at word boundaries minus the
    accumulated subword log-prob of the word."""
    trie_j = _trie_as_jnp(trie)
    bnd = jnp.asarray(boundary_mask)
    log_oov = float(np.log(oov_penalty))

    def lm_init(n):
        wlm_logits, wlm = wordlm_step(
            jnp.full((n,), word_eos, jnp.int32), wordlm_init(n))
        return {"wlm": wlm,
                "wlp": jax.nn.log_softmax(wlm_logits.astype(jnp.float32), -1),
                "slm": subwordlm_init(n),
                "node": jnp.zeros((n,), jnp.int32),
                "acc": jnp.zeros((n,), jnp.float32),
                # previous step's (weighted) subword dist — the reference
                # accumulates clm_logprob from the dist that SCORED y_prev
                "prev_lp": jnp.zeros((n, vocab_size), jnp.float32)}

    def lm_step(y_prev, state):
        n = y_prev.shape[0]
        node, acc = state["node"], state["acc"]
        wlm, wlp = state["wlm"], state["wlp"]
        is_b = bnd[y_prev]
        wid_here = trie_j["wid"][node]
        w = jnp.where(wid_here >= 0, wid_here, word_unk)
        new_logits, new_wlm = wordlm_step(w.astype(jnp.int32), wlm)
        new_wlp = jax.nn.log_softmax(new_logits.astype(jnp.float32), -1)
        wlm = jax.tree.map(lambda a, b: jnp.where(
            is_b.reshape((n,) + (1,) * (a.ndim - 1)), a, b), new_wlm, wlm)
        wlp = jnp.where(is_b[:, None], new_wlp, wlp)

        s_logits, slm = subwordlm_step(y_prev, state["slm"])
        log_y = jax.nn.log_softmax(s_logits.astype(jnp.float32), -1) \
            * subwordlm_weight

        child, found = _walk(trie_j, node, y_prev)
        node = jnp.where(is_b, 0,
                         jnp.where(found, child, trie.dead)).astype(jnp.int32)
        # accumulate subword log-prob of the in-progress word, scored by the
        # PREVIOUS step's distribution (extlm.py:74,79 uses the stored log_y)
        tok_lp = jnp.take_along_axis(state["prev_lp"], y_prev[:, None],
                                     1)[:, 0]
        acc = jnp.where(is_b, 0.0, acc + tok_lp)

        wid_new = trie_j["wid"][node]
        w_lp = jnp.where(
            wid_new >= 0,
            jnp.take_along_axis(wlp, jnp.maximum(wid_new, 0)[:, None],
                                1)[:, 0] - acc,
            wlp[:, word_unk] + log_oov)
        bcols = bnd[None, :] | (jnp.arange(vocab_size) == eos_id)[None, :]
        out = jnp.where(bcols, jnp.where(is_b[:, None], LOGZERO,
                                         w_lp[:, None]), log_y)
        return out, {"wlm": wlm, "wlp": wlp, "slm": slm, "node": node,
                     "acc": acc, "prev_lp": log_y}

    return lm_step, lm_init


def select_class_roots(class_logits: jnp.ndarray,
                       class_roots: jnp.ndarray,
                       class_mask: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """Selection-LM KB choice (asr_recog.py --select --classlm, topk=1,
    decoders.py:1074-1097): per-hypothesis class posterior -> biasing-trie
    reset root. class_logits [N, C]; class_roots [C] -> roots [N].
    class_mask: True EXCLUDES a class from selection (already-used or
    disallowed KB classes)."""
    if class_mask is not None:
        class_logits = jnp.where(class_mask[None, :], -1e9, class_logits)
    return class_roots[jnp.argmax(class_logits, axis=-1)]
