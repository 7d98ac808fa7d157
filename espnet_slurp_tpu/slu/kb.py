"""Biasing-list (knowledge base) management: tries, walks, sampling.

Parity target: reference espnet/nets/pytorch_backend/KB_utils/KB.py:21-357
(KBmeeting/KBmeetingTrain: word lists -> subword-id lexical prefix trees,
random sampling with distractors, biasing-word dropout DBdrop) and
espnet/lm/lm_utils.py:274-293 (make_lexical_tree nested-dict trie).

TPU redesign (SURVEY.md §7 hard part c): the nested-Python-dict trie becomes
a FLAT padded tensor trie (children token/node tables with static max
branching), and the per-step dict walk becomes either a host-side
precomputed walk over teacher-forced tokens (training) or a batched
device-side gather (decoding). Node count / branching are padded to bucket
sizes so compiled shapes stay bounded.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

ROOT = 0


@dataclasses.dataclass
class FlatTrie:
    """Flattened lexical prefix tree.

    token[n]    : subword id on the edge INTO node n (root: 0).
    children_tok[n, k] / children_node[n, k]: padded child tables (pad: -1/0).
    n_children[n], word_end[n] (bool), n_nodes (true count; arrays padded).
    An extra DEAD node (index n_nodes-1... stored at `dead`) has no children.
    """
    token: np.ndarray
    children_tok: np.ndarray
    children_node: np.ndarray
    n_children: np.ndarray
    word_end: np.ndarray
    n_nodes: int
    dead: int

    @property
    def max_branch(self) -> int:
        return self.children_tok.shape[1]


def build_trie(word_pieces: Sequence[Sequence[int]],
               pad_nodes_multiple: int = 64,
               max_branch: Optional[int] = None) -> FlatTrie:
    """Build a flat trie from subword-id sequences (one per biasing word)."""
    children: List[Dict[int, int]] = [{}]  # node -> {tok: child}
    token: List[int] = [0]
    word_end: List[bool] = [False]
    for pieces in word_pieces:
        node = ROOT
        for p in pieces:
            p = int(p)
            nxt = children[node].get(p)
            if nxt is None:
                nxt = len(children)
                children[node][p] = nxt
                children.append({})
                token.append(p)
                word_end.append(False)
            node = nxt
        if node != ROOT:
            word_end[node] = True
    # dead node (no children) for out-of-tree states
    dead = len(children)
    children.append({})
    token.append(0)
    word_end.append(False)

    n = len(children)
    n_pad = ((n + pad_nodes_multiple - 1) // pad_nodes_multiple
             ) * pad_nodes_multiple
    mb = max((len(c) for c in children), default=1)
    if max_branch is not None:
        assert mb <= max_branch, f"branching {mb} > {max_branch}"
        mb = max_branch
    mb = max(mb, 1)
    ct = np.full((n_pad, mb), -1, np.int32)
    cn = np.full((n_pad, mb), 0, np.int32)
    nc = np.zeros((n_pad,), np.int32)
    for i, c in enumerate(children):
        for k, (t, ch) in enumerate(sorted(c.items())):
            ct[i, k] = t
            cn[i, k] = ch
        nc[i] = len(c)
    tok = np.zeros((n_pad,), np.int32)
    tok[:n] = token
    we = np.zeros((n_pad,), bool)
    we[:n] = word_end
    return FlatTrie(token=tok, children_tok=ct, children_node=cn,
                    n_children=nc, word_end=we, n_nodes=n, dead=dead)


def boundary_token_ids(token_list) -> Tuple[Set[int], bool]:
    """Word-boundary token ids + the marker convention.

    Returns (ids, prefix): suffix convention (reference fork: pieces END
    with '▁', decoders.py:259 endswith) when any token ends with the
    metaspace marker; otherwise prefix convention (HF-tokenizers Metaspace:
    word-INITIAL pieces START with '▁') — the walk semantics adapt via the
    ``prefix_boundary`` flag of walk_trie/trie_step.
    """
    suffix = {i for i, t in enumerate(token_list)
              if t.endswith("▁") or t == "<space>"}
    if suffix:
        return suffix, False
    prefix = {i for i, t in enumerate(token_list)
              if t.startswith("▁")}
    return prefix, True


def walk_trie(trie: FlatTrie, prev_tokens: np.ndarray,
              boundary_ids: Set[int], eos_id: int,
              prefix_boundary: bool = False
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Teacher-forced walk (training): prev_tokens [B, U] (token emitted at
    step i-1; step 0 gets sos/eos -> root). Returns (node [B, U],
    p_gen_mask [B, U]) — mask=1 where the pointer is disabled (out-of-tree).

    Suffix convention (prefix_boundary=False) implements
    get_lextree_step_embs semantics (decoders.py:286-320):
      - eos -> reset to root, ptr active
      - word-boundary token: descend if it continues the tree with children,
        else reset to root; ptr active
      - in-tree token -> descend; ptr active
      - out-of-tree token -> DEAD; ptr disabled

    Prefix convention (prefix_boundary=True; '▁'-INITIAL pieces start a
    word): a word-initial token restarts the walk from root THROUGH that
    token; any descend that lands on a childless node (word complete)
    resets to root so the pointer can immediately score the next word's
    first piece — the same one-step-early decision the reference's
    boundary case makes.
    """
    b, u = prev_tokens.shape
    node = np.zeros((b, u), np.int32)
    mask = np.zeros((b, u), np.int32)
    for i in range(b):
        cur = ROOT
        for j in range(u):
            y = int(prev_tokens[i, j])
            start = cur
            if prefix_boundary and y in boundary_ids:
                start = ROOT
            row = trie.children_tok[start, :trie.n_children[start]]
            hit = np.nonzero(row == y)[0]
            child = (int(trie.children_node[start, hit[0]])
                     if hit.size else None)
            if y == eos_id:
                cur, m = ROOT, 0
            elif prefix_boundary:
                if child is not None:
                    cur = child if trie.n_children[child] > 0 else ROOT
                    m = 0
                else:
                    cur, m = trie.dead, 1
            elif y in boundary_ids:
                if child is not None and trie.n_children[child] > 0:
                    cur, m = child, 0
                else:
                    cur, m = ROOT, 0
            elif child is not None:
                cur, m = child, 0
            else:
                cur, m = trie.dead, 1
            node[i, j] = cur
            mask[i, j] = m
    return node, mask


@dataclasses.dataclass
class BiasingBatch:
    """Per-batch biasing inputs fed to the TCPGen layer."""
    trie_token: np.ndarray       # [N]
    trie_children_tok: np.ndarray   # [N, MB]
    trie_children_node: np.ndarray  # [N, MB]
    trie_n_children: np.ndarray  # [N]
    node: np.ndarray             # [B, U] walk result (training only)
    p_gen_mask: np.ndarray       # [B, U]

    def as_dict(self) -> Dict[str, np.ndarray]:
        return dataclasses.asdict(self)


class BiasingListSampler:
    """Training-time biasing list construction (KBmeetingTrain analogue,
    KB.py:120-230): for each batch, take the rare words present in the
    references plus random distractors, with dropout (DBdrop)."""

    def __init__(self, full_list: Sequence[Sequence[int]],
                 n_distractors: int = 50, drop_prob: float = 0.0,
                 seed: int = 0):
        self.full_list = [tuple(int(p) for p in w) for w in full_list]
        self.index = {w: i for i, w in enumerate(self.full_list)}
        self.n_distractors = n_distractors
        self.drop_prob = drop_prob
        self.rng = np.random.RandomState(seed)

    def sample(self, reference_words: Sequence[Sequence[int]]
               ) -> List[Tuple[int, ...]]:
        present = []
        for w in reference_words:
            w = tuple(int(p) for p in w)
            if w in self.index:
                if self.drop_prob > 0 and self.rng.rand() < self.drop_prob:
                    continue  # DBdrop: sometimes omit true biasing words
                present.append(w)
        chosen = set(present)
        n_extra = min(self.n_distractors, len(self.full_list))
        for i in self.rng.permutation(len(self.full_list))[:n_extra]:
            chosen.add(self.full_list[i])
        return sorted(chosen)
