"""TCPGen: tree-constrained pointer generator over GNN-encoded prefix trees.

Parity target: reference espnet/nets/pytorch_backend/rnn/decoders.py —
get_meetingKB_emb_map (:215-228, scaled-dot attention over valid tree-node
embeddings + OOKB slot), get_lextree_step_embs (:286-354, constrained tree
walk), forward_gcn (:468-487, parent->child adjacency with self-loops,
symmetric-normalized, ReLU), calc_ptr_loss (:523-538, final distribution
p = ptr*p_gen + model*(1 - p_gen + p_gen*p_OOKB)).

TPU redesign: the trie is a flat tensor (slu/kb.py FlatTrie); all positions
of a teacher-forced batch are scored in ONE batched gather+einsum (the
reference loops per step in Python); the GCN is two gathers and a matmul per
layer; decode-time walk is a vectorized compare+select (`trie_step`).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GCNTreeEncoder(nn.Module):
    """GCN over the trie: h' = relu(D^-1/2 A D^-1/2 (h W)), A = self+children.

    Matches forward_gcn (decoders.py:468-487): adjacency rows are
    [self, children...], degree = 1 + n_children, 1-3 layers.
    """
    d_model: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node_feats, children_node, n_children):
        """node_feats [N, D]; children_node [N, MB]; n_children [N] -> [N, D]."""
        mb = children_node.shape[1]
        norm = jax.lax.rsqrt(1.0 + n_children.astype(jnp.float32))  # [N]
        kmask = (jnp.arange(mb)[None, :]
                 < n_children[:, None]).astype(jnp.float32)  # [N, MB]
        h = node_feats.astype(self.dtype)
        for i in range(self.num_layers):
            h1 = nn.Dense(self.d_model, dtype=self.dtype,
                          name=f"gcn_l{i+1}")(h)
            gn = h1 * norm[:, None].astype(h1.dtype)
            child = gn[children_node] * kmask[..., None].astype(gn.dtype)
            agg = (gn + child.sum(axis=1)) * norm[:, None].astype(gn.dtype)
            h = nn.relu(agg)
        return h


class GATTreeEncoder(nn.Module):
    """Graph attention over the trie — parity with the reference
    GAT.py:GATLayerImp2 as driven by decoders.py:549-556 (treetype
    'gat_<h>.._1': per-layer head counts, heads CONCATENATED + ELU on all
    but the last layer, last layer head-MEAN with no activation).

    Per layer, for aggregating node i over neighbors j ∈ {i} ∪ children(i)
    (the adjacency rows get_lextree_encs_gcn builds):
      e_ij = leakyrelu_0.2(a_source·Wh_i + a_target·Wh_j)  (GAT.py:390-401)
      alpha = softmax_j(e); out_i = Σ alpha_ij Wh_j
      skip: += h_i when FIN == FOUT(per-head) else += skip_proj(h_i)
      then concat-heads(+ELU) / mean-heads, + bias (GAT.py:145-173).
    Batched as fixed-slot gathers over [N, 1+MB] — no N×N score matrix,
    no edge lists.
    """
    d_model: int
    num_layers: int = 2
    n_head: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node_feats, children_node, n_children):
        mb = children_node.shape[1]
        n = node_feats.shape[0]
        h = node_feats.astype(self.dtype)
        f = self.d_model  # tree_hid: per-head width (= dunits in the ref)
        valid = jnp.arange(mb)[None, :] < n_children[:, None]  # [N, MB]
        nbr = jnp.concatenate(
            [jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0),
             children_node], axis=1)                  # [N, 1+MB]
        ok = jnp.concatenate([jnp.ones((n, 1), bool), valid], axis=1)
        for li in range(self.num_layers):
            last = li == self.num_layers - 1
            nh = 1 if last else self.n_head
            proj = nn.Dense(nh * f, use_bias=False, dtype=self.dtype,
                            name=f"proj_l{li}")(h).reshape(n, nh, f)
            # scoring_fn_source scores the AGGREGATING node (softmax row),
            # scoring_fn_target the neighbor (GAT.py:390-401 broadcast).
            a_src = self.param(f"a_src_l{li}", nn.initializers.normal(0.1),
                               (nh, f), self.dtype)
            a_tgt = self.param(f"a_tgt_l{li}", nn.initializers.normal(0.1),
                               (nh, f), self.dtype)
            s_self = jnp.sum(proj * a_src[None], -1)  # [N, NH]
            s_nbr = jnp.sum(proj * a_tgt[None], -1)   # [N, NH]
            e = nn.leaky_relu(s_self[:, None, :] + s_nbr[nbr], 0.2)
            e = jnp.where(ok[..., None], e, -1e9)
            alpha = jax.nn.softmax(e, axis=1)         # [N, 1+MB, NH]
            out = jnp.einsum("nkh,nkhf->nhf", alpha.astype(self.dtype),
                             proj[nbr])
            if h.shape[-1] == f:
                out = out + h[:, None, :]  # FIN == FOUT: raw skip
            else:
                out = out + nn.Dense(
                    nh * f, use_bias=False, dtype=self.dtype,
                    name=f"skip_l{li}")(h).reshape(n, nh, f)
            out = out.mean(axis=1) if last else out.reshape(n, nh * f)
            out = out + self.param(f"bias_l{li}", nn.initializers.zeros,
                                   (out.shape[-1],), self.dtype)
            h = out if last else nn.elu(out)
        return h


class SageTreeEncoder(nn.Module):
    """GraphSAGE max-pool over children (reference decoders.py:forward_sage):
    pooled_i = max_k relu(pool(h_child_k)) (zeros if leaf);
    h_i' = relu(merge([h_i; pooled_i]))."""
    d_model: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node_feats, children_node, n_children):
        mb = children_node.shape[1]
        h = node_feats.astype(self.dtype)
        valid = (jnp.arange(mb)[None, :]
                 < n_children[:, None])[..., None]    # [N, MB, 1]
        for li in range(self.num_layers):
            pooled = nn.relu(nn.Dense(self.d_model, dtype=self.dtype,
                                      name=f"sage_pool_{li+1}")(h))
            child = jnp.where(valid, pooled[children_node], -1e9)
            pooled = jnp.max(child, axis=1)
            pooled = jnp.where(n_children[:, None] > 0, pooled, 0.0)
            h = nn.relu(nn.Dense(self.d_model, dtype=self.dtype,
                                 name=f"sage_merge_{li+1}")(
                jnp.concatenate([h, pooled], axis=-1)))
        return h


class TreeLSTMEncoder(nn.Module):
    """Child-sum Tree-LSTM, bottom-up (reference forward_treelstm_cell,
    decoders.py:355-397): i/o/u gates from [Σ_k h_k; x_j], per-child forget
    gates from [h_k; x_j], c_j = i·u + Σ f_k·c_k, h_j = o·tanh(c_j).

    The recursive bottom-up traversal becomes ``n_iters`` synchronous
    message-passing sweeps over the flat trie — after depth(T) sweeps every
    node holds its exact recursive value (leaves stabilize on sweep 1, their
    parents on sweep 2, ...), with no data-dependent recursion.
    """
    d_model: int
    n_iters: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, node_feats, children_node, n_children):
        mb = children_node.shape[1]
        n = node_feats.shape[0]
        x = node_feats.astype(self.dtype)
        valid = (jnp.arange(mb)[None, :]
                 < n_children[:, None])[..., None]    # [N, MB, 1]
        iou = nn.Dense(3 * self.d_model, dtype=self.dtype, name="iou_gate")
        fgate = nn.Dense(self.d_model, dtype=self.dtype, name="forget_gate")
        h = jnp.zeros((n, self.d_model), self.dtype)
        c = jnp.zeros((n, self.d_model), self.dtype)
        for _ in range(self.n_iters):
            h_k = jnp.where(valid, h[children_node], 0.0)  # [N, MB, D]
            c_k = jnp.where(valid, c[children_node], 0.0)
            h_sum = jnp.sum(h_k, axis=1)
            g = iou(jnp.concatenate([h_sum, x], axis=-1))
            i_j, o_j, u_j = jnp.split(g, 3, axis=-1)
            i_j, o_j = nn.sigmoid(i_j), nn.sigmoid(o_j)
            u_j = nn.tanh(u_j)
            f_k = nn.sigmoid(fgate(jnp.concatenate(
                [h_k, jnp.broadcast_to(x[:, None], h_k.shape)], axis=-1)))
            c = i_j * u_j + jnp.sum(jnp.where(valid, f_k * c_k, 0.0), axis=1)
            h = o_j * nn.tanh(c)
        return h


TREE_ENCODERS = {"gcn": GCNTreeEncoder, "gat": GATTreeEncoder,
                 "sage": SageTreeEncoder, "treelstm": TreeLSTMEncoder}


class TCPGen(nn.Module):
    """Pointer network over current-node children + OOKB sink.

    __call__ is position-batched: queries [..., D] and node ids [...] of any
    leading shape (e.g. [B, U] for training, [N_hyps] for decoding).
    ``tree_encoder`` selects the GNN family over the trie (reference:
    GCN/GAT/GraphSAGE/TreeLSTM, decoders.py:355-571 + GAT.py).
    """
    d_model: int
    vocab_size: int
    gcn_layers: int = 2
    dropout_rate: float = 0.0
    tree_encoder: str = "gcn"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.qproj = nn.Dense(self.d_model, dtype=self.dtype, name="Qproj")
        self.kproj = nn.Dense(self.d_model, dtype=self.dtype, name="Kproj")
        self.gate = nn.Dense(1, dtype=self.dtype, name="pointer_gate")
        self.ookb = self.param("ooKBemb", nn.initializers.normal(0.02),
                               (1, self.d_model), self.dtype)
        enc_cls = TREE_ENCODERS[self.tree_encoder]
        if self.tree_encoder == "treelstm":
            self.gcn = enc_cls(self.d_model, dtype=self.dtype,
                               name="tree_encoder")
        else:
            self.gcn = enc_cls(self.d_model, self.gcn_layers,
                               dtype=self.dtype, name="tree_encoder")

    def encode_tree(self, token_embs, trie) -> jnp.ndarray:
        """Pre-encode all trie nodes once per batch.

        token_embs: [N, D] embedding of each node's incoming token (use the
        decoder embedding table, as the reference does — decoders.py:440).
        trie: dict with children_node [N, MB], n_children [N].
        """
        return self.gcn(token_embs, trie["trie_children_node"],
                        trie["trie_n_children"])

    def __call__(self, queries, node_ids, trie, tree_encs
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (ptr_dist [..., V+1] (last = OOKB), kb_emb [..., D])."""
        mb = trie["trie_children_tok"].shape[1]
        v = self.vocab_size
        ct = trie["trie_children_tok"][node_ids]      # [..., MB]
        cn = trie["trie_children_node"][node_ids]     # [..., MB]
        nc = trie["trie_n_children"][node_ids]        # [...]
        embs = tree_encs[cn]                          # [..., MB, D]
        keys = self.kproj(embs)                       # [..., MB, D]
        ookb_key = self.kproj(self.ookb)              # [1, D]
        q = self.qproj(queries)                       # [..., D]
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.d_model, jnp.float32))
        s_child = jnp.einsum("...kd,...d->...k", keys, q,
                             preferred_element_type=jnp.float32) * scale
        valid = jnp.arange(mb) < nc[..., None]
        s_child = jnp.where(valid, s_child, -1e9)
        s_ookb = jnp.einsum("d,...d->...", ookb_key[0], q,
                            preferred_element_type=jnp.float32)[..., None] \
            * scale
        scores = jnp.concatenate([s_child, s_ookb], axis=-1)  # [..., MB+1]
        w = jax.nn.softmax(scores, axis=-1)
        kb_emb = jnp.einsum("...k,...kd->...d", w[..., :mb].astype(self.dtype),
                            keys)
        # Scatter child weights into the vocab axis; invalid slots -> OOKB.
        tok_idx = jnp.where(valid, ct, v).astype(jnp.int32)   # [..., MB]
        flat_shape = (-1, mb)
        ti = tok_idx.reshape(flat_shape)
        wf = w[..., :mb].reshape(flat_shape)
        n = ti.shape[0]
        ptr = jnp.zeros((n, v + 1), jnp.float32)
        ptr = ptr.at[jnp.arange(n)[:, None], ti].add(wf)
        ptr = ptr.at[:, v].add(w[..., mb].reshape(-1))
        ptr = ptr.reshape(*tok_idx.shape[:-1], v + 1)
        return ptr, kb_emb

    def gen_prob(self, hidden, kb_emb, p_gen_mask, smoothprob: float = 1.0
                 ) -> jnp.ndarray:
        """p_gen = sigmoid(gate([hidden; kb_emb])) * smoothprob, zeroed where
        the walk left the tree (decoders.py:771-781)."""
        g = nn.sigmoid(self.gate(jnp.concatenate(
            [hidden, kb_emb], axis=-1)).astype(jnp.float32))[..., 0]
        return jnp.where(p_gen_mask > 0, 0.0, g * smoothprob)


def tcpgen_final_logprobs(logits, ptr_dist, p_gen) -> jnp.ndarray:
    """Mix model and pointer distributions (calc_ptr_loss, decoders.py:523-538):

      p = ptr[:, :V]*p_gen + softmax(logits)*(1 - p_gen + p_gen*ptr[:, V])

    Returns log p (the OOKB mass flows back through the model distribution).
    """
    v = logits.shape[-1]
    p_model = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    pg = p_gen[..., None]
    ookb = ptr_dist[..., v:v + 1]
    p = ptr_dist[..., :v] * pg + p_model * (1.0 - pg + pg * ookb)
    return jnp.log(p + 1e-9)


def trie_step(trie: Dict[str, jnp.ndarray], node, y, boundary_mask,
              eos_id: int, dead: int, root=0, prefix_boundary: bool = False):
    """Vectorized decode-time walk: (node [N], chosen token y [N]) -> new node.

    boundary_mask: [V+1]-shaped bool lookup of word-boundary tokens.
    Suffix convention (prefix_boundary=False; tokens ENDING in '▁' /
    <space>) mirrors get_lextree_step_embs_inference (decoders.py:251-285).
    Prefix convention (prefix_boundary=True; '▁'-INITIAL pieces — the HF
    Metaspace BPE this framework trains) restarts the walk from root
    THROUGH a word-initial token and resets to root whenever a descend
    completes a word (childless node) OR leaves the tree, keeping the
    pointer live for the next word's first piece (mask always 0 in this
    convention); must match walk_trie's training-time walk.
    root: reset target on eos / word boundary — the global trie root (0) for
    ASR biasing lists, or a per-hypothesis [N] array of slot-ontology roots
    for the KA2G forest (must match walk_forest's training-time reset,
    otherwise pointer state diverges between train and decode).
    Returns (new_node [N], p_gen_mask [N]).
    """
    is_eos = y == eos_id
    is_boundary = boundary_mask[y]
    root = jnp.broadcast_to(jnp.asarray(root, jnp.int32), y.shape)
    start = node
    if prefix_boundary:
        start = jnp.where(is_boundary, root, node)
    ct = trie["trie_children_tok"][start]   # [N, MB]
    cn = trie["trie_children_node"][start]
    nc = trie["trie_n_children"][start]
    mb = ct.shape[1]
    valid = jnp.arange(mb)[None, :] < nc[:, None]
    hit = (ct == y[:, None]) & valid       # [N, MB]
    found = jnp.any(hit, axis=1)
    child = jnp.sum(jnp.where(hit, cn, 0), axis=1)  # unique match or 0
    child_nc = trie["trie_n_children"][child]
    if prefix_boundary:
        # Out-of-tree resets to ROOT with the pointer LIVE (see walk_trie:
        # the next step may start a biased word, whose first piece is a
        # child of root; DEAD would blind the pointer exactly there).
        desc = jnp.where(child_nc > 0, child, root)
        new_node = jnp.where(is_eos, root, jnp.where(found, desc, root))
        p_gen_mask = jnp.zeros_like(new_node)
        return new_node.astype(jnp.int32), p_gen_mask.astype(jnp.int32)
    # boundary: descend if child exists and has children, else root
    boundary_node = jnp.where(found & (child_nc > 0), child, root)
    in_tree_node = jnp.where(found, child, dead)
    new_node = jnp.where(is_eos, root,
                         jnp.where(is_boundary, boundary_node, in_tree_node))
    p_gen_mask = jnp.where(is_eos | is_boundary, 0,
                           jnp.where(found, 0, 1))
    return new_node.astype(jnp.int32), p_gen_mask.astype(jnp.int32)
