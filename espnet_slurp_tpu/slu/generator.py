"""KA2G slot-value generator: slot classification + per-slot value generation
with TCPGen over ontology tries.

Parity target: reference espnet/nets/pytorch_backend/KB_utils/SLU.py
(SLUGenutils :382-657 slot dicts/ontology/copy labels; SLUGenNet :658-1346:
slot-value generator over GPT-2 hidden states, per-slot TCPGen over slot
ontology trees, classification+generation forward at :981, inference at
:318-381) and the GPT-2 bridge espnet/nets/pytorch_backend/modality/
roberta.py. The pretrained-LM joint representation is provided by any
in-framework text encoder over the fused SLU memory (a HF-weight import is
an orthogonal add-on); the KA2G mechanism itself — ontology-trie-constrained
pointer generation per slot — is implemented fully.

TPU design: slots are a STATIC axis — all slots of all batch elements are
classified and decoded in parallel ([B*n_slots] flattening), with per-slot
ontology tries merged into ONE forest trie whose roots are slot-indexed
(get_tree_from_classes analogue), so a single TCPGen instance serves every
slot via a per-slot root-node id.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.tcpgen import TCPGen, tcpgen_final_logprobs
from ..models.transformer import CachedAttention, FeedForward
from ..models.embedding import abs_positional_encoding
from ..ops.masks import attention_bias, causal_mask, length_mask
from .kb import FlatTrie, build_trie


@dataclasses.dataclass(frozen=True)
class SlotGenConfig:
    n_slots: int = 16
    value_vocab_size: int = 1000   # shares the SLU token vocab
    d_model: int = 256
    n_head: int = 4
    d_ff: int = 1024
    num_blocks: int = 2
    max_value_len: int = 16
    use_tcpgen: bool = True
    gcn_layers: int = 2
    tree_encoder: str = "gcn"  # gcn | gat | sage | treelstm
    # Oracle pointer/gate supervision on live walk steps. In slot-value
    # generation every training value IS in the ontology, so "point at
    # the target child and open the gate wherever the walk is live" is
    # the exact oracle — without it the gate has no gradient pressure to
    # open and the interpolated NLL alone lets it collapse (observed:
    # the KB arm decoded WORSE than no-KB; same failure mode as the ASR
    # TCPGen arm before its oracle-gate BCE, asr_model.py:597-614).
    ptr_loss_weight: float = 0.5
    gate_loss_weight: float = 0.2
    dtype: str = "float32"

    @property
    def jax_dtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]


def build_ontology_forest(
    slot_values: Sequence[Sequence[Sequence[int]]],
    pad_nodes_multiple: int = 64,
) -> Tuple[FlatTrie, np.ndarray]:
    """Per-slot ontology value lists -> one forest trie + per-slot roots.

    slot_values[s] = list of subword-id sequences for slot s's legal values
    (the ontology; KB_utils/SLU.py slot ontology trees). Returns the merged
    trie and roots[s] = node id acting as slot s's root.

    Implementation: prefix each value with a unique virtual token -s-1 so the
    forest shares one flat trie; roots[s] is the child reached by that token.
    """
    prefixed = []
    for s, values in enumerate(slot_values):
        for v in values:
            prefixed.append([-(s + 1)] + list(v))
    trie = build_trie(prefixed, pad_nodes_multiple)
    roots = np.zeros((len(slot_values),), np.int32)
    for s in range(len(slot_values)):
        row = trie.children_tok[0, :trie.n_children[0]]
        hit = np.nonzero(row == -(s + 1))[0]
        roots[s] = trie.children_node[0, hit[0]] if hit.size else trie.dead
    # Virtual tokens must never be valid candidates: remap them to token 0
    # is wrong (they live on root's edge only, and candidate scoring uses
    # children of non-root nodes); root is never queried, so it's safe.
    return trie, roots


class GPT2JointText(nn.Module):
    """GPT-2 hidden states over the (first-pass) transcript as the slot
    generator's joint text representation — the KA2G GPT-2 path
    (reference modality/roberta.py GPT2_encoder; SLUGenNet consumes its
    hidden states, KB_utils/SLU.py:981). With ``hf_dir`` set, pretrained
    weights import via models/hf_transformer.py:gpt2_params_from_torch
    (graft the returned subtree under params['gpt2'])."""
    vocab_size: int
    d_model: int
    hf_dir: Optional[str] = None
    n_layer: int = 2
    n_head: int = 4
    n_embd: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, lengths):
        from ..models.hf_transformer import GPT2Config, GPT2Model
        from ..ops.masks import length_mask
        if self.hf_dir:
            import json
            from pathlib import Path as _P
            hf = json.loads((_P(self.hf_dir) / "config.json").read_text())
            gcfg = GPT2Config(
                vocab_size=hf["vocab_size"], n_embd=hf["n_embd"],
                n_layer=hf["n_layer"], n_head=hf["n_head"],
                n_positions=hf["n_positions"],
                layer_norm_epsilon=hf.get("layer_norm_epsilon", 1e-5))
        else:
            gcfg = GPT2Config(vocab_size=self.vocab_size,
                              n_embd=self.n_embd, n_layer=self.n_layer,
                              n_head=self.n_head, n_positions=512)
        mask = length_mask(lengths, tokens.shape[1])
        hs = GPT2Model(gcfg, dtype=self.dtype, name="gpt2")(
            tokens, mask.astype(jnp.int32))
        hs = nn.Dense(self.d_model, dtype=self.dtype, name="proj")(hs)
        return jnp.where(mask[..., None], hs, 0.0), mask


class SlotValueDecoder(nn.Module):
    """Tiny transformer decoder over the fused memory, batched per slot."""
    cfg: SlotGenConfig

    def setup(self):
        c = self.cfg
        d = c.d_model
        self.embed = nn.Embed(c.value_vocab_size, d, dtype=c.jax_dtype)
        self.slot_embed = nn.Embed(c.n_slots, d, dtype=c.jax_dtype)
        self.norm1 = [nn.LayerNorm(dtype=c.jax_dtype, name=f"n1_{i}")
                      for i in range(c.num_blocks)]
        self.self_attn = [CachedAttention(c.n_head, d, 0.0, c.jax_dtype,
                                          name=f"sa_{i}")
                          for i in range(c.num_blocks)]
        self.norm2 = [nn.LayerNorm(dtype=c.jax_dtype, name=f"n2_{i}")
                      for i in range(c.num_blocks)]
        self.src_attn = [CachedAttention(c.n_head, d, 0.0, c.jax_dtype,
                                         name=f"xa_{i}")
                         for i in range(c.num_blocks)]
        self.norm3 = [nn.LayerNorm(dtype=c.jax_dtype, name=f"n3_{i}")
                      for i in range(c.num_blocks)]
        self.ff = [FeedForward(d, c.d_ff, 0.0, c.jax_dtype, name=f"ff_{i}")
                   for i in range(c.num_blocks)]
        self.after_norm = nn.LayerNorm(dtype=c.jax_dtype)
        self.output = nn.Dense(c.value_vocab_size, dtype=c.jax_dtype)

    def __call__(self, ys_in, slot_ids, memory, memory_mask):
        """ys_in: [N, L] (N = B*n_slots); slot_ids: [N]; memory [N, T, D]."""
        n, l = ys_in.shape
        x = self.embed(ys_in) + self.slot_embed(slot_ids)[:, None, :]
        x = abs_positional_encoding(x, scale=True)
        self_bias = attention_bias(causal_mask(l)[None, None])
        mem_bias = attention_bias(memory_mask[:, None, None, :])
        for i in range(self.cfg.num_blocks):
            h = self.norm1[i](x)
            x = x + self.self_attn[i](h, h, self_bias)
            x = x + self.src_attn[i](self.norm2[i](x), memory, mem_bias)
            x = x + self.ff[i](self.norm3[i](x))
        hidden = self.after_norm(x)
        return self.output(hidden), hidden


class SlotGenerator(nn.Module):
    """Slot presence classification + value generation (+ ontology TCPGen)."""
    cfg: SlotGenConfig

    def setup(self):
        c = self.cfg
        self.slot_query = nn.Embed(c.n_slots, c.d_model, dtype=c.jax_dtype)
        self.slot_attn = CachedAttention(c.n_head, c.d_model, 0.0,
                                         c.jax_dtype, name="slot_attn")
        self.classifier = nn.Dense(1, dtype=c.jax_dtype, name="classifier")
        self.value_decoder = SlotValueDecoder(c, name="value_decoder")
        if c.use_tcpgen:
            self.tcpgen = TCPGen(c.d_model, c.value_vocab_size,
                                 c.gcn_layers, 0.0,
                                 tree_encoder=c.tree_encoder,
                                 dtype=c.jax_dtype, name="tcpgen")

    def classify(self, memory, memory_mask):
        """[B, T, D] -> slot presence logits [B, n_slots]."""
        b = memory.shape[0]
        q = self.slot_query(jnp.arange(self.cfg.n_slots))[None]
        q = jnp.broadcast_to(q, (b, self.cfg.n_slots, self.cfg.d_model))
        bias = attention_bias(memory_mask[:, None, None, :])
        ctx = self.slot_attn(q, memory, bias)  # [B, n_slots, D]
        return self.classifier(ctx)[..., 0], ctx

    def __call__(self, memory, memory_mask, slot_present, values,
                 value_lengths, *, trie=None, node=None, p_gen_mask=None):
        """Training forward.

        slot_present: [B, n_slots] 0/1 targets.
        values: [B, n_slots, L] teacher-forced value token ids (pad -1);
        value_lengths: [B, n_slots].
        trie/node/p_gen_mask: ontology forest + per-position walk (the walk
        starts at the slot's root — slu/kb.py walk from roots[s]).
        Returns (loss, stats).
        """
        c = self.cfg
        b, n_slots, l = values.shape
        logits_cls, _ = self.classify(memory, memory_mask)
        cls_tgt = slot_present.astype(jnp.float32)
        bce = jnp.maximum(logits_cls, 0) - logits_cls * cls_tgt + \
            jnp.log1p(jnp.exp(-jnp.abs(logits_cls)))
        loss_cls = jnp.mean(bce)

        n = b * n_slots
        vals = jnp.maximum(values, 0).reshape(n, l)
        slot_ids = jnp.tile(jnp.arange(n_slots), (b,))
        mem_rep = jnp.repeat(memory, n_slots, axis=0)
        mask_rep = jnp.repeat(memory_mask, n_slots, axis=0)
        # shift right for teacher forcing: input = [0, v0..v_{L-2}]
        ys_in = jnp.pad(vals, ((0, 0), (1, 0)))[:, :l]
        logits, hidden = self.value_decoder(ys_in, slot_ids, mem_rep,
                                            mask_rep)
        if c.use_tcpgen and trie is not None:
            tree_encs = self.tcpgen.encode_tree(
                self.value_decoder.embed(jnp.maximum(
                    trie["trie_token"], 0)), trie)
            ptr, kb = self.tcpgen(hidden, node.reshape(n, l), trie,
                                  tree_encs)
            p_gen = self.tcpgen.gen_prob(hidden, kb,
                                         p_gen_mask.reshape(n, l))
            logp = tcpgen_final_logprobs(logits, ptr, p_gen)
        else:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = values.reshape(n, l)
        valid = (tgt >= 0) & \
            (jnp.arange(l)[None, :] < value_lengths.reshape(n)[:, None]) & \
            jnp.repeat(slot_present.reshape(n), 1)[:, None].astype(bool)
        nll = -jnp.take_along_axis(logp, jnp.maximum(tgt, 0)[..., None],
                                   axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(valid), 1)
        loss_gen = jnp.sum(jnp.where(valid, nll, 0.0)) / denom
        loss = loss_cls + loss_gen
        acc = jnp.sum((jnp.argmax(logp, -1) == tgt) & valid) / denom
        stats = {"loss_slot_cls": loss_cls, "loss_slot_gen": loss_gen,
                 "slot_acc": acc}
        if c.use_tcpgen and trie is not None:
            # oracle pointer CE + open-gate BCE on live walk steps (every
            # training value is in-ontology, so live steps ARE oracle
            # pointer steps — see SlotGenConfig.ptr_loss_weight).
            live = ((p_gen_mask.reshape(n, l) > 0) & valid).astype(
                jnp.float32)
            nlive = jnp.maximum(live.sum(), 1.0)
            p_child = jnp.take_along_axis(
                ptr[..., :c.value_vocab_size],
                jnp.maximum(tgt, 0)[..., None], axis=-1)[..., 0]
            loss_ptr = (-jnp.log(p_child + 1e-9) * live).sum() / nlive
            loss_gate = (-jnp.log(p_gen + 1e-6) * live).sum() / nlive
            loss = loss + c.ptr_loss_weight * loss_ptr \
                + c.gate_loss_weight * loss_gate
            stats["loss_ptr"] = loss_ptr
            stats["loss_gate"] = loss_gate
            stats["p_gen_live"] = (p_gen * live).sum() / nlive
        stats["loss"] = loss
        return loss, stats

    def generate(self, memory, memory_mask, *, trie=None, roots=None,
                 boundary_mask=None, dead=None, threshold: float = 0.0):
        """Greedy per-slot value generation.

        Returns (slot_logits [B, n_slots], values [B, n_slots, max_len]).
        Slots with logit <= threshold should be ignored by the caller.
        """
        from jax import lax
        from ..models.tcpgen import trie_step
        c = self.cfg
        b = memory.shape[0]
        n = b * c.n_slots
        l = c.max_value_len
        slot_logits, _ = self.classify(memory, memory_mask)
        slot_ids = jnp.tile(jnp.arange(c.n_slots), (b,))
        mem_rep = jnp.repeat(memory, c.n_slots, axis=0)
        mask_rep = jnp.repeat(memory_mask, c.n_slots, axis=0)
        use_ptr = c.use_tcpgen and trie is not None
        if use_ptr:
            tree_encs = self.tcpgen.encode_tree(
                self.value_decoder.embed(jnp.maximum(trie["trie_token"], 0)),
                trie)
            node = jnp.tile(jnp.asarray(roots), (b,))
            pmask = jnp.zeros((n,), jnp.int32)

        ys = jnp.zeros((n, l + 1), jnp.int32)
        for t in range(l):  # static unroll: max_value_len is small
            logits, hidden = self.value_decoder(ys[:, :l], slot_ids,
                                                mem_rep, mask_rep)
            step_logits = logits[:, t]
            if use_ptr:
                ptr, kb = self.tcpgen(hidden[:, t], node, trie, tree_encs)
                p_gen = self.tcpgen.gen_prob(hidden[:, t], kb, pmask)
                logp = tcpgen_final_logprobs(step_logits, ptr, p_gen)
            else:
                logp = jax.nn.log_softmax(step_logits.astype(jnp.float32),
                                          -1)
            y = jnp.argmax(logp, -1).astype(jnp.int32)
            ys = ys.at[:, t + 1].set(y)
            if use_ptr:
                # Reset target is each hypothesis's SLOT root (not the global
                # forest root, whose only children are virtual slot tokens) —
                # matching walk_forest's training-time pointer state.
                node, pmask = trie_step(trie, node, y, boundary_mask, -1,
                                        dead,
                                        root=jnp.tile(jnp.asarray(roots),
                                                      (b,)))
        return slot_logits, ys[:, 1:].reshape(b, c.n_slots, l)


def walk_forest(trie: FlatTrie, roots: np.ndarray, prev_tokens: np.ndarray,
                slot_index: np.ndarray, eos_id: int = -1
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Teacher-forced walk starting from each slot's ontology root.

    prev_tokens: [N, L]; slot_index: [N]. Like kb.walk_trie but reset target
    is the slot root, not the global root.
    """
    n, l = prev_tokens.shape
    node = np.zeros((n, l), np.int32)
    mask = np.zeros((n, l), np.int32)
    for i in range(n):
        root = int(roots[slot_index[i]])
        cur = root
        for j in range(l):
            y = int(prev_tokens[i, j])
            row = trie.children_tok[cur, :trie.n_children[cur]]
            hit = np.nonzero(row == y)[0]
            child = (int(trie.children_node[cur, hit[0]])
                     if hit.size else None)
            if j == 0 or y == eos_id:
                cur, m = root, 0
            elif child is not None:
                cur, m = child, 0
            else:
                cur, m = trie.dead, 1
            node[i, j] = cur
            mask[i, j] = m
    return node, mask
