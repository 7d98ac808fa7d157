"""Transducer (RNN-T) model family.

Parity targets: reference espnet2/asr_transducer/ (standalone task:
decoder/{rnn,stateless}_decoder.py, joint_network.py:1-65) and
espnet2/asr/transducer/beam_search_transducer.py:43-877. Encoder is shared
with the ASR stack (Conformer). Greedy decode is a lax.while_loop over
frames with label-emission inner steps capped per frame (time-synchronous,
matching the reference's greedy with symbols-per-frame bounding).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops import transducer as rnnt_ops
from ..ops.frontend import FrontendConfig
from ..ops.specaug import SpecAugConfig
from .asr_model import ASRConfig
from .conformer import ConformerEncoder


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    asr: ASRConfig = ASRConfig(ctc_weight=0.0)
    prediction: str = "lstm"       # lstm | stateless
    pred_layers: int = 1
    pred_dim: int = 256
    joint_dim: int = 256
    aux_ctc_weight: float = 0.0    # auxiliary CTC on encoder output
    use_tcpgen: bool = False       # KB-aware transducer (TCPGen in loss)
    tcpgen_gcn_layers: int = 2


class PredictionNetwork(nn.Module):
    """Label-history encoder (rnn_decoder.py / stateless_decoder.py)."""
    vocab_size: int
    pred_dim: int
    num_layers: int = 1
    kind: str = "lstm"
    dtype: Any = jnp.float32

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.pred_dim,
                              dtype=self.dtype)
        if self.kind == "lstm":
            self.rnns = [nn.RNN(nn.OptimizedLSTMCell(self.pred_dim,
                                                     dtype=self.dtype),
                                name=f"rnn_{i}")
                         for i in range(self.num_layers)]

    def __call__(self, labels_in):
        """[B, U+1] (blank-prefixed labels) -> [B, U+1, P]."""
        x = self.embed(labels_in)
        if self.kind == "lstm":
            for rnn in self.rnns:
                x = rnn(x)
        return x

    def init_carry(self, batch: int):
        z = lambda: jnp.zeros((batch, self.pred_dim), self.dtype)
        return [(z(), z()) for _ in range(self.num_layers)] \
            if self.kind == "lstm" else []

    def step(self, y_t, carry):
        """[B] -> ([B, P], carry) for decoding."""
        x = self.embed(y_t)
        if self.kind == "lstm":
            new = []
            for rnn, cr in zip(self.rnns, carry):
                cr, x = rnn.cell(cr, x)
                new.append(cr)
            return x, new
        return x, carry


class JointNetwork(nn.Module):
    """joint = W_out tanh(W_enc h + W_pred g) (joint_network.py:30-65)."""
    vocab_size: int
    joint_dim: int
    dtype: Any = jnp.float32

    def setup(self):
        self.lin_enc = nn.Dense(self.joint_dim, dtype=self.dtype)
        self.lin_pred = nn.Dense(self.joint_dim, dtype=self.dtype)
        self.lin_out = nn.Dense(self.vocab_size, dtype=self.dtype)

    def __call__(self, enc, pred):
        """enc [..., D], pred [..., P] broadcastable -> [..., V]."""
        return self.lin_out(nn.tanh(self.lin_enc(enc) + self.lin_pred(pred)))

    def full(self, enc, pred):
        """enc [B, T, D], pred [B, U+1, P] -> [B, T, U+1, V]."""
        h = self.lin_enc(enc)[:, :, None, :] + self.lin_pred(pred)[:, None]
        return self.lin_out(nn.tanh(h))


class TransducerModel(nn.Module):
    """Conformer encoder + prediction net + joint, RNN-T loss."""
    cfg: TransducerConfig

    def setup(self):
        c = self.cfg
        a = c.asr
        # chunk_size > 0 gives the streaming encoder (chunked attention +
        # causal convs) — the standalone transducer's chunk_forward
        # analogue (espnet2/asr_transducer/encoder/encoder.py:147).
        self.encoder = ConformerEncoder(
            a.d_model, a.n_head, a.d_ff, a.num_encoder_blocks, a.kernel_size,
            a.dropout_rate, chunk_size=a.chunk_size,
            left_chunks=a.left_chunks, dtype=a.jax_dtype, name="encoder")
        self.prediction = PredictionNetwork(
            a.vocab_size, c.pred_dim, c.pred_layers, c.prediction,
            dtype=a.jax_dtype, name="prediction")
        self.joint = JointNetwork(a.vocab_size, c.joint_dim,
                                  dtype=a.jax_dtype, name="joint")
        if c.aux_ctc_weight > 0:
            self.ctc_proj = nn.Dense(a.vocab_size, dtype=a.jax_dtype,
                                     name="ctc")
        if c.use_tcpgen:
            from .tcpgen import TCPGen
            self.tcpgen = TCPGen(c.pred_dim, a.vocab_size,
                                 c.tcpgen_gcn_layers, dtype=a.jax_dtype,
                                 name="tcpgen")

    def encode(self, speech, speech_lengths, *, train=False,
               specaug_rng=None, mvn_stats=None):
        from ..ops.frontend import default_frontend
        from ..ops.normalize import utterance_mvn, global_mvn
        from ..ops.specaug import specaug as specaug_fn
        a = self.cfg.asr
        feats, feat_lengths = default_frontend(speech, speech_lengths,
                                               a.frontend)
        if train and a.specaug is not None and specaug_rng is not None:
            feats = specaug_fn(specaug_rng, feats, feat_lengths, a.specaug)
        if a.use_mvn == "global" and mvn_stats is not None:
            feats = global_mvn(feats, feat_lengths, *mvn_stats)
        elif a.use_mvn == "utterance":
            feats = utterance_mvn(feats, feat_lengths)
        return self.encoder(feats.astype(a.jax_dtype), feat_lengths,
                            deterministic=not train)

    def __call__(self, speech, speech_lengths, text, text_lengths, *,
                 trie_token=None, trie_children_tok=None,
                 trie_children_node=None, trie_n_children=None, node=None,
                 p_gen_mask=None, train=False, specaug_rng=None,
                 mvn_stats=None):
        """Loss forward. Optional trie_*/node/p_gen_mask enable the KB-aware
        transducer: TCPGen pointer probs (queried from the prediction net per
        label position) are mixed INSIDE the RNN-T loss, preserving the blank
        mass — reference espnet/nets/pytorch_backend/transducer/loss.py:26-90
        p_final = [p_blank, ptr*p_gen*(1-p_blank) + model*(1-p_gen+p_gen*p_ookb)].
        """
        a = self.cfg.asr
        hs, h_lengths, _ = self.encode(
            speech, speech_lengths, train=train, specaug_rng=specaug_rng,
            mvn_stats=mvn_stats)
        labels = jnp.maximum(text, 0)
        # Prediction input: blank-prefixed labels [B, U+1].
        pred_in = jnp.pad(labels, ((0, 0), (1, 0)),
                          constant_values=a.blank_id)
        g = self.prediction(pred_in)  # [B, U+1, P]
        logits = self.joint.full(hs, g)  # [B, T, U+1, V]
        if self.cfg.use_tcpgen and trie_token is not None:
            trie = {"trie_token": trie_token,
                    "trie_children_tok": trie_children_tok,
                    "trie_children_node": trie_children_node,
                    "trie_n_children": trie_n_children}
            tree_encs = self.tcpgen.encode_tree(
                self.prediction.embed(trie_token), trie)
            ptr, kb = self.tcpgen(g, node, trie, tree_encs)  # [B,U+1,V+1]
            p_gen = self.tcpgen.gen_prob(g, kb, p_gen_mask)  # [B,U+1]
            v = a.vocab_size
            p_model = jax.nn.softmax(logits.astype(jnp.float32), -1)
            p_blank = p_model[..., a.blank_id:a.blank_id + 1]
            pg = p_gen[:, None, :, None]
            ookb = ptr[:, None, :, v:v + 1]
            p_final = ptr[:, None, :, :v] * pg * (1.0 - p_blank)                 + p_model * (1.0 - pg + pg * ookb)
            p_final = p_final.at[..., a.blank_id].set(p_model[..., a.blank_id])
            lp = jnp.log(p_final + 1e-9)
            loss = jnp.sum(rnnt_ops.rnnt_loss_from_logprobs(
                lp, labels, h_lengths, text_lengths, a.blank_id))                 / labels.shape[0]
        else:
            loss = rnnt_ops.rnnt_loss_mean(
                logits, labels, h_lengths, text_lengths, a.blank_id)
        stats: Dict[str, jnp.ndarray] = {"loss_transducer": loss}
        if self.cfg.aux_ctc_weight > 0:
            from ..ops import ctc as ctc_ops
            loss_ctc = ctc_ops.ctc_loss_mean_logits(
                self.ctc_proj(hs), h_lengths, labels, text_lengths,
                a.blank_id)
            stats["loss_ctc"] = loss_ctc
            loss = loss + self.cfg.aux_ctc_weight * loss_ctc
        stats["loss"] = loss
        return loss, stats


def transducer_greedy_decode(
    model: TransducerModel, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    max_symbols_per_frame: int = 4, max_len: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Time-synchronous greedy decode -> (tokens [B, max_len], lengths [B]).

    Per frame, emit up to max_symbols_per_frame non-blank labels then
    advance (matching the reference greedy search's symbol cap).
    """
    a = model.cfg.asr
    b, t_max, _ = hs.shape
    blank = a.blank_id

    def pred_step(mdl, y, carry):
        return mdl.prediction.step(y, carry)

    def joint_step(mdl, h_t, g):
        return mdl.joint(h_t, g)

    carry0 = model.apply({"params": params},
                         method=lambda m: m.prediction.init_carry(b))
    g0, carry0 = model.apply({"params": params},
                             jnp.full((b,), blank, jnp.int32), carry0,
                             method=pred_step)

    # state: (t, n_emitted[B], tokens[B, L], g[B, P], carry, sym_in_frame[B])
    state = (jnp.zeros((), jnp.int32),
             jnp.zeros((b,), jnp.int32),
             jnp.full((b, max_len), blank, jnp.int32),
             g0, carry0,
             jnp.zeros((b,), jnp.int32))

    def cond(st):
        t, *_ = st
        return t < t_max

    def body(st):
        t, n_emit, tokens, g, carry, sym = st
        h_t = lax.dynamic_slice_in_dim(hs, t, 1, axis=1)[:, 0]  # [B, D]
        logits = model.apply({"params": params}, h_t, g, method=joint_step)
        y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
        frame_valid = t < h_lengths
        emit = (y != blank) & frame_valid & (sym < max_symbols_per_frame) \
            & (n_emit < max_len)
        # Update prediction state only for emitting examples.
        g_new, carry_new = model.apply({"params": params},
                                       jnp.where(emit, y, blank), carry,
                                       method=pred_step)
        g = jnp.where(emit[:, None], g_new, g)
        carry = jax.tree.map(
            lambda new, old: jnp.where(
                emit.reshape((b,) + (1,) * (new.ndim - 1)), new, old),
            carry_new, carry)
        tokens = jax.vmap(
            lambda tk, idx, val, e: lax.cond(
                e, lambda: tk.at[idx].set(val), lambda: tk))(
                    tokens, jnp.minimum(n_emit, max_len - 1), y, emit)
        n_emit = n_emit + emit.astype(jnp.int32)
        sym = jnp.where(emit, sym + 1, sym)
        # Advance frame where nothing was emitted (blank or cap reached).
        advance = ~emit
        t = jnp.where(jnp.all(advance), t + 1, t)
        sym = jnp.where(jnp.all(advance), jnp.zeros_like(sym), sym)
        return (t, n_emit, tokens, g, carry, sym)

    _, n_emit, tokens, _, _, _ = lax.while_loop(cond, body, state)
    return tokens, n_emit
