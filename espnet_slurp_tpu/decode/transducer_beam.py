"""Batched transducer beam search (alignment-length synchronous).

Parity target: reference espnet2/asr/transducer/beam_search_transducer.py
:43-877 (greedy/default/ALSA/TSD/NSC/mAES). This implements the
ALSA-family search the TPU way: ONE lax.while_loop where at every iteration
every hypothesis either consumes a frame (blank) or emits a label (top-P
candidates), so all hypotheses stay in lockstep in *alignment length* while
carrying their own frame pointer — fixed [B, K] state, no Python hyp lists.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.transducer import TransducerModel


@dataclasses.dataclass(frozen=True)
class TransducerBeamConfig:
    beam_size: int = 5
    pre_beam_size: int = 5    # non-blank expansions considered per hyp
    max_len: int = 128


class _State(NamedTuple):
    it: jnp.ndarray        # iteration counter
    tokens: jnp.ndarray    # [B, K, L]
    n_emit: jnp.ndarray    # [B, K]
    t: jnp.ndarray         # [B, K] frame pointer
    score: jnp.ndarray     # [B, K]
    g: jnp.ndarray         # [B*K, P] prediction output
    carry: tuple           # prediction LSTM state, leaves [B*K, ...]
    done: jnp.ndarray      # [B, K]


def transducer_beam_search(
    model: TransducerModel, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    cfg: TransducerBeamConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, max_len] blank-padded, lengths [B])."""
    a = model.cfg.asr
    b, t_max, d = hs.shape
    k, p, l = cfg.beam_size, cfg.pre_beam_size, cfg.max_len
    blank = a.blank_id
    n = b * k
    v = a.vocab_size
    p = min(p, v - 1)

    hs_beam = jnp.repeat(hs, k, axis=0)            # [N, T, D]
    h_len_beam = jnp.repeat(h_lengths, k, axis=0)  # [N]

    def pred_step(mdl, y, carry):
        return mdl.prediction.step(y, carry)

    def joint_step(mdl, h_t, g):
        return mdl.joint(h_t, g)

    carry0 = model.apply({"params": params},
                         method=lambda m: m.prediction.init_carry(n))
    g0, carry0 = model.apply({"params": params},
                             jnp.full((n,), blank, jnp.int32), carry0,
                             method=pred_step)
    neg = jnp.float32(-1e30)
    score0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((k - 1,), neg)])[None], (b, 1)
    ).astype(jnp.float32)

    st0 = _State(
        it=jnp.zeros((), jnp.int32),
        tokens=jnp.full((b, k, l), blank, jnp.int32),
        n_emit=jnp.zeros((b, k), jnp.int32),
        t=jnp.zeros((b, k), jnp.int32),
        score=score0,
        g=g0, carry=carry0,
        done=jnp.zeros((b, k), bool))

    max_iters = t_max + l + 1

    def cond(st: _State):
        return (st.it < max_iters) & ~jnp.all(st.done)

    def body(st: _State):
        t_flat = st.t.reshape(n)
        h_t = jnp.take_along_axis(
            hs_beam, jnp.clip(t_flat, 0, t_max - 1)[:, None, None], axis=1
        )[:, 0]  # [N, D]
        logits = model.apply({"params": params}, h_t, st.g,
                             method=joint_step)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)  # [N, V]

        # Candidate 0: blank (advance frame). Candidates 1..P: top tokens.
        blank_delta = logp[:, blank]  # [N]
        nb = logp.at[:, blank].set(neg)
        tok_delta, tok_ids = lax.top_k(nb, p)  # [N, P]
        # Emission allowed only if n_emit < L.
        can_emit = (st.n_emit.reshape(n) < l)[:, None]
        tok_delta = jnp.where(can_emit, tok_delta, neg)
        deltas = jnp.concatenate([blank_delta[:, None], tok_delta], 1)
        # Done hyps: freeze (candidate 0 at delta 0).
        done_n = st.done.reshape(n)
        frozen = jnp.concatenate(
            [jnp.zeros((n, 1)), jnp.full((n, p), neg)], 1)
        deltas = jnp.where(done_n[:, None], frozen, deltas)

        totals = st.score.reshape(n)[:, None] + deltas  # [N, P+1]
        flat = totals.reshape(b, k * (p + 1))
        new_score, idx = lax.top_k(flat, k)
        parent = idx // (p + 1)  # [B, K]
        choice = idx % (p + 1)
        parent_n = (parent + jnp.arange(b)[:, None] * k).reshape(n)

        def gn(x):
            return x[parent_n]

        is_blank = (choice == 0).reshape(n)
        tok_ids_g = gn(tok_ids)  # [N, P]
        chosen_tok = jnp.take_along_axis(
            tok_ids_g, jnp.maximum(choice.reshape(n) - 1, 0)[:, None],
            axis=1)[:, 0]
        chosen_tok = jnp.where(is_blank, blank, chosen_tok)

        t_new = gn(st.t.reshape(n)) + is_blank.astype(jnp.int32)
        done_new = gn(done_n) | (t_new >= gn(h_len_beam))

        n_emit_g = gn(st.n_emit.reshape(n))
        emit = ~is_blank & ~gn(done_n)
        tokens_g = st.tokens.reshape(n, l)[parent_n]
        write_pos = jnp.minimum(n_emit_g, l - 1)
        tokens_new = jnp.where(
            emit[:, None]
            & (jnp.arange(l)[None, :] == write_pos[:, None]),
            chosen_tok[:, None], tokens_g)
        n_emit_new = n_emit_g + emit.astype(jnp.int32)

        g_g = gn(st.g)
        carry_g = jax.tree.map(gn, st.carry)
        g_upd, carry_upd = model.apply(
            {"params": params}, jnp.where(emit, chosen_tok, blank), carry_g,
            method=pred_step)
        g_new = jnp.where(emit[:, None], g_upd, g_g)
        carry_new = jax.tree.map(
            lambda new, old: jnp.where(
                emit.reshape((n,) + (1,) * (new.ndim - 1)), new, old),
            carry_upd, carry_g)

        return _State(
            it=st.it + 1,
            tokens=tokens_new.reshape(b, k, l),
            n_emit=n_emit_new.reshape(b, k),
            t=t_new.reshape(b, k),
            score=new_score,
            g=g_new, carry=carry_new,
            done=done_new.reshape(b, k))

    fin = lax.while_loop(cond, body, st0)
    # Prefer completed hypotheses; mild length reward (score / 1 as in the
    # reference default: final sort by score).
    final_score = jnp.where(fin.done, fin.score, fin.score + neg)
    best = jnp.argmax(final_score, axis=1)
    tokens = jnp.take_along_axis(fin.tokens, best[:, None, None],
                                 axis=1)[:, 0]
    lengths = jnp.take_along_axis(fin.n_emit, best[:, None], axis=1)[:, 0]
    return tokens, lengths
