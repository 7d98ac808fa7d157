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


@dataclasses.dataclass(frozen=True)
class MAESConfig:
    """modified Adaptive Expansion Search options
    (beam_search_transducer.py:720-877)."""
    beam_size: int = 5
    nstep: int = 2               # expansion rounds per frame
    max_candidates: int = 5      # candidates considered per round (incl blank)
    expansion_gamma: float = 2.3  # prune-by-value window per hypothesis
    max_len: int = 128


def maes_search(
    model: TransducerModel, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    cfg: MAESConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched mAES: frame-synchronous with up to ``nstep`` label-expansion
    rounds per frame and per-hypothesis prune-by-value
    (select_k_expansions: keep candidates within expansion_gamma of each
    hypothesis's best — asr_transducer/beam_search_transducer.py:223-262).

    Returns (tokens [B, max_len] blank-padded, lengths [B]).
    """
    return _frame_sync_search(
        model, params, hs, h_lengths, beam_size=cfg.beam_size,
        nstep=cfg.nstep, max_candidates=cfg.max_candidates,
        gamma=cfg.expansion_gamma, max_len=cfg.max_len)


@dataclasses.dataclass(frozen=True)
class TSDConfig:
    """Time-synchronous decoding options
    (beam_search_transducer.py:356-451)."""
    beam_size: int = 5
    max_sym_exp: int = 2   # symbol expansions per frame (config `v` loop)
    max_len: int = 128


def tsd_search(model, params, hs, h_lengths, cfg: TSDConfig):
    """Batched TSD (Saon et al.): per frame, up to ``max_sym_exp`` label
    expansion rounds over the top-``beam_size`` candidates; blank moves a
    hypothesis to the next frame's beam. Same lockstep machinery as mAES
    with value-pruning disabled (every top candidate survives a round)."""
    return _frame_sync_search(
        model, params, hs, h_lengths, beam_size=cfg.beam_size,
        nstep=cfg.max_sym_exp, max_candidates=cfg.beam_size,
        gamma=None, max_len=cfg.max_len)


@dataclasses.dataclass(frozen=True)
class NSCConfig:
    """N-step constrained beam search options
    (beam_search_transducer.py:557-719)."""
    beam_size: int = 5
    nstep: int = 2
    max_candidates: int = 5
    max_len: int = 128


def nsc_search(model, params, hs, h_lengths, cfg: NSCConfig):
    """Batched NSC (Kim et al. 2020): per frame, exactly ``nstep``
    constrained expansion rounds over ``max_candidates`` labels, then a
    forced blank settles survivors into the next frame's beam."""
    return _frame_sync_search(
        model, params, hs, h_lengths, beam_size=cfg.beam_size,
        nstep=cfg.nstep, max_candidates=cfg.max_candidates,
        gamma=None, max_len=cfg.max_len)


@dataclasses.dataclass(frozen=True)
class DefaultBeamConfig:
    """Graves-2012 `default` beam search options
    (beam_search_transducer.py:255-355)."""
    beam_size: int = 5
    max_len: int = 128
    # The reference's per-frame `while True` expansion loop has no bound; a
    # fixed-shape kernel needs one. Expansions per frame are capped here
    # (documented deviation — the stop condition almost always fires first).
    max_expansions: int = 12


def default_beam_search(
    model: TransducerModel, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    cfg: DefaultBeamConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched `default` transducer beam search (Graves 2012, modified).

    Faithful to beam_search_transducer.py:255-355: per frame, repeatedly pop
    the highest-scoring hypothesis from the active pool, extend it with blank
    (into the kept pool, same prefix) and with the top beam_k non-blank
    tokens (back into the active pool, same frame); stop once >= beam kept
    hypotheses outscore the best active one.

    TPU shape discipline: the reference's growing python lists become two
    fixed pools per batch row — kept [B, K] and active [B, A] with
    A = K + E*(beam_k-1) + 1 sized so no live hypothesis is ever pruned
    within the E-expansion cap; pool membership is score==-inf. One popped
    hypothesis per batch row per inner while_loop iteration (the reference
    is serial in exactly the same way). Deviations (shared with the serial
    test port): expansion cap E, kept truncated to top-K (the reference
    carries every kept hypothesis until the frame ends), no prefix merge.

    Returns (tokens [B, max_len] blank-padded, lengths [B]).
    """
    a = model.cfg.asr
    b, t_max, d = hs.shape
    k, l, e = cfg.beam_size, cfg.max_len, cfg.max_expansions
    v = a.vocab_size
    blank = a.blank_id
    bk = min(k, v - 1)
    aa = k + e * (bk - 1) + 1  # active-pool capacity: lossless within cap
    neg = jnp.float32(-1e30)

    def pred_step(mdl, y, carry):
        return mdl.prediction.step(y, carry)

    def joint_step(mdl, h_t, g):
        return mdl.joint(h_t, g)

    carry0 = model.apply({"params": params},
                         method=lambda m: m.prediction.init_carry(b))
    g0, carry0 = model.apply({"params": params},
                             jnp.full((b,), blank, jnp.int32), carry0,
                             method=pred_step)
    p = g0.shape[-1]

    def tile_pool(x, cap):
        # [B, ...] -> [B*cap, ...] (slot 0 real, others placeholders)
        return jnp.repeat(x, cap, axis=0)

    kept = dict(
        tokens=jnp.full((b, k, l), blank, jnp.int32),
        ne=jnp.zeros((b, k), jnp.int32),
        score=jnp.concatenate(
            [jnp.zeros((b, 1)), jnp.full((b, k - 1), neg)], 1),
        g=tile_pool(g0, k),
        carry=jax.tree.map(lambda x: tile_pool(x, k), carry0),
    )

    def gather_pool(pool, idx, cap):
        # idx [B, M] into a cap-sized pool; returns an M-sized pool
        m = idx.shape[1]
        flat = (idx + jnp.arange(b)[:, None] * cap).reshape(b * m)
        return dict(
            tokens=pool["tokens"].reshape(b * cap, l)[flat].reshape(b, m, l),
            ne=pool["ne"].reshape(b * cap)[flat].reshape(b, m),
            score=jnp.take_along_axis(pool["score"], idx, axis=1),
            g=pool["g"][flat],
            carry=jax.tree.map(lambda x: x[flat], pool["carry"]),
        )

    def concat_pools(p1, c1, p2, c2):
        return dict(
            tokens=jnp.concatenate(
                [p1["tokens"], p2["tokens"]], 1),
            ne=jnp.concatenate([p1["ne"], p2["ne"]], 1),
            score=jnp.concatenate([p1["score"], p2["score"]], 1),
            g=jnp.concatenate([p1["g"].reshape(b, c1, p),
                               p2["g"].reshape(b, c2, p)], 1
                              ).reshape(b * (c1 + c2), p),
            carry=jax.tree.map(
                lambda x, y: jnp.concatenate(
                    [x.reshape((b, c1) + x.shape[1:]),
                     y.reshape((b, c2) + y.shape[1:])], 1
                ).reshape((b * (c1 + c2),) + x.shape[1:]),
                p1["carry"], p2["carry"]),
        )

    def topk_pool(pool, cap_in, m):
        sc, idx = lax.top_k(pool["score"], m)
        out = gather_pool(pool, idx, cap_in)
        out["score"] = sc
        return out

    def frame_body(t, kept):
        h_t = hs[:, t]  # [B, D]
        frame_done0 = t >= h_lengths  # inactive rows carry kept through

        # active pool <- kept (padded to capacity A with -inf slots)
        pad = dict(
            tokens=jnp.full((b, aa - k, l), blank, jnp.int32),
            ne=jnp.zeros((b, aa - k), jnp.int32),
            score=jnp.full((b, aa - k), neg),
            g=tile_pool(g0, aa - k),
            carry=jax.tree.map(lambda x: tile_pool(x, aa - k), carry0),
        )
        act = concat_pools(kept, k, pad, aa - k)
        kept0 = dict(
            tokens=kept["tokens"], ne=kept["ne"],
            score=jnp.where(frame_done0[:, None], kept["score"], neg),
            g=kept["g"], carry=kept["carry"])

        def cond(st):
            it, act, kept, done = st
            return (it < e) & ~jnp.all(done)

        def body(st):
            it, act, kept, done = st
            # pop per-row argmax
            h_idx = jnp.argmax(act["score"], axis=1)  # [B]
            star = gather_pool(act, h_idx[:, None], aa)  # 1-pool
            s_star = star["score"][:, 0]
            logits = model.apply({"params": params}, h_t,
                                 star["g"], method=joint_step)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)  # [B,V]
            blank_lp = lp[:, blank]
            nb = lp.at[:, blank].set(neg)
            tok_delta, tok_ids = lax.top_k(nb, bk)  # [B, bk]

            # kept <- kept + blank child (top-K merge)
            bchild = dict(
                tokens=star["tokens"], ne=star["ne"],
                score=jnp.where(done, neg, s_star + blank_lp)[:, None],
                g=star["g"], carry=star["carry"])
            kept_new = topk_pool(concat_pools(kept, k, bchild, 1), k + 1, k)

            # active <- active (popped slot cleared) + token children
            can = (star["ne"][:, 0] < l) & ~done  # [B]
            child_sc = jnp.where(can[:, None],
                                 s_star[:, None] + tok_delta, neg)
            y = tok_ids.reshape(b * bk)
            carry_in = jax.tree.map(lambda x: jnp.repeat(x, bk, axis=0),
                                    star["carry"])
            g_ch, carry_ch = model.apply({"params": params}, y, carry_in,
                                         method=pred_step)
            wp = jnp.minimum(star["ne"], l - 1)  # [B, 1]
            tok_b = jnp.repeat(star["tokens"], bk, axis=1)  # [B, bk, L]
            tokens_ch = jnp.where(
                jnp.arange(l)[None, None, :] == wp[:, :, None],
                tok_ids[:, :, None], tok_b)
            children = dict(
                tokens=tokens_ch,
                ne=jnp.repeat(star["ne"], bk, axis=1) + 1,
                score=child_sc, g=g_ch, carry=carry_ch)
            popped = ((jnp.arange(aa)[None, :] == h_idx[:, None])
                      & ~done[:, None])
            act_sc = jnp.where(popped, neg, act["score"])
            act_cl = dict(act, score=act_sc)
            act_new = topk_pool(concat_pools(act_cl, aa, children, bk),
                                aa + bk, aa)

            # stop: >= K kept outscore the best active hypothesis
            hyps_max = jnp.max(act_new["score"], axis=1)
            n_better = jnp.sum(kept_new["score"] > hyps_max[:, None], axis=1)
            done_new = done | (n_better >= k)

            def frz(new, old):
                return jax.tree.map(
                    lambda nw, od: jnp.where(
                        done.reshape((b,) + (1,) * (nw.ndim - 1))
                        if nw.shape[0] == b else
                        jnp.repeat(done, nw.shape[0] // b
                                   ).reshape((nw.shape[0],)
                                             + (1,) * (nw.ndim - 1)),
                        od, nw),
                    new, old)

            return (it + 1, frz(act_new, act), frz(kept_new, kept),
                    done_new)

        _, _, kept_fin, _ = lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), act, kept0, frame_done0))
        return kept_fin

    kept = lax.fori_loop(0, t_max, frame_body, kept)
    best = jnp.argmax(kept["score"], axis=1)
    out = gather_pool(kept, best[:, None], k)
    return out["tokens"][:, 0], out["ne"][:, 0]


def _frame_sync_search(
    model: TransducerModel, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    *, beam_size: int, nstep: int, max_candidates: int,
    gamma: Optional[float], max_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared frame-synchronous expansion search behind mAES / TSD / NSC.

    TPU shape discipline: the reference's per-frame python lists (list_b /
    list_exp with dedup) become a fixed [B, K] beam with a per-hyp
    ``settled`` flag — a settled hypothesis took blank this frame and only
    proposes a zero-delta carry for the remaining rounds; after the last
    round, still-active hypotheses are settled with a forced blank. The
    reference's prefix merge (prefix_search) and exact duplicate check are
    omitted (both need dynamic hypothesis identity; at these beam sizes
    they change scores marginally — documented deviation). ``gamma`` is the
    mAES prune-by-value window; ``None`` keeps every top candidate (TSD and
    NSC behavior).

    Returns (tokens [B, max_len] blank-padded, lengths [B]).
    """
    a = model.cfg.asr
    b, t_max, d = hs.shape
    k, l = beam_size, max_len
    mc = min(max_candidates, a.vocab_size)
    blank = a.blank_id
    n = b * k
    neg = jnp.float32(-1e30)

    hs_beam = jnp.repeat(hs, k, axis=0)
    h_len_beam = jnp.repeat(h_lengths, k, axis=0)

    def pred_step(mdl, y, carry):
        return mdl.prediction.step(y, carry)

    carry0 = model.apply({"params": params},
                         method=lambda m: m.prediction.init_carry(n))
    g0, carry0 = model.apply({"params": params},
                             jnp.full((n,), blank, jnp.int32), carry0,
                             method=pred_step)
    score0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((k - 1,), neg)])[None], (b, 1)
    ).astype(jnp.float32)

    def joint_lp(t, g):
        h_t = jnp.take_along_axis(
            hs_beam, jnp.full((n, 1, 1), 0) + t, axis=1)[:, 0]
        logits = model.apply({"params": params}, h_t, g,
                             method=lambda m, h, gg: m.joint(h, gg))
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1)

    def frame_body(t, st):
        tokens, n_emit, score, g, carry = st
        frame_ok = (t < h_len_beam).reshape(b, k)  # this frame exists
        settled = ~frame_ok  # out-of-range hyps only carry

        def round_step(state):
            tokens, n_emit, score, g, carry, settled = state
            lp = joint_lp(t, g)  # [N, V]
            blank_lp = lp[:, blank]
            nb = lp.at[:, blank].set(neg)
            topv, topi = lax.top_k(nb, mc)  # [N, mc]
            can_emit = (n_emit.reshape(n) < l)[:, None]
            if gamma is not None:
                # prune-by-value per hyp: best candidate INCLUDES blank
                best = jnp.maximum(topv[:, 0], blank_lp)
                keep = topv >= (best - gamma)[:, None]
                exp_delta = jnp.where(keep & can_emit, topv, neg)
                settle_delta = jnp.where(
                    blank_lp >= best - gamma, blank_lp, neg)
            else:
                exp_delta = jnp.where(can_emit, topv, neg)
                settle_delta = blank_lp
            s_n = settled.reshape(n)
            # slot 0: settled-carry (0) or settle-via-blank; 1..mc: expand
            slot0 = jnp.where(s_n, 0.0, settle_delta)
            deltas = jnp.concatenate([slot0[:, None],
                                      jnp.where(s_n[:, None], neg,
                                                exp_delta)], 1)
            totals = score.reshape(n)[:, None] + deltas
            new_score, idx = lax.top_k(totals.reshape(b, k * (mc + 1)), k)
            parent = idx // (mc + 1)
            choice = idx % (mc + 1)
            parent_n = (parent + jnp.arange(b)[:, None] * k).reshape(n)

            gn = lambda x: x[parent_n]
            is_carry = (choice == 0).reshape(n)
            settled_new = gn(s_n) | is_carry
            tok = jnp.take_along_axis(
                gn(topi), jnp.maximum(choice.reshape(n) - 1, 0)[:, None],
                1)[:, 0]
            emit = ~is_carry
            tokens_g = tokens.reshape(n, l)[parent_n]
            n_emit_g = gn(n_emit.reshape(n))
            wp = jnp.minimum(n_emit_g, l - 1)
            tokens_new = jnp.where(
                emit[:, None] & (jnp.arange(l)[None, :] == wp[:, None]),
                tok[:, None], tokens_g)
            n_emit_new = n_emit_g + emit.astype(jnp.int32)
            g_g = gn(g)
            carry_g = jax.tree.map(gn, carry)
            g_upd, carry_upd = model.apply(
                {"params": params}, jnp.where(emit, tok, blank), carry_g,
                method=pred_step)
            g_new = jnp.where(emit[:, None], g_upd, g_g)
            carry_new = jax.tree.map(
                lambda nw, od: jnp.where(
                    emit.reshape((n,) + (1,) * (nw.ndim - 1)), nw, od),
                carry_upd, carry_g)
            return (tokens_new.reshape(b, k, l), n_emit_new.reshape(b, k),
                    new_score, g_new, carry_new, settled_new.reshape(b, k))

        state = (tokens, n_emit, score, g, carry, settled)
        for r in range(nstep):
            state = round_step(state)
        tokens, n_emit, score, g, carry, settled = state
        # Remaining active hyps settle with a forced blank (the reference's
        # final beam_logp[:, 0] addition after the last round).
        lp = joint_lp(t, g)
        score = score + jnp.where(settled, 0.0,
                                  lp[:, blank].reshape(b, k))
        return (tokens, n_emit, score, g, carry)

    st = (jnp.full((b, k, l), blank, jnp.int32), jnp.zeros((b, k), jnp.int32),
          score0, g0, carry0)
    tokens, n_emit, score, g, carry = lax.fori_loop(0, t_max, frame_body, st)
    best = jnp.argmax(score, axis=1)
    out = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(n_emit, best[:, None], axis=1)[:, 0]
    return out, lengths
