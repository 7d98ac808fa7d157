"""Time-synchronous CTC prefix beam search (+ attention rescoring).

Parity target: reference espnet/nets/beam_search_timesync.py (frame-
synchronous decoding over CTC posteriors with attention/LM scoring). The
core is the classic CTC prefix beam (Hannun et al.): per frame each prefix
keeps blank-/non-blank-ending probabilities; extensions merge repeats and
blanks implicitly.

TPU design: ONE lax.fori_loop over frames with fixed [B, K] beam state and
[B, K, 1+P] candidates (stay + top-P extensions) — no python hypothesis
dicts. Deviations (documented): duplicate prefixes reached via different
parents are not merged (the dominant stay/repeat merges ARE handled by the
(p_b, p_nb) bookkeeping), and attention scoring is applied as n-best
RESCORING after the search rather than interleaved per expansion.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG = -1e30


@dataclasses.dataclass(frozen=True)
class TimeSyncConfig:
    beam_size: int = 10
    pre_beam_size: int = 8     # non-blank extensions per hypothesis/frame
    max_len: int = 128
    att_weight: float = 0.0    # >0: rescore final beam with the decoder


def _lse(a, b):
    m = jnp.maximum(a, b)
    m = jnp.maximum(m, NEG)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def ctc_prefix_beam_full(
    model, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    cfg: TimeSyncConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Frame-synchronous CTC prefix beam returning the FULL final beam.

    Returns (tokens [B, K, max_len], lengths [B, K], ctc_scores [B, K]) —
    the n-best lattice-path extraction consumed by decode/lattice.py (the
    asr_inference_k2.py n-best analogue) and by ctc_timesync_beam_search.
    """
    mcfg = model.cfg
    blank = mcfg.blank_id
    b, t_max, _ = hs.shape
    k, p, l = cfg.beam_size, cfg.pre_beam_size, cfg.max_len
    v = mcfg.vocab_size
    p = min(p, v - 1)
    n = b * k

    ctc_lp = model.apply({"params": params}, hs,
                         method=lambda m, x: m.ctc_logprobs(x))  # [B,T,V]

    tokens0 = jnp.full((b, k, l), blank, jnp.int32)
    n0 = jnp.zeros((b, k), jnp.int32)
    # only beam slot 0 is live initially (empty prefix, all blank so far)
    p_b0 = jnp.where(jnp.arange(k)[None, :] == 0, 0.0, NEG) * jnp.ones(
        (b, 1))
    p_nb0 = jnp.full((b, k), NEG)

    def frame(t, st):
        tokens, n_emit, p_b, p_nb = st
        lp = ctc_lp[:, jnp.minimum(t, t_max - 1)]  # [B, V]
        lp_k = jnp.repeat(lp, k, axis=0)           # [N, V]
        last = jnp.take_along_axis(
            tokens.reshape(n, l),
            jnp.maximum(n_emit.reshape(n) - 1, 0)[:, None], 1)[:, 0]
        has_last = n_emit.reshape(n) > 0

        pb = p_b.reshape(n)
        pnb = p_nb.reshape(n)
        tot = _lse(pb, pnb)
        # stay: blank after anything, or repeat of the last label
        stay_b = tot + lp_k[:, blank]
        rep_lp = jnp.take_along_axis(lp_k, last[:, None], 1)[:, 0]
        stay_nb = jnp.where(has_last, pnb + rep_lp, NEG)
        stay_score = _lse(stay_b, stay_nb)

        # extensions: top-P non-blank tokens
        nb = lp_k.at[:, blank].set(NEG)
        top_lp, top_id = lax.top_k(nb, p)          # [N, P]
        same_as_last = top_id == last[:, None]
        base = jnp.where(same_as_last & has_last[:, None],
                         pb[:, None], tot[:, None])
        can = (n_emit.reshape(n) < l)[:, None]
        ext_score = jnp.where(can, base + top_lp, NEG)

        scores = jnp.concatenate([stay_score[:, None], ext_score], 1)
        flat = scores.reshape(b, k * (p + 1))
        new_tot, idx = lax.top_k(flat, k)
        parent = idx // (p + 1)
        choice = idx % (p + 1)
        parent_n = (parent + jnp.arange(b)[:, None] * k).reshape(n)
        gn = lambda x: x[parent_n]

        is_stay = (choice == 0).reshape(n)
        tok = jnp.take_along_axis(
            gn(top_id), jnp.maximum(choice.reshape(n) - 1, 0)[:, None],
            1)[:, 0]
        tokens_g = tokens.reshape(n, l)[parent_n]
        n_g = gn(n_emit.reshape(n))
        wp = jnp.minimum(n_g, l - 1)
        tokens_new = jnp.where(
            (~is_stay)[:, None] & (jnp.arange(l)[None, :] == wp[:, None]),
            tok[:, None], tokens_g)
        n_new = n_g + (~is_stay).astype(jnp.int32)

        new_p_b = jnp.where(is_stay, gn(stay_b), NEG)
        new_p_nb = jnp.where(is_stay, gn(stay_nb),
                             jnp.take_along_axis(
                                 gn(ext_score.reshape(n, p)),
                                 jnp.maximum(choice.reshape(n) - 1,
                                             0)[:, None], 1)[:, 0])
        # freeze past each utterance's length
        live = (t < jnp.repeat(h_lengths, k)).reshape(n)
        tokens_new = jnp.where(live[:, None], tokens_new,
                               tokens.reshape(n, l))
        n_new = jnp.where(live, n_new, n_emit.reshape(n))
        new_p_b = jnp.where(live, new_p_b, pb)
        new_p_nb = jnp.where(live, new_p_nb, pnb)
        return (tokens_new.reshape(b, k, l), n_new.reshape(b, k),
                new_p_b.reshape(b, k), new_p_nb.reshape(b, k))

    tokens, n_emit, p_b, p_nb = lax.fori_loop(
        0, t_max, frame, (tokens0, n0, p_b0, p_nb0))
    total = _lse(p_b, p_nb)
    return tokens, n_emit, total


def ctc_timesync_beam_search(
    model, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    cfg: TimeSyncConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-synchronous CTC prefix beam over the model's CTC posteriors.

    Returns (tokens [B, max_len] blank-padded, lengths [B]).
    """
    tokens, n_emit, total = ctc_prefix_beam_full(model, params, hs,
                                                 h_lengths, cfg)
    if cfg.att_weight > 0.0:
        # n-best attention rescoring (deviation from interleaved scoring).
        from ..train.mbr import hyp_scores
        att = hyp_scores(model, params, hs, h_lengths, tokens, n_emit)
        total = (1.0 - cfg.att_weight) * total + cfg.att_weight * att

    best = jnp.argmax(total, axis=1)
    out = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(n_emit, best[:, None], axis=1)[:, 0]
    return out, lengths
