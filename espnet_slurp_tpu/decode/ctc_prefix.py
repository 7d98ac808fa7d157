"""Vectorized CTC prefix scoring for joint CTC/attention beam search.

Parity target: reference espnet/nets/ctc_prefix_score.py:12-359
(CTCPrefixScoreTH: label-synchronous (T, 2, B*W, S) log-space forward
recursion over pre-beam candidate tokens). Here the recursion is a lax.scan
over time with static [N, P] hypothesis x candidate shapes, so the whole
scorer stays inside the jitted beam-search while_loop.

Math (Watanabe et al. hybrid CTC/attention): for prefix g and extension c,
  r_nb(t) = (r_nb(t-1) (+) phi(t-1)) * x_t(c)
  r_b(t)  = (r_b(t-1) (+) r_nb(t-1)) * x_t(blank)
  psi     = (+)_t phi(t-1) * x_t(c)     -> log P_ctc(g+c, ...)
with phi(t) = r_b^g(t) (+) [c != last(g)] r_nb^g(t), in log space.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def _lse(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    return m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))


class CTCPrefixState(NamedTuple):
    """Per-hypothesis lattice for the current prefix.

    r: [N, T, 2] log forward vars (.., 0]=non-blank, ..,1]=blank)
    psi: [N] cumulative CTC log-prob of the prefix
    last: [N] last emitted token id (-1 for empty prefix)
    """
    r: jnp.ndarray
    psi: jnp.ndarray
    last: jnp.ndarray


def init_state(ctc_lp: jnp.ndarray, lengths: jnp.ndarray) -> CTCPrefixState:
    """ctc_lp: [N, T, V] log-softmax CTC outputs; lengths: [N] valid frames."""
    n, t, _ = ctc_lp.shape
    blank_lp = masked_blank(ctc_lp, lengths)  # [N, T]
    r_b = jnp.cumsum(blank_lp, axis=1)  # empty prefix: all blanks
    r_nb = jnp.full((n, t), NEG_INF)
    r = jnp.stack([r_nb, r_b], axis=-1)
    return CTCPrefixState(r=r, psi=jnp.zeros((n,)),
                          last=jnp.full((n,), -1, jnp.int32))


def masked_blank(ctc_lp: jnp.ndarray, lengths: jnp.ndarray,
                 blank_id: int = 0) -> jnp.ndarray:
    """Blank log-probs with frames past `lengths` forced to 0 (log 1), so the
    lattice carries through padding (ctc_prefix_score.py end-frame handling).
    """
    t = ctc_lp.shape[1]
    pos = jnp.arange(t)[None, :]
    valid = pos < lengths[:, None]
    return jnp.where(valid, ctc_lp[:, :, blank_id], 0.0)


def score_candidates(
    state: CTCPrefixState,
    ctc_lp: jnp.ndarray,
    lengths: jnp.ndarray,
    cand: jnp.ndarray,
    prefix_len: jnp.ndarray,
    blank_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score P candidate extensions for each of N hypotheses.

    Args:
      state: current prefix lattices ([N, T, 2], [N], [N]).
      ctc_lp: [N, T, V]; lengths: [N]; cand: [N, P] token ids.
      prefix_len: scalar or [N] — 0 iff the prefix is empty (controls the
        t=0 boundary case).
    Returns:
      psi_new: [N, P] log P_ctc for each extended prefix.
      r_new:   [N, P, T, 2] lattices for each extension (gather the chosen
               one after top-k selection).
    """
    n, t, v = ctc_lp.shape
    p = cand.shape[1]
    x_c = jnp.take_along_axis(ctc_lp, cand[:, None, :], axis=2)  # [N, T, P]
    # Mask frames beyond length: label emission impossible.
    pos = jnp.arange(t)[None, :, None]
    valid = pos < lengths[:, None, None]
    x_c = jnp.where(valid, x_c, NEG_INF)
    x_b = masked_blank(ctc_lp, lengths, blank_id)  # [N, T]

    r_nb_g = state.r[..., 0]  # [N, T]
    r_b_g = state.r[..., 1]
    same = cand == state.last[:, None]  # [N, P] repeated label?
    phi = jnp.where(same[:, None, :], r_b_g[:, :, None],
                    _lse(r_b_g[:, :, None],
                         jnp.broadcast_to(r_nb_g[:, :, None], (n, t, p))))

    empty = (jnp.broadcast_to(jnp.asarray(prefix_len), (n,)) == 0)

    # t = 0 boundary
    r_nb0 = jnp.where(empty[:, None], x_c[:, 0, :], NEG_INF)  # [N, P]
    r_b0 = jnp.full((n, p), NEG_INF)
    psi0 = r_nb0

    xs = (jnp.moveaxis(x_c, 1, 0),            # [T, N, P]
          jnp.moveaxis(phi, 1, 0),            # [T, N, P]
          x_b.T[:, :, None])                  # [T, N, 1]

    def step(carry, inp):
        r_nb_p, r_b_p, psi = carry
        x_c_t, phi_prev, x_b_t = inp
        r_nb_t = _lse(r_nb_p, phi_prev) + x_c_t
        r_b_t = _lse(r_b_p, r_nb_p) + x_b_t
        psi = _lse(psi, phi_prev + x_c_t)
        r_nb_t = jnp.maximum(r_nb_t, NEG_INF)
        r_b_t = jnp.maximum(r_b_t, NEG_INF)
        psi = jnp.maximum(psi, NEG_INF)
        return (r_nb_t, r_b_t, psi), (r_nb_t, r_b_t)

    # Scan over frames 1..T-1; phi_prev at step t is phi[t-1].
    (_, _, psi_final), (r_nb_seq, r_b_seq) = lax.scan(
        step, (r_nb0, r_b0, psi0),
        (xs[0][1:], xs[1][:-1], xs[2][1:]))
    r_nb = jnp.concatenate([r_nb0[None], r_nb_seq], 0)  # [T, N, P]
    r_b = jnp.concatenate([r_b0[None], r_b_seq], 0)
    r_new = jnp.stack([jnp.moveaxis(r_nb, 0, 2),
                       jnp.moveaxis(r_b, 0, 2)], axis=-1)  # [N, P, T, 2]
    return psi_final, r_new


def final_score(state: CTCPrefixState, lengths: jnp.ndarray) -> jnp.ndarray:
    """log P_ctc of the prefix as a COMPLETE hypothesis (for eos): forward
    mass at the last valid frame, r_b(T) (+) r_nb(T)."""
    n, t, _ = state.r.shape
    idx = jnp.clip(lengths - 1, 0, t - 1)[:, None, None]
    r_last = jnp.take_along_axis(
        state.r, jnp.broadcast_to(idx, (n, 1, 2)), axis=1)[:, 0]  # [N, 2]
    return _lse(r_last[:, 0], r_last[:, 1])


def select(state_r_new: jnp.ndarray, psi_new: jnp.ndarray,
           cand: jnp.ndarray, choice: jnp.ndarray,
           old: CTCPrefixState) -> CTCPrefixState:
    """Gather the chosen candidate's lattice into the new state.

    choice: [N] index into the P axis (the candidate picked by beam top-k).
    """
    n = cand.shape[0]
    r = jnp.take_along_axis(
        state_r_new, choice[:, None, None, None], axis=1)[:, 0]
    psi = jnp.take_along_axis(psi_new, choice[:, None], axis=1)[:, 0]
    last = jnp.take_along_axis(cand, choice[:, None], axis=1)[:, 0]
    return CTCPrefixState(r=r, psi=psi, last=last)
