"""Lattice-style CTC n-best decode + n-best rescoring (k2 decode analogue).

Parity target: reference espnet2/bin/asr_inference_k2.py:1-758 (CTC
topology FSA intersection -> n-best path extraction -> LM rescoring via
espnet2/fst/lm_rescore.py:1-205 nbest_am_lm_scores). The reference builds
a real FSA lattice with k2 and extracts paths; the TPU-native equivalent
keeps the whole thing as fixed-shape tensor programs: the "lattice" is the
frame-synchronous CTC prefix beam (decode/timesync.py ctc_prefix_beam_full
— one lax.fori_loop, [B, K] state), whose final beam IS the n-best path
set with exact CTC path-sum scores; rescoring composes attention,
neural-LM, ARPA n-gram and length-bonus scores over those paths, all
batched, and picks the argmax.

Deviation (documented): a k2 lattice can hold exponentially many paths;
the prefix beam keeps K. For ASR-sized beams (K <= 32) the reference's own
n-best extraction also truncates to K paths before rescoring, so the
composed scoring path is equivalent in practice.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .timesync import TimeSyncConfig, ctc_prefix_beam_full


@dataclasses.dataclass(frozen=True)
class LatticeConfig:
    beam_size: int = 10       # lattice beam = n-best paths retained
    pre_beam_size: int = 8
    max_len: int = 128
    att_weight: float = 0.0   # decoder rescoring (am_scores analogue)
    lm_weight: float = 0.0    # neural LM rescoring (lm_scores analogue)
    ngram_weight: float = 0.0  # ARPA n-gram rescoring
    length_bonus: float = 0.0


def lm_seq_scores(lm_model, lm_params, tokens, lengths, sos_id: int,
                  eos_id: int) -> jnp.ndarray:
    """Teacher-forced whole-sequence LM log-prob (lm_rescore.py
    compute_am_scores_and_lm_scores analogue). tokens [B, K, L] -> [B, K]."""
    b, k, l = tokens.shape
    n = b * k
    ys = jnp.maximum(tokens.reshape(n, l), 0)
    ln = lengths.reshape(n)
    ys_in = jnp.concatenate(
        [jnp.full((n, 1), sos_id, jnp.int32), ys], axis=1)
    logits = lm_model.apply({"params": lm_params}, ys_in, ln + 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # target at position j is ys[j] for j < len, eos at j == len
    tgt = jnp.concatenate([ys, jnp.zeros((n, 1), jnp.int32)], axis=1)
    pos = jnp.arange(l + 1)[None, :]
    tgt = jnp.where(pos == ln[:, None], eos_id, tgt)
    valid = pos <= ln[:, None]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1).reshape(b, k)


def ngram_seq_scores(ngram_step_init, tokens, lengths, sos_id: int
                     ) -> jnp.ndarray:
    """ARPA n-gram whole-sequence score via the stepwise fusion scorer
    (decode/ngram.py make_ngram_fusion). tokens [B, K, L] -> [B, K]."""
    step, init = ngram_step_init
    b, k, l = tokens.shape
    n = b * k
    ys = jnp.maximum(tokens.reshape(n, l), 0)
    ln = lengths.reshape(n)
    state = init(n)
    y_prev = jnp.full((n,), sos_id, jnp.int32)
    total = jnp.zeros((n,), jnp.float32)
    for j in range(l):
        row, state = step(y_prev, state)     # [N, V] log-probs
        tok = ys[:, j]
        lp = jnp.take_along_axis(row, tok[:, None], axis=1)[:, 0]
        total = total + jnp.where(j < ln, lp, 0.0)
        y_prev = tok
    return total.reshape(b, k)


def lattice_rescore_decode(
    model, params, hs: jnp.ndarray, h_lengths: jnp.ndarray,
    cfg: LatticeConfig, *,
    lm_model=None, lm_params=None,
    ngram_step_init: Optional[Tuple[Callable, Callable]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CTC n-best lattice decode with composed rescoring.

    Returns (tokens [B, max_len], lengths [B], details) where details holds
    the per-path score components ({B, K} arrays) for inspection.
    """
    mcfg = model.cfg
    ts = TimeSyncConfig(beam_size=cfg.beam_size,
                        pre_beam_size=cfg.pre_beam_size,
                        max_len=cfg.max_len)
    tokens, lengths, ctc_scores = ctc_prefix_beam_full(
        model, params, hs, h_lengths, ts)
    total = ctc_scores
    details = {"ctc": ctc_scores}
    if cfg.att_weight > 0.0:
        from ..train.mbr import hyp_scores
        att = hyp_scores(model, params, hs, h_lengths, tokens, lengths)
        details["att"] = att
        total = (1.0 - cfg.att_weight) * total + cfg.att_weight * att
    if cfg.lm_weight > 0.0 and lm_model is not None:
        lm = lm_seq_scores(lm_model, lm_params, tokens, lengths,
                           mcfg.sos_id, mcfg.eos_id)
        details["lm"] = lm
        total = total + cfg.lm_weight * lm
    if cfg.ngram_weight > 0.0 and ngram_step_init is not None:
        ng = ngram_seq_scores(ngram_step_init, tokens, lengths,
                              mcfg.sos_id)
        details["ngram"] = ng
        total = total + cfg.ngram_weight * ng
    if cfg.length_bonus != 0.0:
        total = total + cfg.length_bonus * lengths.astype(jnp.float32)
    details["total"] = total
    best = jnp.argmax(total, axis=1)
    out = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    out_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    return out, out_len, details
