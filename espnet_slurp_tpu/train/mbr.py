"""MBR / KB-MBR training: minimum expected word(-piece) error over n-best.

Parity target: reference espnet/nets/pytorch_backend/e2e_asr.py:854-982
(get_mbr_loss / get_KBmbr_loss) fed by the batched n-best training decode
(rnn/decoders.py:1781-1962 batch_decode_nbest). Semantics implemented:

  * decode n-best hypotheses for the batch (no gradient through the search);
  * per-hypothesis differentiable score = teacher-forced decoder log-prob
    (the reference's accumulated ``vscore``);
  * risk = edit distance between hypothesis and reference token sequences —
    the reference's ``use_wp_errors=True`` branch (word-piece errors,
    e2e_asr.py:877-878), which is the fully in-graph variant; word-level
    errors would need host-side detokenization inside the train step;
  * optional ground-truth hypothesis prepended with its own teacher-forced
    score (the ``loss_sep`` path, e2e_asr.py:861-863) at risk 0;
  * MBR loss = E_p[risk - mean(risk)] per utterance, batch-averaged
    (baseline-subtracted, e2e_asr.py:883);
  * KB-MBR adds ``rare_weight * E_p[rare_risk]`` where rare_risk is the edit
    distance between the KB-token subsequences of hypothesis and reference
    (get_KBmbr_loss:959-966; KB membership is a [V] token mask built from
    the biasing trie by the host).

TPU design: the whole thing is one jit region — beam search runs on
stop_gradient inputs (reverse-mode cannot cross ``lax.while_loop``), risks
use a vectorized Levenshtein DP whose inner row recurrence is rewritten as a
prefix-min associative scan (no serial dependency along the row), and the
n-best rescore is a single [B*K] teacher-forced decoder batch.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..models.asr_model import IGNORE_ID, add_sos_eos


@dataclasses.dataclass(frozen=True)
class MBRConfig:
    weight: float = 0.0            # 0 disables MBR entirely
    beam_size: int = 4
    pre_beam_size: int = 12
    max_len: int = 96
    ctc_weight: float = 0.0        # ctc weight inside the n-best search
    mwe_factor: float = 1.0        # e2e_asr.py mwe_factor
    include_gt: bool = True        # loss_sep path: GT as extra hypothesis
    rare_weight: float = 0.0       # >0 enables the KB-MBR rare-error term
    # KB token ids for the rare-error term (subword ids appearing in the
    # biasing list; built from the trie's token set or given in config).
    kb_tokens: tuple = ()


def edit_distance(hyp: jnp.ndarray, hyp_len: jnp.ndarray,
                  ref: jnp.ndarray, ref_len: jnp.ndarray) -> jnp.ndarray:
    """Batched Levenshtein distance. hyp [N, Lh], ref [N, Lr] -> [N] int32.

    Row recurrence with the insertion term rewritten as a running prefix-min:
      cand[j] = min(prev[j] + 1, prev[j-1] + sub_cost)
      new[j]  = j + cummin_{k<=j}(cand[k] - k)
    so each DP row is pure vector ops + one associative scan.
    """
    n, lh = hyp.shape
    lr = ref.shape[1]
    big = jnp.int32(10 ** 6)
    idx = jnp.arange(lr + 1, dtype=jnp.int32)

    row0 = jnp.broadcast_to(idx, (n, lr + 1)).astype(jnp.int32)
    row0 = jnp.minimum(row0, ref_len[:, None] + 0)  # positions past ref frozen

    def step(prev, i):
        tok = hyp[:, i]                                   # [N]
        sub = (ref != tok[:, None]).astype(jnp.int32)     # [N, Lr]
        prev_shift = jnp.pad(prev, ((0, 0), (1, 0)),
                             constant_values=0)[:, :lr + 1]
        # cand[0] corresponds to deletion-only start (prev[0] + 1).
        cand = jnp.concatenate(
            [prev[:, :1] + 1,
             jnp.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub)], axis=1)
        a = cand - idx[None, :]
        a = lax.associative_scan(jnp.minimum, a, axis=1)
        new = a + idx[None, :]
        # freeze rows past each hyp's length
        active = (i < hyp_len)[:, None]
        return jnp.where(active, new, prev), None

    final, _ = lax.scan(step, row0, jnp.arange(lh))
    return jnp.take_along_axis(final, ref_len[:, None], axis=1)[:, 0]


def compact_masked(tokens: jnp.ndarray, lengths: jnp.ndarray,
                   keep_tok: jnp.ndarray):
    """Keep only tokens with keep_tok[token] (and within length), compacted
    to the front preserving order. Returns (tokens2 [N, L], lengths2 [N])."""
    n, l = tokens.shape
    pos = jnp.arange(l)[None, :]
    keep = keep_tok[tokens] & (pos < lengths[:, None])
    order = jnp.argsort(~keep, axis=1, stable=True)
    out = jnp.take_along_axis(tokens, order, axis=1)
    return out, jnp.sum(keep, axis=1).astype(jnp.int32)


def hyp_scores(model, params, hs, h_lengths, tokens, lengths, *,
               train: bool = False) -> jnp.ndarray:
    """Teacher-forced decoder log-prob of each hypothesis.

    tokens [B, K, L] (no sos/eos), lengths [B, K] -> scores [B, K]
    (the differentiable analogue of the reference's per-hyp ``vscore``).
    """
    c = model.cfg
    b, k, l = tokens.shape
    nl = b * k
    ys = jnp.maximum(tokens.reshape(nl, l), 0)
    ln = lengths.reshape(nl)
    ys_in, ys_out = add_sos_eos(ys, ln, c.sos_id, c.eos_id)
    hs_rep = jnp.repeat(hs, k, axis=0)
    hl_rep = jnp.repeat(h_lengths, k, axis=0)
    logits = model.apply(
        {"params": params}, ys_in, ln + 1, hs_rep, hl_rep,
        method=lambda m, yi, yl, h, hl: m.decoder(
            yi, yl, h, hl, deterministic=not train))
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = ys_out != IGNORE_ID
    tok_lp = jnp.take_along_axis(
        logp, jnp.maximum(ys_out, 0)[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1).reshape(b, k)


def mbr_loss(model, params, hs, h_lengths, text, text_lengths,
             cfg: MBRConfig, *, kb_token_mask: Optional[jnp.ndarray] = None,
             train: bool = False):
    """Expected-risk loss over the n-best of the current model.

    Returns (loss, stats). ``hs`` may carry gradient (shared encode); the
    n-best SEARCH runs on stop-gradient copies, the RESCORE does not.
    """
    from ..decode.beam import BeamSearchConfig, batch_beam_search
    c = model.cfg
    bcfg = BeamSearchConfig(
        beam_size=cfg.beam_size, pre_beam_size=cfg.pre_beam_size,
        max_len=cfg.max_len, ctc_weight=cfg.ctc_weight)
    params_sg = jax.tree.map(lax.stop_gradient, params)
    hs_sg = lax.stop_gradient(hs)
    _, _, nb_tokens, nb_lengths, _ = batch_beam_search(
        model, params_sg, hs_sg, h_lengths, bcfg, return_nbest=True)
    nb_tokens = lax.stop_gradient(nb_tokens)       # [B, K, L]
    nb_lengths = lax.stop_gradient(nb_lengths)     # [B, K]
    b, k, l = nb_tokens.shape

    ref = jnp.maximum(text, 0)
    if cfg.include_gt:
        # GT as hypothesis 0 at risk 0 (the loss_sep path).
        lr = max(l, ref.shape[1])
        pad_to = lambda x, ln: jnp.pad(x, ((0, 0), (0, 0), (0, lr - x.shape[2])))
        gt = jnp.pad(ref, ((0, 0), (0, lr - ref.shape[1])))[:, None, :]
        nb_tokens = pad_to(nb_tokens, l)
        nb_tokens = jnp.concatenate([gt, nb_tokens], axis=1)
        nb_lengths = jnp.concatenate([text_lengths[:, None], nb_lengths], 1)
        k = k + 1
        l = lr

    scores = hyp_scores(model, params, hs, h_lengths, nb_tokens, nb_lengths,
                        train=train)                              # [B, K]
    p = jax.nn.softmax(scores, axis=-1)

    flat_t = nb_tokens.reshape(b * k, l)
    flat_l = nb_lengths.reshape(b * k)
    ref_rep = jnp.repeat(ref, k, axis=0)
    ref_len_rep = jnp.repeat(text_lengths, k, axis=0)
    werr = edit_distance(flat_t, flat_l, ref_rep,
                         ref_len_rep).reshape(b, k).astype(jnp.float32)
    if cfg.include_gt:
        werr = werr.at[:, 0].set(0.0)
    werr = werr * cfg.mwe_factor

    loss = jnp.mean(jnp.sum(p * (werr - jnp.mean(werr, axis=1,
                                                 keepdims=True)), axis=1))
    stats = {"mbr_expected_risk": jnp.mean(jnp.sum(p * werr, axis=1))}

    if cfg.rare_weight > 0.0 and kb_token_mask is not None:
        hyp_rare, hyp_rare_len = compact_masked(flat_t, flat_l,
                                                kb_token_mask)
        ref_rare, ref_rare_len = compact_masked(ref_rep, ref_len_rep,
                                                kb_token_mask)
        rerr = edit_distance(hyp_rare, hyp_rare_len, ref_rare,
                             ref_rare_len).reshape(b, k).astype(jnp.float32)
        if cfg.include_gt:
            rerr = rerr.at[:, 0].set(0.0)
        # only utterances whose reference contains KB words contribute
        # (get_KBmbr_loss: rare_seq_ref != [])
        has_rare = (ref_rare_len.reshape(b, k)[:, 0] > 0).astype(jnp.float32)
        rare_term = jnp.sum(p * rerr, axis=1) * has_rare
        loss = loss + cfg.rare_weight * jnp.mean(rare_term)
        stats["mbr_rare_risk"] = jnp.mean(rare_term)

    stats["loss_mbr"] = loss
    return loss, stats


def make_mbr_aux_loss(model, cfg: MBRConfig, *, mvn_stats=None,
                      kb_token_mask=None):
    """aux_loss_fn for train/state.py:make_train_step.

    Re-encodes the batch (one extra encoder forward — the n-best decode +
    rescore dominates MBR cost anyway, as in the reference where training
    runs batch_decode_nbest per step) and adds ``cfg.weight *`` the
    expected-risk term.
    """
    def fn(params, batch):
        hs, h_lengths, _ = model.apply(
            {"params": params}, batch["speech"], batch["speech_lengths"],
            method=lambda m, s, sl: m.encode(s, sl, mvn_stats=mvn_stats))
        loss, stats = mbr_loss(
            model, params, hs, h_lengths, batch["text"],
            batch["text_lengths"], cfg, kb_token_mask=kb_token_mask)
        return cfg.weight * loss, stats
    return fn
