"""MaskCTC: non-autoregressive mask-predict ASR.

Parity target: reference espnet2/asr/maskctc_model.py + decoder/mlm_decoder.py
(SURVEY.md §2.4): CTC branch + conditional MLM decoder trained on randomly
masked targets; inference = CTC greedy then iterative mask-predict refinement
of low-confidence tokens.

TPU notes: the MLM decoder is the shared TransformerDecoder with causal=False
(bidirectional self-attention); mask-predict refinement is a fixed-K python
loop of whole-sequence forwards (static shapes each pass).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import ctc as ctc_ops
from ..ops.masks import length_mask
from .asr_model import ASRConfig, ASRModel, IGNORE_ID


class MaskCTCModel(nn.Module):
    """ASR encoder + CTC + conditional MLM decoder.

    The mask token id is vocab_size - 1 (shared with sos/eos slot, like the
    reference's <mask> appended last).
    """
    cfg: ASRConfig

    def setup(self):
        if self.cfg.moe_experts > 0:
            # The Switch load-balance aux loss is only wired into the
            # plain ASRModel loss; silently dropping it would collapse the
            # router onto one expert during training.
            raise NotImplementedError(
                "moe_experts > 0 is only supported by the plain ASR model")
        self.asr = ASRModel(self.cfg, name="asr")

    @property
    def mask_id(self) -> int:
        return self.cfg.vocab_size - 1

    def __call__(self, speech, speech_lengths, text, text_lengths, *,
                 train=False, specaug_rng=None, mask_rng=None,
                 mvn_stats=None, mask_ratio: float = 0.3):
        c = self.cfg
        hs, h_lengths, _ = self.asr.encode(
            speech, speech_lengths, train=train, specaug_rng=specaug_rng,
            mvn_stats=mvn_stats)
        stats: Dict[str, jnp.ndarray] = {}
        labels = jnp.maximum(text, 0)
        loss_ctc = ctc_ops.ctc_loss_mean_logits(
            self.asr.ctc_proj(hs), h_lengths, labels, text_lengths,
            c.blank_id)
        stats["loss_ctc"] = loss_ctc

        # Random masking of targets (mask-predict training).
        b, u = labels.shape
        if mask_rng is None:
            mask_rng = jax.random.PRNGKey(0)
        rand = jax.random.uniform(mask_rng, (b, u))
        valid = length_mask(text_lengths, u)
        masked = (rand < mask_ratio) & valid
        ys_in = jnp.where(masked, self.mask_id, labels)
        logits = self.asr.decoder(ys_in, text_lengths, hs, h_lengths,
                                  deterministic=not train, causal=False)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        denom = jnp.maximum(jnp.sum(masked), 1)
        loss_mlm = jnp.sum(jnp.where(masked, nll, 0.0)) / denom
        stats["loss_mlm"] = loss_mlm
        acc = jnp.sum((jnp.argmax(logits, -1) == labels) & masked) / denom
        stats["acc_mlm"] = acc
        loss = c.ctc_weight * loss_ctc + (1.0 - c.ctc_weight) * loss_mlm
        stats["loss"] = loss
        return loss, stats

    def decode(self, speech, speech_lengths, max_len: int = 128,
               n_iterations: int = 4, threshold: float = 0.99,
               mvn_stats=None):
        """Mask-predict inference (host-driven loop, device compute).

        Returns (tokens [B, max_len] blank-padded, lengths [B]).
        """
        c = self.cfg
        hs, h_lengths, _ = self.asr.encode(speech, speech_lengths,
                                           mvn_stats=mvn_stats)
        lp = self.asr.ctc_logprobs(hs)  # [B, T, V]
        ids = jnp.argmax(lp, -1)
        conf = jnp.max(jnp.exp(lp), -1)
        # Host-side collapse (variable lengths) then device refinement.
        import numpy as np
        ids_np = np.asarray(ids)
        conf_np = np.asarray(conf)
        hl = np.asarray(h_lengths)
        b = ids_np.shape[0]
        tokens = np.zeros((b, max_len), np.int32)
        confs = np.zeros((b, max_len), np.float32)
        lengths = np.zeros((b,), np.int32)
        for i in range(b):
            prev = -1
            out = []
            cf = []
            for t in range(hl[i]):
                v = int(ids_np[i, t])
                if v != c.blank_id and v != prev:
                    out.append(v)
                    cf.append(conf_np[i, t])
                prev = v
            out = out[:max_len]
            tokens[i, :len(out)] = out
            confs[i, :len(out)] = cf[:len(out)]
            lengths[i] = len(out)
        tokens = jnp.asarray(tokens)
        lengths_j = jnp.asarray(lengths)
        valid = length_mask(lengths_j, max_len)
        to_mask = (jnp.asarray(confs) < threshold) & valid
        ys = jnp.where(to_mask, self.mask_id, tokens)
        # Per-row fill budget: each of the K iterations reveals ~1/K of the
        # initially-masked positions, highest predicted confidence first
        # (reference maskctc_model: fill top ceil(n_mask/K) masked per pass).
        n_masked0 = jnp.sum(to_mask, axis=1)  # [B]
        for _ in range(n_iterations):
            logits = self.asr.decoder(ys, lengths_j, hs, h_lengths,
                                      causal=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
            pred = jnp.argmax(probs, -1)
            pconf = jnp.max(probs, -1)
            still_masked = (ys == self.mask_id) & valid
            n_still = jnp.sum(still_masked, axis=1)  # [B]
            k = jnp.minimum(
                jnp.maximum(-(-n_masked0 // n_iterations), 1), n_still)
            # Per-row confidence threshold over MASKED positions only: the
            # k-th largest masked confidence (sentinel -1 never selected).
            scores = jnp.where(still_masked, pconf, -1.0)
            sorted_desc = -jnp.sort(-scores, axis=1)
            kth = jnp.take_along_axis(
                sorted_desc, jnp.maximum(k - 1, 0)[:, None], axis=1)
            fill = still_masked & (scores >= kth) & (k > 0)[:, None]
            ys = jnp.where(fill, pred, ys)
        # Final pass: fill any remaining masks.
        logits = self.asr.decoder(ys, lengths_j, hs, h_lengths, causal=False)
        pred = jnp.argmax(logits, -1)
        ys = jnp.where((ys == self.mask_id) & valid, pred, ys)
        return jnp.where(valid, ys, c.blank_id), lengths_j
