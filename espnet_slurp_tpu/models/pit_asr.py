"""Permutation-invariant multi-speaker ASR.

Parity target: reference espnet2/asr/pit_espnet_model.py (PITLossWrapper +
multi-output ESPnetASRModel): a mixture waveform is encoded into one stream
per speaker; a CTC pass over all (reference, stream) pairs picks the best
speaker permutation per example; the hybrid CTC/attention loss is then
computed on the permuted streams.

TPU design notes (vs the reference's python loops over permutations):
- The shared trunk is the standard Conformer encoder; per-speaker streams
  come from small self-attention branch stacks on top (the reference uses
  multi-output RNN encoders).
- The pair-loss matrix [B, N, N] is built from N*N fixed-shape CTC calls
  unrolled at trace time (N <= 4), all batched over B; the permutation
  argmin and the stream gather are pure tensor ops, so the whole forward
  (including the permutation solve) stays inside one jitted train step.
- The permutation-solving CTC pass is under stop_gradient, mirroring the
  reference's "CTC computed twice" structure (pit_espnet_model.py:256-272).
"""
from __future__ import annotations

import itertools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import ctc as ctc_ops
from ..ops.masks import attention_bias, length_mask
from .asr_model import (ASRConfig, ASRModel, add_sos_eos,
                        label_smoothing_loss)
from .attention import MultiHeadAttention


class SpeakerBranch(nn.Module):
    """Small post-encoder self-attention stack producing one speaker's
    stream from the shared trunk output (abs-pos, pre-LN)."""
    d_model: int
    n_head: int
    d_ff: int
    num_blocks: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        pad = length_mask(lengths, x.shape[1])
        bias = attention_bias(pad[:, None, None, :])
        for i in range(self.num_blocks):
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm1_{i}")(x)
            x = x + MultiHeadAttention(
                self.n_head, self.d_model, self.dropout_rate, self.dtype,
                name=f"self_attn_{i}")(h, h, h, bias, deterministic)
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm2_{i}")(x)
            h = nn.Dense(self.d_ff, dtype=self.dtype, name=f"ff1_{i}")(h)
            h = nn.relu(h)
            x = x + nn.Dense(self.d_model, dtype=self.dtype,
                             name=f"ff2_{i}")(h)
        x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        return jnp.where(pad[..., None], x, 0.0)


class PITASRModel(nn.Module):
    """Multi-speaker hybrid CTC/attention model with PIT (num_ref >= 2).

    Batch keys: speech, speech_lengths, text/text_lengths (speaker 1) and
    text_spk{n}/text_spk{n}_lengths for n = 2..num_ref, mirroring the
    reference's data layout (pit_espnet_model.py:221-227).
    """
    cfg: ASRConfig

    def setup(self):
        c = self.cfg
        assert c.num_ref >= 2, "PITASRModel needs num_ref >= 2"
        assert c.moe_experts == 0, \
            "moe_experts > 0 is only supported by the plain ASR model " \
            "(the Switch aux loss is not wired into the PIT loss)"
        self.asr = ASRModel(c)
        self.branches = [
            SpeakerBranch(c.d_model, c.n_head, c.d_ff, c.pit_branch_blocks,
                          c.dropout_rate, c.jax_dtype, name=f"branch_{n}")
            for n in range(c.num_ref)]

    # ---------- encoding ----------

    def encode_streams(self, speech, speech_lengths, train=False,
                       specaug_rng=None, mvn_stats=None):
        """Mixture -> ([B, N, T', D] per-speaker streams, [B] lengths)."""
        hs, h_lengths, _ = self.asr.encode(
            speech, speech_lengths, train=train, specaug_rng=specaug_rng,
            mvn_stats=mvn_stats)
        streams = jnp.stack(
            [br(hs, h_lengths, deterministic=not train)
             for br in self.branches], axis=1)
        return streams, h_lengths

    def ctc_logprobs(self, hs):
        """Shared CTC head over one stream (decode path)."""
        return self.asr.ctc_logprobs(hs)

    # ---------- training ----------

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 train=False, specaug_rng=None, mvn_stats=None, **spk):
        c = self.cfg
        n = c.num_ref
        texts = [jnp.maximum(text, 0)]
        tlens = [text_lengths]
        u_max = text.shape[1]
        for k in range(2, n + 1):
            t_k = spk[f"text_spk{k}"]
            # pad all refs to a common label length
            if t_k.shape[1] < u_max:
                t_k = jnp.pad(t_k, ((0, 0), (0, u_max - t_k.shape[1])))
            elif t_k.shape[1] > u_max:
                u_max = t_k.shape[1]
                texts = [jnp.pad(t, ((0, 0), (0, u_max - t.shape[1])))
                         for t in texts]
            texts.append(jnp.maximum(t_k, 0))
            tlens.append(spk[f"text_spk{k}_lengths"])
        texts = jnp.stack(texts, axis=1)          # [B, N, U]
        tlens = jnp.stack(tlens, axis=1)          # [B, N]

        streams, h_lengths = self.encode_streams(
            speech, speech_lengths, train=train, specaug_rng=specaug_rng,
            mvn_stats=mvn_stats)                  # [B, N, T, D]
        b = streams.shape[0]

        # 1st CTC pass (no grad): pair losses decide the permutation.
        logits_all = self.asr.ctc_proj(streams)   # [B, N, T, V]
        solve_logits = jax.lax.stop_gradient(logits_all)
        pair = jnp.stack([
            jnp.stack([
                ctc_ops.ctc_loss_logits(
                    solve_logits[:, j], h_lengths, texts[:, i], tlens[:, i],
                    c.blank_id)
                for j in range(n)], axis=1)
            for i in range(n)], axis=1)           # [B, N_ref, N_inf]
        # Infeasible pairs return 0 by zero_infinity; make them expensive so
        # the permutation solve avoids them rather than preferring them.
        pair = jnp.where(pair == 0.0, 1e9, pair)

        perms = jnp.asarray(list(itertools.permutations(range(n))))  # [P, N]
        # pair[b, i, perms[p, i]] -> [B, P, N]: index arrays broadcast
        # (1, N) with (P, N) -> (P, N).
        perm_loss = jnp.mean(pair[:, jnp.arange(n)[None, :], perms],
                             axis=-1)             # [B, P]
        best = jnp.argmin(perm_loss, axis=1)      # [B]
        opt = perms[best]                         # [B, N] stream for ref i

        # Permute streams to reference order and flatten speakers into batch.
        streams_p = jnp.take_along_axis(
            streams, opt[:, :, None, None], axis=1)
        t_dim, d_dim = streams_p.shape[2], streams_p.shape[3]
        hs_f = streams_p.reshape(b * n, t_dim, d_dim)
        hl_f = jnp.broadcast_to(h_lengths[:, None], (b, n)).reshape(b * n)
        texts_f = texts.reshape(b * n, -1)
        tlens_f = tlens.reshape(b * n)

        stats: Dict[str, jnp.ndarray] = {}
        loss = 0.0
        if c.ctc_weight > 0.0:
            # 2nd CTC pass: the differentiable loss on permuted streams.
            loss_ctc = ctc_ops.ctc_loss_mean_logits(
                self.asr.ctc_proj(hs_f), hl_f, texts_f, tlens_f, c.blank_id)
            stats["loss_ctc"] = loss_ctc
            loss = loss + c.ctc_weight * loss_ctc
        if c.ctc_weight < 1.0:
            ys_in, ys_out = add_sos_eos(texts_f, tlens_f, c.sos_id, c.eos_id)
            logits = self.asr.decoder(ys_in, tlens_f + 1, hs_f, hl_f,
                                      deterministic=not train)
            loss_att, acc = label_smoothing_loss(logits, ys_out,
                                                 c.lsm_weight)
            stats["loss_att"] = loss_att
            stats["acc"] = acc
            loss = loss + (1.0 - c.ctc_weight) * loss_att
        stats["loss"] = loss
        return loss, stats
