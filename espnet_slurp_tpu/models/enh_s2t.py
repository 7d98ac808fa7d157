"""Joint enhancement + speech-to-text (Enh+ASR).

Parity target: reference espnet2/enh/espnet_enh_s2t_model.py:29-420
(ESPnetEnhS2TModel: enh front-end separates/enhances, the S2T model
consumes the estimated waveforms; optional enh loss; bypass_enh_prob) and
espnet2/tasks/enh_s2t.py (563 LoC task wiring).

TPU redesign notes:
- The separated streams are one batched [B*S] ASR forward — speaker
  streams fold into the batch axis instead of a python loop per speaker.
- Permutation: with references and calc_enh_loss, the SI-SNR PIT solve
  yields the best permutation per example (espnet_enh_s2t_model.py:61
  'permutation handled by the Enh loss'); estimates are aligned to the
  reference order with one inverse-permutation gather before ASR.
- bypass_enh_prob draws one in-jit Bernoulli per example and selects the
  mixture instead of the estimate with a jnp.where — no host branching.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..enh.losses import pit_wrapper, si_snr_loss
from ..enh.model import EnhConfig, EnhModel
from .asr_model import ASRConfig, ASRModel


@dataclasses.dataclass(frozen=True)
class EnhS2TConfig:
    enh: EnhConfig = EnhConfig(n_spk=2)
    asr: ASRConfig = ASRConfig()
    calc_enh_loss: bool = True
    enh_weight: float = 0.2       # relative weight of the SI-SNR loss
    bypass_enh_prob: float = 0.0  # espnet_enh_s2t_model.py:37


class EnhS2TModel(nn.Module):
    cfg: EnhS2TConfig

    def setup(self):
        self.enh = EnhModel(self.cfg.enh, name="enh")
        self.asr = ASRModel(self.cfg.asr, name="s2t")

    def separate(self, speech_mix, speech_mix_lengths):
        return self.enh.separate(speech_mix, speech_mix_lengths)

    def __call__(self, speech_mix, speech_mix_lengths, speech_ref=None, *,
                 train=False, specaug_rng=None, **text_streams):
        """text_streams: text_spk{n} / text_spk{n}_lengths (n = 1..n_spk).

        speech_ref: optional [B, n_spk, N] clean references (enables the
        SI-SNR PIT loss and reference-order alignment).
        """
        c = self.cfg
        n_spk = c.enh.n_spk
        est, _ = self.enh.separate(speech_mix, speech_mix_lengths)
        b = est.shape[0]
        n = est.shape[-1]
        est_lengths = jnp.minimum(speech_mix_lengths, n)
        stats: Dict[str, jnp.ndarray] = {}
        loss = 0.0

        if speech_ref is not None and c.calc_enh_loss:
            ref = speech_ref[..., :n]
            loss_b, best = pit_wrapper(
                lambda e, r: si_snr_loss(e, r, est_lengths), est, ref)
            enh_loss = jnp.mean(loss_b)
            # align est to reference order: est stream i carries ref
            # stream perm[i], so ref slot p takes est stream inv_perm[p]
            perms = jnp.asarray(
                list(itertools.permutations(range(n_spk))), jnp.int32)
            inv = jnp.argsort(perms[best], axis=1)           # [B, S]
            est = jnp.take_along_axis(est, inv[..., None], axis=1)
            loss = loss + c.enh_weight * enh_loss
            stats["enh_loss"] = enh_loss
            stats["si_snr"] = -enh_loss

        if train and c.bypass_enh_prob > 0:
            byp = jax.random.bernoulli(self.make_rng("bypass"),
                                       c.bypass_enh_prob, (b,))
            mix = jnp.broadcast_to(speech_mix[:, None, :n], est.shape)
            est = jnp.where(byp[:, None, None], mix, est)

        # Fold speaker streams into the batch for ONE ASR forward.
        texts = [text_streams[f"text_spk{s+1}"] for s in range(n_spk)]
        tlens = [text_streams[f"text_spk{s+1}_lengths"]
                 for s in range(n_spk)]
        u = max(t.shape[1] for t in texts)
        texts = [jnp.pad(t, ((0, 0), (0, u - t.shape[1]))) for t in texts]
        speech_f = est.reshape(b * n_spk, n)
        lens_f = jnp.repeat(est_lengths[:, None], n_spk, 1).reshape(-1)
        text_f = jnp.stack(texts, 1).reshape(b * n_spk, u)
        tlen_f = jnp.stack(tlens, 1).reshape(b * n_spk)
        asr_loss, asr_stats = self.asr(
            speech_f, lens_f, text_f, tlen_f, train=train,
            specaug_rng=specaug_rng)
        loss = loss + asr_loss
        for k, v in asr_stats.items():
            stats[f"asr_{k}"] = v
        stats["loss"] = loss
        return loss, stats
