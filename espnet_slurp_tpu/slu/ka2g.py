"""KA2G end-to-end model: speech encoder + CTC transcript loss + slot-value
generator with ontology-forest TCPGen.

Parity target: reference espnet/nets/pytorch_backend/e2e_asr.py:364-582 —
the fork's composite loss alpha*CTC + (1-alpha)*att + slotfactor*SLU where
the SLU term is SLUGenNet's slot classification + ontology-constrained
value generation (KB_utils/SLU.py:658-1346, per-slot TCPGen over ontology
trees at :981-1130). TPU redesign: one encoder pass feeds BOTH the CTC
lattice and the slot generator (the reference also shares the encoder);
the per-slot ontology tries are one flat forest (slu/generator.py
build_ontology_forest) and all slots of all utterances decode as one
[B*n_slots] batch.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..models.asr_model import ASRConfig, ASRModel
from .generator import SlotGenConfig, SlotGenerator


@dataclasses.dataclass(frozen=True)
class KA2GConfig:
    asr: ASRConfig = ASRConfig()
    gen: SlotGenConfig = SlotGenConfig()
    # composite loss: ctc_weight * CTC(transcript) + slot_factor * SLU
    # (e2e_asr.py:569-576 loss mixing; att branch optional via asr cfg)
    slot_factor: float = 1.0


class KA2GModel(nn.Module):
    cfg: KA2GConfig

    def setup(self):
        self.asr = ASRModel(self.cfg.asr, name="asr")
        self.slotgen = SlotGenerator(self.cfg.gen, name="slotgen")

    def encode(self, speech, speech_lengths, train=False, specaug_rng=None,
               mvn_stats=None):
        hs, h_lengths, _ = self.asr.encode(speech, speech_lengths,
                                           train=train,
                                           specaug_rng=specaug_rng,
                                           mvn_stats=mvn_stats)
        mask = (jnp.arange(hs.shape[1])[None, :]
                < h_lengths[:, None])
        return hs, h_lengths, mask

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 slot_present, values, value_lengths, *,
                 trie_token=None, trie_children_tok=None,
                 trie_children_node=None, trie_n_children=None,
                 node=None, p_gen_mask=None,
                 train=False, specaug_rng=None, mvn_stats=None):
        """(loss, stats). text = transcript tokens (CTC target); the slot
        streams mirror SlotGenerator.__call__; trie_* is the static
        ontology forest + host-precomputed walk_forest results."""
        c = self.cfg
        hs, h_lengths, mask = self.encode(speech, speech_lengths,
                                          train=train,
                                          specaug_rng=specaug_rng,
                                          mvn_stats=mvn_stats)
        loss_ctc = self.asr._ctc_loss_mean(hs, h_lengths, text, text_lengths)
        trie = None
        if trie_token is not None:
            trie = {"trie_token": trie_token,
                    "trie_children_tok": trie_children_tok,
                    "trie_children_node": trie_children_node,
                    "trie_n_children": trie_n_children}
        loss_slu, stats = self.slotgen(hs, mask, slot_present, values,
                                       value_lengths, trie=trie, node=node,
                                       p_gen_mask=p_gen_mask)
        loss = c.asr.ctc_weight * loss_ctc + c.slot_factor * loss_slu
        stats = dict(stats)
        stats["loss_ctc"] = loss_ctc
        stats["loss"] = loss
        # acc drives n-best selection symmetry with ASR configs
        stats["acc"] = stats.get("slot_acc", 0.0)
        return loss, stats

    def generate(self, speech, speech_lengths, *, trie=None, roots=None,
                 boundary_mask=None, dead=None, mvn_stats=None):
        """Greedy slot classification + value generation (inference)."""
        hs, _, mask = self.encode(speech, speech_lengths,
                                  mvn_stats=mvn_stats)
        return self.slotgen.generate(hs, mask, trie=trie, roots=roots,
                                     boundary_mask=boundary_mask, dead=dead)
