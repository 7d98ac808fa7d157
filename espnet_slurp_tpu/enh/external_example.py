"""Example bring-your-own separator for EnhConfig(separator="external").

Demonstrates the plugin contract of enh/model.py:_separate_external (the
TPU-native analogue of the reference's asteroid bridge,
espnet2/enh/separator/asteroid_models.py:11-67): any importable flax
nn.Module class with the signature

    Class(n_spk=..., **external_kwargs)
    __call__(speech_mix [B, N], speech_lengths [B])
        -> (est [B, n_spk, N'], lengths [B])

plugs into the enh task by dotted path
(external_path="espnet_slurp_tpu.enh.external_example:LearnedGainSeparator")
and is trained/jitted/checkpointed natively — no per-model wrapper class.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LearnedGainSeparator(nn.Module):
    """Minimal valid external separator: a per-speaker learned FIR + gain.

    Not a serious model — it exists to pin the plugin contract (shape and
    lengths semantics) in tests and to serve as the template users copy.
    """
    n_spk: int = 2
    taps: int = 9

    @nn.compact
    def __call__(self, speech_mix, speech_lengths):
        b, n = speech_mix.shape
        x = speech_mix[:, :, None]  # [B, N, 1]
        y = nn.Conv(self.n_spk, (self.taps,), padding="SAME",
                    name="fir")(x)  # [B, N, n_spk]
        gain = self.param("gain", nn.initializers.ones, (self.n_spk,))
        est = jnp.moveaxis(y, 2, 1) * gain[None, :, None]  # [B, S, N]
        return est, speech_lengths
