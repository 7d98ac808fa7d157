"""espnet_slurp_tpu — a TPU-native end-to-end speech framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference `BriansIDP/espnet_slurp` (ESPnet fork with TCPGen/KA2G contextual
biasing for SLURP SLU).  Layer map mirrors SURVEY.md §1:

- ``ops``      — DSP + loss kernels (STFT/fbank, SpecAug, CTC, transducer).
- ``models``   — Conformer/Transformer/RNN encoders & decoders, LM, SLU, TCPGen.
- ``train``    — TrainState, jitted train step, reporter, checkpointing.
- ``data``     — manifests, tokenizers, bucketed samplers, collation.
- ``parallel`` — mesh construction + sharding rules (DP/TP over ICI/DCN).
- ``decode``   — greedy / batched beam search as lax.while_loop.
- ``tasks``    — config-driven task factories (ASR, SLU, LM, ...).
- ``bin``      — CLI entry points.
"""

__version__ = "0.1.0"
