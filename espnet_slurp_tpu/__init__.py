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

# Honor JAX_PLATFORMS even when a site-level PJRT plugin (e.g. a remote TPU
# tunnel) registers itself as the default backend after env processing:
# an explicit `JAX_PLATFORMS=cpu python -m espnet_slurp_tpu.bin...` must run
# on CPU, not silently dispatch to the remote accelerator.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# Persistent XLA compilation cache by default: on remote-compile TPU
# transports a cold full-model compile costs minutes; re-runs and resumed
# trainings must not pay it twice. Override/disable via the standard
# JAX_COMPILATION_CACHE_DIR env var (empty string disables).
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
