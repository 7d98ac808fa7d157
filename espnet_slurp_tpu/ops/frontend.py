"""Default acoustic frontend: STFT -> power spectrum -> log-mel.

Parity target: reference espnet2/asr/frontend/default.py:17-131 (DefaultFrontend:
Stft -> power -> LogMel, 80-dim). The whole chain is one jittable function —
framing gather, basis matmul, square, mel matmul, log — which XLA fuses into a
couple of kernels; it runs in fp32 (the reference forces fp32 for the frontend
too, espnet2/asr/espnet_model.py:328).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from . import stft as stft_mod
from .mel import logmel


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    fs: int = 16000
    n_fft: int = 512
    win_length: int | None = None
    hop_length: int = 128
    window: str = "hann"
    center: bool = True
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None
    htk: bool = False


def default_frontend(
    speech: jnp.ndarray,
    speech_lengths: jnp.ndarray,
    cfg: FrontendConfig = FrontendConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, N] waveform -> ([B, T, n_mels] log-mel fp32, [B] frame lengths)."""
    speech = speech.astype(jnp.float32)
    spec = stft_mod.stft(
        speech, n_fft=cfg.n_fft, win_length=cfg.win_length,
        hop_length=cfg.hop_length, window=cfg.window, center=cfg.center,
    )  # (B, T, bins, 2)
    feat_lengths = stft_mod.stft_out_lengths(
        speech_lengths, n_fft=cfg.n_fft, hop=cfg.hop_length, center=cfg.center)
    power = spec[..., 0] ** 2 + spec[..., 1] ** 2  # (B, T, bins)
    feats = logmel(
        power, feat_lengths, fs=cfg.fs, n_fft=cfg.n_fft, n_mels=cfg.n_mels,
        fmin=cfg.fmin, fmax=cfg.fmax, htk=cfg.htk,
    )
    return feats, feat_lengths
