"""Acoustic frontend family: log-mel (default), sliding-window, fused.

Parity target: reference espnet2/asr/frontend/default.py:17-131 (DefaultFrontend:
Stft -> power -> LogMel, 80-dim), windowing.py (SlidingWindow raw frames) and
fused.py (FusedFrontends feature concat). The whole chain is one jittable
function — framing gather, basis matmul, square, mel matmul, log — which XLA
fuses into a couple of kernels; it runs in fp32 (the reference forces fp32 for
the frontend too, espnet2/asr/espnet_model.py:328).

The reference's S3prlFrontend (external SSL feature extractor) maps to the
in-framework SSL path instead: ASRConfig(encoder="wav2vec2") consumes the raw
waveform through models/wav2vec2.py (with HF weight import), which is the
TPU-native equivalent of S3PRL-as-frontend.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import stft as stft_mod
from .mel import logmel


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    # "default" (log-mel) | "sliding_window" (raw frames) | "fused"
    # (log-mel ++ sliding-window features, frame-aligned by shared hop).
    type: str = "default"
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
    # Append regression delta features (espnet/transform/add_deltas.py):
    # 0 = off, 1 = +Δ, 2 = +Δ+ΔΔ. Feature dim becomes n_mels*(1+order).
    delta_order: int = 0
    delta_window: int = 2


def default_frontend(
    speech: jnp.ndarray,
    speech_lengths: jnp.ndarray,
    cfg: FrontendConfig = FrontendConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, N] waveform -> ([B, T, n_mels] log-mel fp32, [B] frame lengths).

    int16 input is accepted as raw PCM and scaled in-graph — halving
    host->device transfer bytes (the input pipeline ships the wav's native
    samples; the reference's soundfile path converts on the host)."""
    if speech.dtype == jnp.int16:
        speech = speech.astype(jnp.float32) * (1.0 / 32768.0)
    speech = speech.astype(jnp.float32)
    if cfg.type == "sliding_window":
        return sliding_window_frontend(speech, speech_lengths, cfg)
    if cfg.type == "fused":
        return fused_frontend(speech, speech_lengths, cfg)
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
    if cfg.delta_order > 0:
        feats = add_deltas(feats, order=cfg.delta_order,
                           window=cfg.delta_window, ilens=feat_lengths)
    return feats, feat_lengths


def delta_features(feats: jnp.ndarray, window: int = 2,
                   ilens: jnp.ndarray | None = None) -> jnp.ndarray:
    """Regression deltas (espnet/transform/add_deltas.py:delta — Kaldi
    formula): d_t = sum_n n*(f_{t+n} - f_{t-n}) / (2 sum n^2) with
    PER-UTTERANCE edge replication (the reference pads each utterance with
    mode='edge'; clipping at the padded batch edge would difference the
    last valid frames against zero padding). [B, T, F] -> [B, T, F]."""
    denom = 2.0 * sum(n * n for n in range(1, window + 1))
    t = feats.shape[1]
    ar = jnp.arange(t)
    if ilens is None:
        last = jnp.full((feats.shape[0], 1), t - 1)
    else:
        last = (jnp.maximum(ilens, 1) - 1)[:, None]       # [B, 1]
    out = jnp.zeros_like(feats)
    for n in range(1, window + 1):
        idx_p = jnp.minimum(ar[None, :] + n, last)        # [B, T]
        idx_m = jnp.maximum(ar[None, :] - n, 0)
        idx_m = jnp.minimum(idx_m, last)
        f_p = jnp.take_along_axis(feats, idx_p[..., None], axis=1)
        f_m = jnp.take_along_axis(
            feats, jnp.broadcast_to(idx_m, idx_p.shape)[..., None], axis=1)
        out = out + n * (f_p - f_m)
    return out / denom


def add_deltas(feats: jnp.ndarray, order: int = 2, window: int = 2,
               ilens: jnp.ndarray | None = None) -> jnp.ndarray:
    """[B, T, F] -> [B, T, F*(1+order)]: base ++ Δ ++ ΔΔ ..."""
    outs = [feats]
    for _ in range(order):
        outs.append(delta_features(outs[-1], window, ilens=ilens))
    return jnp.concatenate(outs, axis=-1)


def sliding_window_frontend(
    speech: jnp.ndarray,
    speech_lengths: jnp.ndarray,
    cfg: FrontendConfig = FrontendConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw windowed frames (espnet2/asr/frontend/windowing.py SlidingWindow).

    [B, N] waveform -> ([B, T, win_length] raw frames, [B] frame lengths).
    Uses the same center-padding + frame count math as the STFT path so a
    sliding-window model sees identical time resolution to the log-mel one.
    """
    speech = speech.astype(jnp.float32)
    win = cfg.win_length or cfg.n_fft
    if cfg.center:
        pad = cfg.n_fft // 2
        speech = jnp.pad(speech, ((0, 0), (pad, pad)))
    # Same framing geometry as stft(): n_fft-wide frames, centered win slice,
    # so T and per-example lengths match the log-mel path exactly.
    frames = stft_mod.frame_signal(speech, cfg.n_fft, cfg.hop_length)
    off = (cfg.n_fft - win) // 2
    frames = jax.lax.dynamic_slice_in_dim(frames, off, win, axis=-1)
    feat_lengths = stft_mod.stft_out_lengths(
        speech_lengths, n_fft=cfg.n_fft, hop=cfg.hop_length, center=cfg.center)
    return frames, feat_lengths


def fused_frontend(
    speech: jnp.ndarray,
    speech_lengths: jnp.ndarray,
    cfg: FrontendConfig = FrontendConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Feature-concat of log-mel + raw sliding-window frames.

    espnet2/asr/frontend/fused.py FusedFrontends analogue: both branches
    share hop/window geometry so their frame axes align exactly and the
    fusion is a plain concat on the feature axis (the reference aligns with
    a learned projection; geometry-sharing makes that unnecessary here).
    """
    mel_cfg = dataclasses.replace(cfg, type="default")
    mels, feat_lengths = default_frontend(speech, speech_lengths, mel_cfg)
    raw, _ = sliding_window_frontend(speech, speech_lengths, cfg)
    t = min(mels.shape[1], raw.shape[1])
    return jnp.concatenate([mels[:, :t], raw[:, :t]], axis=-1), feat_lengths
