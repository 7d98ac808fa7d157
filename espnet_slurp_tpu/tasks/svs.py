"""Singing voice synthesis task (XiaoiceSing / NaiveRNN-DP family).

Parity target: reference espnet2/tasks/svs.py (SVSTask, 449 LoC) and
espnet2/bin/svs_inference.py (SingingGenerate). Data dir convention:
wav.scp (singing waveform) + score streams as int-sequence files of equal
per-utterance length: label (phone ids), midi (note ids), tempo (beat ids)
and duration (frames per phone — the reference recipes' `ds` stream from
score_feats_extract.py). Mel targets are extracted in-model from the
waveform (on-the-fly-target design shared with the TTS/diar tasks).
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SpeechDataset
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig
from ..train.state import TrainState
from ..tts.svs import SVSConfig, XiaoiceSing
from .generic import (RunOptions, load_config, run_training,
                      simple_iter_factory)

log = logging.getLogger("espnet_slurp_tpu")

_SCORE_STREAMS = ("label", "midi", "tempo", "duration")


@dataclasses.dataclass(frozen=True)
class SVSTaskConfig:
    exp_dir: str = "exp/svs"
    model: SVSConfig = SVSConfig()
    optim: OptimConfig = OptimConfig(lr=1e-3, scheduler="constant")
    run: RunOptions = RunOptions()
    train_dir: str = ""
    valid_dir: str = ""
    batch_size: int = 8
    speech_bucket_multiple: int = 4096
    score_bucket_multiple: int = 16


def load_svs_config(path=None, overrides=None) -> SVSTaskConfig:
    return load_config(SVSTaskConfig, path, overrides)


class SVSTask:
    @staticmethod
    def build_dataset(data_dir: str) -> SpeechDataset:
        d = Path(data_dir)
        streams = [(str(d / "wav.scp"), "speech", "sound")]
        for name in _SCORE_STREAMS:
            streams.append((str(d / f"{name}.scp"), name, "text_int"))
        return SpeechDataset(streams)

    @staticmethod
    def batch_adapter(uids, coll):
        out = {
            "speech": coll["speech"].astype(np.float32),
            "speech_lengths": coll["speech_lengths"],
            "label": np.maximum(coll["label"], 0).astype(np.int32),
            "label_lengths": coll["label_lengths"],
            "midi": np.maximum(coll["midi"], 0).astype(np.int32),
            "tempo": np.maximum(coll["tempo"], 0).astype(np.int32),
            "durations": np.maximum(coll["duration"], 0).astype(np.int32),
        }
        return out

    @classmethod
    def train(cls, cfg: SVSTaskConfig, mesh=None) -> TrainState:
        model = XiaoiceSing(cfg.model)
        buckets = {"speech": cfg.speech_bucket_multiple}
        for name in _SCORE_STREAMS:
            buckets[name] = cfg.score_bucket_multiple
        mk = lambda d, sh: simple_iter_factory(
            cls.build_dataset(d), cls.batch_adapter, cfg.batch_size,
            cfg.run.seed, sh, buckets)
        batch0 = next(iter(mk(cfg.train_dir, False)(1)))

        def init_fn(rng):
            return model.init(rng, **batch0)["params"]

        def train_apply(params, batch, dropout_rng, specaug_rng):
            return model.apply({"params": params}, train=True,
                               rngs={"dropout": dropout_rng}, **batch)

        def eval_apply(params, batch):
            return model.apply({"params": params}, **batch)

        return run_training(
            exp_dir=cfg.exp_dir, model=model, init_fn=init_fn,
            train_factory=mk(cfg.train_dir, True),
            valid_factory=mk(cfg.valid_dir, False),
            optim=cfg.optim, run=cfg.run, train_apply=train_apply,
            eval_apply=eval_apply, mesh=mesh, resolved_cfg=cfg)


class SingingGenerate:
    """Inference wrapper (svs_inference.py SingingGenerate analogue):
    score streams -> (mel [F, n_mels], waveform via Griffin-Lim)."""

    def __init__(self, exp_dir: str, ckpt_name: Optional[str] = None,
                 speed: float = 1.0):
        exp = Path(exp_dir)
        self.cfg = load_svs_config(exp / "config.yaml")
        self.model = XiaoiceSing(self.cfg.model)
        mgr = CheckpointManager(exp, self.cfg.run.keep_nbest)
        if ckpt_name is None:
            ckpt_name = f"{mgr.latest_epoch()}epoch"
        self.params = mgr.load_params(ckpt_name)
        self.speed = speed
        self._jit = jax.jit(lambda p, la, ll, mi, te: self.model.apply(
            {"params": p}, la, ll, mi, te, self.speed,
            method=lambda m, a, b, c, d, s: m.inference(a, b, c, d, s)))

    def __call__(self, label: np.ndarray, midi: np.ndarray,
                 tempo: np.ndarray):
        """Equal-length 1-D int score streams -> (mel [F, n_mels],
        wav [N] float32 via Griffin-Lim)."""
        from ..data.sampler import bucket_length
        from ..tts.vocoder import griffin_lim
        n = bucket_length(len(label), self.cfg.score_bucket_multiple)

        def pad(x):
            buf = np.zeros((1, n), np.int32)
            buf[0, :len(x)] = np.asarray(x, np.int32)
            return jnp.asarray(buf)

        mel, flens = self._jit(self.params, pad(label),
                               jnp.asarray([len(label)], jnp.int32),
                               pad(midi), pad(tempo))
        mel = np.asarray(mel)[0][: int(flens[0])]
        fc = self.cfg.model.frontend
        wav = None
        if mel.shape[0] > 0:
            wav = np.asarray(griffin_lim(
                jnp.asarray(mel[None]), n_iter=16, fs=fc.fs,
                n_fft=fc.n_fft, hop=fc.hop_length, n_mels=fc.n_mels))[0]
        return mel, wav
