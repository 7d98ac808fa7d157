"""Speaker diarization task (EEND-style).

Parity target: reference espnet2/tasks/diar.py (DiarizationTask, 301 LoC)
and espnet2/bin/diar_inference.py (DiarizeSpeech). Data dir: wav.scp +
either espnet2-style RTTM (``rttm``) or precomputed frame labels
(``labels.scp`` -> npy [T', n_spk]).
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import SpeechDataset
from ..models.diar import DiarConfig, DiarModel
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig
from ..train.state import TrainState
from .generic import (RunOptions, load_config, run_training,
                      simple_iter_factory)

log = logging.getLogger("espnet_slurp_tpu")


def read_rttm(path: str | Path) -> Dict[str, list]:
    """SPEAKER lines -> {uttid: [(spk, start_s, dur_s), ...]}
    (espnet2/fileio/rttm.py analogue)."""
    out: Dict[str, list] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "SPEAKER":
                continue
            uid, start, dur, spk = parts[1], float(parts[3]), \
                float(parts[4]), parts[7]
            out.setdefault(uid, []).append((spk, start, dur))
    return out


def rttm_to_frame_labels(segs, n_spk: int, n_frames: int,
                         frame_shift_s: float) -> np.ndarray:
    """[(spk, start, dur)] -> [T, n_spk] 0/1 activity (speakers ordered by
    first appearance)."""
    spk_order: Dict[str, int] = {}
    lab = np.zeros((n_frames, n_spk), np.float32)
    for spk, start, dur in segs:
        if spk not in spk_order:
            if len(spk_order) >= n_spk:
                continue
            spk_order[spk] = len(spk_order)
        a = int(start / frame_shift_s)
        b = min(int((start + dur) / frame_shift_s) + 1, n_frames)
        lab[a:b, spk_order[spk]] = 1.0
    return lab


@dataclasses.dataclass(frozen=True)
class DiarTaskConfig:
    exp_dir: str = "exp/diar"
    model: DiarConfig = DiarConfig()
    optim: OptimConfig = OptimConfig(lr=1e-3, scheduler="constant")
    run: RunOptions = RunOptions()
    train_dir: str = ""
    valid_dir: str = ""
    batch_size: int = 8
    speech_bucket_multiple: int = 4096


def load_diar_config(path=None, overrides=None) -> DiarTaskConfig:
    return load_config(DiarTaskConfig, path, overrides)


class DiarTask:
    @staticmethod
    def build_dataset(data_dir: str) -> SpeechDataset:
        streams = [(str(Path(data_dir) / "wav.scp"), "speech", "sound"),
                   (str(Path(data_dir) / "labels.scp"), "spk_labels", "npy")]
        return SpeechDataset(streams)

    @staticmethod
    def batch_adapter(uids, coll):
        return {
            "speech": coll["speech"].astype(np.float32),
            "speech_lengths": coll["speech_lengths"],
            "spk_labels": np.maximum(coll["spk_labels"],
                                     0).astype(np.float32),
        }

    @classmethod
    def train(cls, cfg: DiarTaskConfig, mesh=None) -> TrainState:
        model = DiarModel(cfg.model)
        buckets = {"speech": cfg.speech_bucket_multiple}
        mk = lambda d, sh: simple_iter_factory(
            cls.build_dataset(d), cls.batch_adapter, cfg.batch_size,
            cfg.run.seed, sh, buckets)
        batch0 = next(iter(mk(cfg.train_dir, False)(1)))

        def init_fn(rng):
            return model.init(rng, **batch0)["params"]

        def train_apply(params, batch, dropout_rng, specaug_rng):
            return model.apply(
                {"params": params}, train=True,
                rngs={"dropout": dropout_rng,
                      "shuffle": jax.random.fold_in(dropout_rng, 1)},
                **batch)

        def eval_apply(params, batch):
            return model.apply({"params": params}, **batch)

        return run_training(
            exp_dir=cfg.exp_dir, model=model, init_fn=init_fn,
            train_factory=mk(cfg.train_dir, True),
            valid_factory=mk(cfg.valid_dir, False),
            optim=cfg.optim, run=cfg.run, train_apply=train_apply,
            eval_apply=eval_apply, mesh=mesh, resolved_cfg=cfg)


class DiarizeSpeech:
    """Inference (diar_inference.py analogue): frame activity posteriors."""

    def __init__(self, exp_dir: str, ckpt_name: Optional[str] = None,
                 threshold: float = 0.5):
        exp = Path(exp_dir)
        self.cfg = load_diar_config(exp / "config.yaml")
        self.model = DiarModel(self.cfg.model)
        mgr = CheckpointManager(exp, self.cfg.run.keep_nbest)
        if ckpt_name is None:
            ckpt_name = f"{mgr.latest_epoch()}epoch"
        self.params = mgr.load_params(ckpt_name)
        self.threshold = threshold
        self._jit = jax.jit(lambda p, x, ln: self.model.apply(
            {"params": p}, x, ln, threshold,
            method=lambda m, x, ln, th: m.estimate_activity(x, ln, th)))

    def __call__(self, wav: np.ndarray):
        """[N] -> (posteriors [T', n_spk], decisions [T', n_spk] bool).

        With attractors, posteriors for non-existent speakers (EDA
        existence < threshold) are zeroed before thresholding."""
        from ..data.sampler import bucket_length
        n = bucket_length(len(wav), self.cfg.speech_bucket_multiple)
        buf = np.zeros((1, n), np.float32)
        buf[0, :len(wav)] = wav
        probs, flens, _ = self._jit(self.params, jnp.asarray(buf),
                                    jnp.asarray([len(wav)], jnp.int32))
        post = np.asarray(probs)[0][: int(flens[0])]
        return post, post > self.threshold
