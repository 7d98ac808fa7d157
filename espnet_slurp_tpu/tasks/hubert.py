"""HuBERT SSL pretraining task.

Parity target: reference espnet2/tasks/hubert.py (HubertTask, 398 LoC:
masked cluster-prediction over k-means pseudo-labels). Data dir: wav.scp +
``km`` (text_int frame pseudo-labels at the encoder frame rate, the
reference's kmeans label files).
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..data.dataset import SpeechDataset
from ..models.hubert import HubertConfig, HubertModel
from ..train.optim import OptimConfig
from ..train.state import TrainState
from .generic import (RunOptions, load_config, run_training,
                      simple_iter_factory)

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass(frozen=True)
class HubertTaskConfig:
    exp_dir: str = "exp/hubert"
    model: HubertConfig = HubertConfig()
    optim: OptimConfig = OptimConfig(lr=1e-3, scheduler="constant")
    run: RunOptions = RunOptions()
    train_dir: str = ""
    valid_dir: str = ""
    batch_size: int = 8
    speech_bucket_multiple: int = 4096


def load_hubert_config(path=None, overrides=None) -> HubertTaskConfig:
    return load_config(HubertTaskConfig, path, overrides)


class HubertTask:
    @staticmethod
    def build_dataset(data_dir: str) -> SpeechDataset:
        return SpeechDataset(
            [(str(Path(data_dir) / "wav.scp"), "speech", "sound"),
             (str(Path(data_dir) / "km"), "cluster_ids", "text_int")])

    @staticmethod
    def batch_adapter(uids, coll):
        return {
            "speech": coll["speech"].astype(np.float32),
            "speech_lengths": coll["speech_lengths"],
            "cluster_ids": np.maximum(coll["cluster_ids"],
                                      0).astype(np.int32),
        }

    @classmethod
    def train(cls, cfg: HubertTaskConfig, mesh=None) -> TrainState:
        model = HubertModel(cfg.model)
        buckets = {"speech": cfg.speech_bucket_multiple}
        mk = lambda d, sh: simple_iter_factory(
            cls.build_dataset(d), cls.batch_adapter, cfg.batch_size,
            cfg.run.seed, sh, buckets)
        batch0 = next(iter(mk(cfg.train_dir, False)(1)))

        def init_fn(rng):
            return model.init(rng, **batch0,
                              mask_rng=jax.random.PRNGKey(0))["params"]

        def train_apply(params, batch, dropout_rng, specaug_rng):
            return model.apply({"params": params}, train=True,
                               mask_rng=specaug_rng,
                               rngs={"dropout": dropout_rng}, **batch)

        def eval_apply(params, batch):
            return model.apply({"params": params}, train=False,
                               mask_rng=jax.random.PRNGKey(0), **batch)

        return run_training(
            exp_dir=cfg.exp_dir, model=model, init_fn=init_fn,
            train_factory=mk(cfg.train_dir, True),
            valid_factory=mk(cfg.valid_dir, False),
            optim=cfg.optim, run=cfg.run, train_apply=train_apply,
            eval_apply=eval_apply, mesh=mesh, resolved_cfg=cfg)
