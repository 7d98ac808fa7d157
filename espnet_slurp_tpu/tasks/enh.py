"""Speech enhancement / separation task.

Parity target: reference espnet2/tasks/enh.py (EnhancementTask, 525 LoC:
encoder/separator/decoder choices + PIT criterion wiring) and
espnet2/bin/enh_inference.py (SeparateSpeech). Data-dir convention follows
the reference recipes: wav.scp = mixture, spk1.scp..spkN.scp = references.
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
from ..enh.model import EnhConfig, EnhModel
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig
from ..train.state import TrainState
from .generic import (RunOptions, load_config, run_training,
                      simple_iter_factory)

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass(frozen=True)
class EnhTaskConfig:
    exp_dir: str = "exp/enh"
    model: EnhConfig = EnhConfig()
    optim: OptimConfig = OptimConfig(lr=1e-3, scheduler="constant")
    run: RunOptions = RunOptions()
    train_dir: str = ""
    valid_dir: str = ""
    batch_size: int = 8
    speech_bucket_multiple: int = 4096
    # Dynamic mixing (tasks/enh.py:316-377 --dynamic_mixing): synthesize
    # training mixtures on the fly from the spk1.scp sources instead of a
    # premixed wav.scp. Validation always uses the premixed corpus.
    dynamic_mixing: bool = False
    dynamic_mixing_gain_db: float = 0.0
    utt2spk: str = ""  # speaker map so interferers come from other speakers


def load_enh_config(path=None, overrides=None) -> EnhTaskConfig:
    return load_config(EnhTaskConfig, path, overrides)


# separators consuming [B, T, C] multichannel mixtures
MULTICHANNEL_SEPARATORS = ("beamformer", "fasnet")


class EnhTask:
    @staticmethod
    def build_dataset(data_dir: str, n_spk: int,
                      multichannel: bool = False,
                      dynamic_mixing: bool = False,
                      dynamic_mixing_gain_db: float = 0.0,
                      utt2spk: str = "",
                      seed: int = 0) -> SpeechDataset:
        if dynamic_mixing:
            # only the source stream is read from disk; the mixture and
            # the other references are synthesized per __getitem__
            from ..enh.mixing import DynamicMixer
            src = str(Path(data_dir) / "spk1.scp")
            mixer = DynamicMixer(src, n_spk=n_spk,
                                 gain_db=dynamic_mixing_gain_db,
                                 utt2spk=utt2spk or None, seed=seed)
            return SpeechDataset([(src, "spk1", "sound")], preprocess=mixer)
        mix_type = "sound_mc" if multichannel else "sound"
        streams = [(str(Path(data_dir) / "wav.scp"), "speech_mix", mix_type)]
        for i in range(n_spk):
            streams.append((str(Path(data_dir) / f"spk{i+1}.scp"),
                            f"spk{i+1}", "sound"))
        return SpeechDataset(streams)

    @staticmethod
    def batch_adapter(n_spk: int):
        def adapt(uids, coll):
            refs = np.stack([coll[f"spk{i+1}"] for i in range(n_spk)], 1)
            n = min(coll["speech_mix"].shape[1], refs.shape[2])
            return {
                "speech_mix": coll["speech_mix"][:, :n].astype(np.float32),
                "speech_mix_lengths": np.minimum(
                    coll["speech_mix_lengths"], n),
                "speech_ref": refs[..., :n].astype(np.float32),
            }
        return adapt

    @classmethod
    def train(cls, cfg: EnhTaskConfig, mesh=None) -> TrainState:
        model = EnhModel(cfg.model)
        n_spk = cfg.model.n_spk
        adapt = cls.batch_adapter(n_spk)
        buckets = {"speech_mix": cfg.speech_bucket_multiple}
        mc = cfg.model.separator in MULTICHANNEL_SEPARATORS
        # dynamic mixing applies to training only (preprocessor.py:716-721
        # `if self.train`); validation scores against the premixed corpus
        mk = lambda d, sh, dyn=False: simple_iter_factory(
            cls.build_dataset(d, n_spk, mc, dynamic_mixing=dyn,
                              dynamic_mixing_gain_db=cfg.dynamic_mixing_gain_db,
                              utt2spk=cfg.utt2spk, seed=cfg.run.seed),
            adapt, cfg.batch_size, cfg.run.seed, sh, buckets)
        batch0 = next(iter(mk(cfg.train_dir, False,
                      dyn=cfg.dynamic_mixing)(1)))

        def init_fn(rng):
            return model.init(rng, **batch0)["params"]

        def train_apply(params, batch, dropout_rng, specaug_rng):
            return model.apply({"params": params}, train=True, **batch)

        def eval_apply(params, batch):
            return model.apply({"params": params}, **batch)

        return run_training(
            exp_dir=cfg.exp_dir, model=model, init_fn=init_fn,
            train_factory=mk(cfg.train_dir, True, dyn=cfg.dynamic_mixing),
            valid_factory=mk(cfg.valid_dir, False),
            optim=cfg.optim, run=cfg.run, train_apply=train_apply,
            eval_apply=eval_apply, mesh=mesh, resolved_cfg=cfg)


class SeparateSpeech:
    """Inference wrapper (enh_inference.py SeparateSpeech analogue)."""

    def __init__(self, exp_dir: str, ckpt_name: Optional[str] = None):
        exp = Path(exp_dir)
        self.cfg = load_enh_config(exp / "config.yaml")
        self.model = EnhModel(self.cfg.model)
        mgr = CheckpointManager(exp, self.cfg.run.keep_nbest)
        if ckpt_name is None:
            ckpt_name = f"{mgr.latest_epoch()}epoch"
        self.params = mgr.load_params(ckpt_name)
        self._jit = jax.jit(lambda p, x, ln: self.model.apply(
            {"params": p}, x, ln,
            method=lambda m, x, ln: m.separate(x, ln)))

    @property
    def multichannel(self) -> bool:
        return self.cfg.model.separator in MULTICHANNEL_SEPARATORS

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        """[N] (or [N, C] multichannel) mixture -> [n_spk, N'] estimates."""
        from ..data.sampler import bucket_length
        n = bucket_length(len(wav), self.cfg.speech_bucket_multiple)
        buf = np.zeros((1, n) + wav.shape[1:], np.float32)
        buf[0, :len(wav)] = wav
        est, _ = self._jit(self.params, jnp.asarray(buf),
                           jnp.asarray([len(wav)], jnp.int32))
        return np.asarray(est)[0][:, :len(wav)]
