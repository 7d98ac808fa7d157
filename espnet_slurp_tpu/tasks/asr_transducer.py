"""Transducer ASR task.

Parity target: reference espnet2/tasks/asr_transducer.py (ASRTransducerTask,
426 LoC) + espnet2/bin/asr_transducer_inference.py (Speech2Text for
transducer, 795 LoC). Reuses the ASR task's data machinery; the model is
TransducerModel, decoding is greedy or the batched ALS beam.
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..models.transducer import (TransducerConfig, TransducerModel,
                                 transducer_greedy_decode)
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig, build_optimizer
from ..train.state import TrainState, make_eval_step, make_train_step
from ..train.trainer import Trainer, TrainerOptions
from ..utils.config import from_dict, load_yaml, merge_dicts, save_yaml
from .asr import ASRTask, DataConfig

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass(frozen=True)
class TransducerTaskConfig:
    exp_dir: str = "exp/transducer"
    model: TransducerConfig = TransducerConfig()
    optim: OptimConfig = OptimConfig()
    data: DataConfig = DataConfig()
    max_epoch: int = 40
    patience: Optional[int] = None
    keep_nbest: int = 10
    nbest_average: int = 5
    log_interval: int = 50
    resume: bool = True


def load_transducer_config(path=None, overrides=None) -> TransducerTaskConfig:
    d = load_yaml(path) if path else {}
    if overrides:
        d = merge_dicts(d, overrides)
    return from_dict(TransducerTaskConfig, d)


class ASRTransducerTask:
    @classmethod
    def train(cls, cfg: TransducerTaskConfig, mesh=None) -> TrainState:
        exp = Path(cfg.exp_dir)
        exp.mkdir(parents=True, exist_ok=True)
        # Vocab via the shared ASR machinery (tokens.txt in exp_dir).
        asr_like = dataclasses.replace(
            _as_asr_cfg(cfg), exp_dir=cfg.exp_dir)
        tokenizer, converter, asr_model_cfg = ASRTask.prepare_vocab(asr_like)
        model_cfg = dataclasses.replace(cfg.model, asr=asr_model_cfg)
        save_yaml(dataclasses.replace(cfg, model=model_cfg),
                  exp / "config.yaml")
        model = TransducerModel(model_cfg)

        train_ds = ASRTask.build_dataset(cfg.data.train_dir, tokenizer,
                                         converter)
        valid_ds = ASRTask.build_dataset(cfg.data.valid_dir, tokenizer,
                                         converter)
        train_if = ASRTask.build_iter_factory(asr_like, train_ds,
                                              shuffle=True)
        valid_if = ASRTask.build_iter_factory(asr_like, valid_ds,
                                              shuffle=False)

        batch0 = next(iter(train_if(1)))
        params = model.init(jax.random.PRNGKey(cfg.data.seed),
                            **batch0)["params"]
        tx = build_optimizer(cfg.optim)
        state = TrainState.create(params, tx,
                                  jax.random.PRNGKey(cfg.data.seed),
                                  ema=cfg.optim.ema_decay > 0)
        if mesh is not None:
            from ..parallel.mesh import replicated
            state = jax.device_put(state, replicated(mesh))
        ckpt = CheckpointManager(exp, cfg.keep_nbest)
        trainer = Trainer(make_train_step(model, tx,
                                          grad_noise_eta=cfg.optim.grad_noise_eta,
                                          ema_decay=cfg.optim.ema_decay), make_eval_step(model),
                          ckpt,
                          TrainerOptions(max_epoch=cfg.max_epoch,
                                         patience=cfg.patience,
                                         keep_nbest=cfg.keep_nbest,
                                         nbest_average=cfg.nbest_average,
                                         log_interval=cfg.log_interval,
                                         resume=cfg.resume),
                          mesh=mesh)
        return trainer.run(state, train_if, valid_if)


def _as_asr_cfg(cfg: TransducerTaskConfig):
    from .asr import ASRTaskConfig
    return ASRTaskConfig(exp_dir=cfg.exp_dir, model=cfg.model.asr,
                         optim=cfg.optim, data=cfg.data,
                         max_epoch=cfg.max_epoch, keep_nbest=cfg.keep_nbest)


class Speech2TextTransducer:
    """Transducer inference wrapper (asr_transducer_inference.py analogue)."""

    def __init__(self, exp_dir: str, ckpt_name: Optional[str] = None,
                 beam_size: int = 1, max_len: int = 128,
                 search: str = "alsa"):
        # search: greedy | alsa | default | maes | tsd | nsc
        # (beam_search_transducer.py algos; greedy forced when beam_size <= 1)
        exp = Path(exp_dir)
        self.cfg = load_transducer_config(exp / "config.yaml")
        asr_like = dataclasses.replace(_as_asr_cfg(self.cfg),
                                       exp_dir=str(exp))
        tokenizer, converter, _ = ASRTask.prepare_vocab(asr_like)
        self.tokenizer, self.converter = tokenizer, converter
        self.model = TransducerModel(self.cfg.model)
        mgr = CheckpointManager(exp, self.cfg.keep_nbest)
        if ckpt_name is None:
            cands = sorted(exp.glob("valid.*best"))
            ckpt_name = cands[0].name if cands else f"{mgr.latest_epoch()}epoch"
        self.params = mgr.load_params(ckpt_name)
        self.beam_size = beam_size
        self.max_len = max_len
        self.search = search
        self._jit = None

    def __call__(self, speech: np.ndarray) -> str:
        import jax.numpy as jnp
        from ..data.sampler import bucket_length
        n = bucket_length(len(speech),
                          self.cfg.data.speech_bucket_multiple)
        buf = np.zeros((1, n), np.float32)
        buf[0, :len(speech)] = speech
        if self._jit is None:
            model = self.model

            def decode(params, speech, lengths):
                hs, h_lengths, _ = model.apply(
                    {"params": params}, speech, lengths,
                    method=lambda m, s, sl: m.encode(s, sl))
                if self.beam_size > 1 and self.search == "maes":
                    from ..decode.transducer_beam import (MAESConfig,
                                                          maes_search)
                    return maes_search(
                        model, params, hs, h_lengths,
                        MAESConfig(beam_size=self.beam_size,
                                   max_len=self.max_len))
                if self.beam_size > 1 and self.search == "tsd":
                    from ..decode.transducer_beam import TSDConfig, tsd_search
                    return tsd_search(
                        model, params, hs, h_lengths,
                        TSDConfig(beam_size=self.beam_size,
                                  max_len=self.max_len))
                if self.beam_size > 1 and self.search == "default":
                    from ..decode.transducer_beam import (
                        DefaultBeamConfig, default_beam_search)
                    return default_beam_search(
                        model, params, hs, h_lengths,
                        DefaultBeamConfig(beam_size=self.beam_size,
                                          max_len=self.max_len))
                if self.beam_size > 1 and self.search == "nsc":
                    from ..decode.transducer_beam import NSCConfig, nsc_search
                    return nsc_search(
                        model, params, hs, h_lengths,
                        NSCConfig(beam_size=self.beam_size,
                                  max_len=self.max_len))
                if self.beam_size > 1:
                    from ..decode.transducer_beam import (
                        TransducerBeamConfig, transducer_beam_search)
                    return transducer_beam_search(
                        model, params, hs, h_lengths,
                        TransducerBeamConfig(beam_size=self.beam_size,
                                             max_len=self.max_len))
                return transducer_greedy_decode(model, params, hs, h_lengths,
                                                max_len=self.max_len)
            self._jit = jax.jit(decode)
        tokens, lengths = self._jit(self.params, jnp.asarray(buf),
                                    jnp.asarray([len(speech)], np.int32))
        ids = np.asarray(tokens)[0][: int(lengths[0])]
        return self.tokenizer.tokens2text(self.converter.ids2tokens(ids))
