"""Epoch-loop trainer.

Parity target: reference espnet2/train/trainer.py:153-772 (Trainer.run:
resume, per-epoch train/validate, checkpoint + n-best retention, early
stopping, log_interval lines). The per-step work all lives in the jitted
train step (state.py); this loop is pure host-side orchestration: iterate
bucketed batches, feed the device, aggregate stats.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Iterable, Optional

import jax

from ..parallel.mesh import shard_batch
from .checkpoint import CheckpointManager
from .reporter import Reporter, SubReporter
from .state import TrainState

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass
class TrainerOptions:
    max_epoch: int = 40
    patience: Optional[int] = None
    keep_nbest: int = 10
    criterion: tuple = ("valid", "loss", "min")
    log_interval: int = 50
    resume: bool = True
    nbest_average: int = 10


class Trainer:
    """run(state, train/valid iter factories, steps, options) -> final state."""

    def __init__(self, train_step: Callable, eval_step: Callable,
                 ckpt: CheckpointManager, options: TrainerOptions,
                 mesh=None):
        self.train_step = train_step
        self.eval_step = eval_step
        self.ckpt = ckpt
        self.options = options
        self.mesh = mesh

    def _place(self, batch):
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return batch

    def run(self, state: TrainState,
            train_iter_factory: Callable[[int], Iterable],
            valid_iter_factory: Callable[[int], Iterable]) -> TrainState:
        o = self.options
        reporter = Reporter()
        start_epoch = 1
        if o.resume:
            latest = self.ckpt.latest_epoch()
            if latest is not None:
                state = self.ckpt.restore(latest, state)
                reporter = self.ckpt.load_reporter()
                start_epoch = latest + 1
                log.info("resumed from epoch %d", latest)

        phase, key, mode = o.criterion
        for epoch in range(start_epoch, o.max_epoch + 1):
            sub = SubReporter()
            for batch in train_iter_factory(epoch):
                state, stats = self.train_step(state, self._place(batch))
                sub.register({k: v for k, v in stats.items()})
                if sub.steps % o.log_interval == 0:
                    m = sub.mean()
                    log.info("epoch %d step %d loss=%.4f", epoch, sub.steps,
                             m.get("loss", float("nan")))
            reporter.observe(epoch, "train", sub.mean())

            sub = SubReporter()
            for batch in valid_iter_factory(epoch):
                stats = self.eval_step(state, self._place(batch))
                sub.register({k: v for k, v in stats.items()})
            reporter.observe(epoch, "valid", sub.mean())
            log.info(reporter.log_line(epoch))

            self.ckpt.save_epoch(epoch, state, reporter)
            if o.patience is not None and reporter.check_early_stopping(
                    o.patience, phase, key, mode):
                log.info("early stopping at epoch %d", epoch)
                break

        if o.nbest_average > 1:
            try:
                self.ckpt.average_nbest(reporter, o.nbest_average)
            except RuntimeError:
                pass
        return state
