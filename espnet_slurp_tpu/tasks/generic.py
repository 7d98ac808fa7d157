"""Shared runner for the non-ASR task families (enh/st/mt/diar/hubert).

Parity target: reference espnet2/tasks/{enh,st,mt,diar,hubert}.py — each a
full AbsTask subclass; here the common train plumbing (optimizer, trainer,
checkpoints, epoch-seeded iteration, mesh placement) is one helper and each
task file only declares its data streams, model, and apply adapters.
"""
from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..data.collate import common_collate
from ..data.sampler import build_batches, epoch_shuffle
from ..train.checkpoint import CheckpointManager
from ..train.optim import OptimConfig, build_optimizer
from ..train.state import TrainState, make_eval_step, make_train_step
from ..train.trainer import Trainer, TrainerOptions
from ..utils.config import from_dict, load_yaml, merge_dicts, save_yaml

log = logging.getLogger("espnet_slurp_tpu")


@dataclasses.dataclass(frozen=True)
class RunOptions:
    """Trainer-side options shared by every task config."""
    max_epoch: int = 20
    patience: Optional[int] = None
    keep_nbest: int = 5
    nbest_average: int = 1
    log_interval: int = 50
    resume: bool = True
    seed: int = 0


def simple_iter_factory(dataset, batch_adapter: Callable, batch_size: int,
                        seed: int, shuffle: bool,
                        bucket_multiples: Optional[Dict[str, int]] = None,
                        shapes: Optional[Dict] = None):
    """Sorted fixed-size batches over a SpeechDataset-like object."""
    if shapes is None:
        shapes = {}
        for uid in dataset.keys:
            _, d = dataset[uid]
            first = next(iter(d.values()))
            shapes[uid] = (np.asarray(first).shape[0],)
    batches = build_batches([shapes], batch_type="sorted",
                            batch_size=batch_size)

    def factory(epoch: int):
        bs = epoch_shuffle(batches, seed, epoch) if shuffle else batches
        for utts in bs:
            items = [dataset[u] for u in utts]
            uids, coll = common_collate(items,
                                        bucket_multiples=bucket_multiples)
            yield batch_adapter(uids, coll)

    return factory


def run_training(*, exp_dir: str, model, init_fn: Callable,
                 train_factory, valid_factory, optim: OptimConfig,
                 run: RunOptions, train_apply: Callable,
                 eval_apply: Callable, mesh=None,
                 resolved_cfg=None, attention_hook=None) -> TrainState:
    """Generic Trainer.run over jitted steps with task apply adapters.

    train_apply(params, batch, dropout_rng, specaug_rng) -> (loss, stats)
    eval_apply(params, batch) -> (loss, stats)
    """
    exp = Path(exp_dir)
    exp.mkdir(parents=True, exist_ok=True)
    if resolved_cfg is not None:
        save_yaml(resolved_cfg, exp / "config.yaml")
    params = init_fn(jax.random.PRNGKey(run.seed))
    tx = build_optimizer(optim)
    state = TrainState.create(params, tx, jax.random.PRNGKey(run.seed),
                              ema=optim.ema_decay > 0)
    if mesh is not None:
        from ..parallel.mesh import replicated
        state = jax.device_put(state, replicated(mesh))
    ckpt = CheckpointManager(exp, run.keep_nbest)
    trainer = Trainer(
        make_train_step(model, tx, grad_noise_eta=optim.grad_noise_eta,
                        ema_decay=optim.ema_decay, apply_fn=train_apply),
        make_eval_step(model, apply_fn=eval_apply), ckpt,
        TrainerOptions(max_epoch=run.max_epoch, patience=run.patience,
                       keep_nbest=run.keep_nbest,
                       nbest_average=run.nbest_average,
                       log_interval=run.log_interval, resume=run.resume),
        mesh=mesh, attention_hook=attention_hook)
    # Overlap host-side loading/collation with device steps (the
    # reference's DataLoader workers; data/prefetch.py).
    from ..data.prefetch import prefetch_factory
    return trainer.run(state, prefetch_factory(train_factory),
                       valid_factory)


def load_config(cls, path=None, overrides=None):
    d = load_yaml(path) if path else {}
    if overrides:
        d = merge_dicts(d, overrides)
    return from_dict(cls, d)
