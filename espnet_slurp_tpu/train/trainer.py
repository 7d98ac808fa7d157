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
    # Observability (SURVEY §5): tensorboard scalar sink + jax.profiler
    # trace window ([start, stop) global steps; None disables).
    tensorboard: bool = True
    use_wandb: bool = False
    wandb_project: Optional[str] = None
    plot_curves: bool = True  # exp_dir/images/<metric>.png epoch curves
    profile_start_step: Optional[int] = None
    profile_stop_step: Optional[int] = None
    # Divergence guard (one step past reference trainer.py:651-670 +
    # e2e_asr.py:575-581): when the epoch's valid criterion explodes past
    # guard_factor x best-so-far (or goes non-finite), roll the TrainState
    # back to the best epoch's checkpoint and multiply the update scale by
    # guard_backoff. None disables. guard_max bounds total rollbacks.
    guard_factor: Optional[float] = 5.0
    guard_backoff: float = 0.5
    guard_max: int = 3
    # |best| floor for the guard's additive margin (see _guard): bounds
    # the trigger sensitivity when the criterion sits near zero.
    guard_margin_floor: float = 1.0


class Trainer:
    """run(state, train/valid iter factories, steps, options) -> final state."""

    def __init__(self, train_step: Callable, eval_step: Callable,
                 ckpt: CheckpointManager, options: TrainerOptions,
                 mesh=None, attention_hook: Optional[Callable] = None):
        self.train_step = train_step
        self.eval_step = eval_step
        self.ckpt = ckpt
        self.options = options
        self.mesh = mesh
        # Per-epoch diagnostics callback (reference Trainer.plot_attention,
        # trainer.py:774-859): called as hook(state, epoch) on the primary
        # process after validation; tasks wire attention heat-map dumps.
        self.attention_hook = attention_hook

    def _place(self, batch):
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return batch

    def _guard(self, state, reporter, epoch, phase, key, mode):
        """Divergence guard: rollback + LR backoff when the valid criterion
        explodes (guard_factor x best) or goes non-finite. Returns
        (state, rolled_back). The observed TCPGen-arm failure mode
        (grad_norm 4 -> 512 over epochs 16-25 with the campaign decoding a
        diverged model) is exactly what this catches."""
        import math
        o = self.options
        cur = reporter.get_value(epoch, phase, key)
        if cur is None:
            return state, False
        prev = [(e, reporter.get_value(e, phase, key))
                for e in range(1, epoch)]
        prev = [(e, v) for e, v in prev
                if v is not None and math.isfinite(v)
                and self.ckpt.epoch_dir(e).exists()]
        if not prev:
            return state, False
        best_epoch, best = (min if mode == "min" else max)(
            prev, key=lambda t: t[1])
        # Additive margins scaled by |best| — equivalent to the
        # multiplicative factor for positive criteria, but a NEGATIVE best
        # must not invert the threshold (observed: KA2G's CTC criterion
        # goes negative; best=-0.17 x factor 5 flagged -0.12, a
        # fluctuation, and the guard rolled back every epoch until the
        # abort). The floor keeps near-zero criteria from hair-triggering.
        ref = max(abs(best), o.guard_margin_floor)
        if mode == "min":
            diverged = (not math.isfinite(cur)) \
                or cur > best + (o.guard_factor - 1.0) * ref
        else:
            diverged = (not math.isfinite(cur)) \
                or cur < best - (1.0 - 1.0 / o.guard_factor) * ref
        if not diverged:
            return state, False
        state = self.ckpt.restore(best_epoch, state)
        if state.lr_scale is not None:
            import jax.numpy as jnp
            state = state.replace(
                lr_scale=state.lr_scale * o.guard_backoff)
            scale = float(jax.device_get(state.lr_scale))
        else:
            scale = 1.0
        log.warning(
            "divergence guard: epoch %d %s/%s=%.4g vs best %.4g (epoch %d, "
            "factor %.1f) — rolled back to epoch %d, lr_scale now %.3g",
            epoch, phase, key, cur, best, best_epoch, o.guard_factor,
            best_epoch, scale)
        return state, True

    def run(self, state: TrainState,
            train_iter_factory: Callable[[int], Iterable],
            valid_iter_factory: Callable[[int], Iterable]) -> TrainState:
        import time as _time
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

        from .observe import (MatplotlibSink, ProfilerHook, TensorboardSink,
                              WandbSink)
        # Sinks are primary-process-only on pods (the reference's rank-0-only
        # trainer sinks, trainer.py:247-257): secondary processes racing on
        # the same event-file dir is both wasteful and a makedirs crash.
        import jax as _jax
        primary = _jax.process_index() == 0
        sinks = []
        if o.tensorboard and primary:
            sinks.append(TensorboardSink(self.ckpt.exp_dir))
        if o.use_wandb and primary:
            sinks.append(WandbSink(self.ckpt.exp_dir, o.wandb_project))
        if o.plot_curves and primary:
            sinks.append(MatplotlibSink(self.ckpt.exp_dir))
        prof = None
        if o.profile_start_step is not None and primary:
            prof = ProfilerHook(self.ckpt.exp_dir, o.profile_start_step,
                                o.profile_stop_step
                                or o.profile_start_step + 5)

        phase, key, mode = o.criterion
        global_step = 0
        n_rollbacks = 0
        for epoch in range(start_epoch, o.max_epoch + 1):
            sub = SubReporter()
            t_prev = _time.perf_counter()
            for batch in train_iter_factory(epoch):
                t_data = _time.perf_counter()
                batch = self._place(batch)
                if prof is not None:
                    prof.step(global_step)
                state, stats = self.train_step(state, batch)
                t_step = _time.perf_counter()
                # Section wall timers (trainer.py:502-555 measure_time
                # analogue: fwd/bwd/optim are one fused jitted step here,
                # so the split is data-vs-device-dispatch).
                sub.register({**stats,
                              "iter_time": t_data - t_prev,
                              "step_time": t_step - t_data})
                t_prev = t_step
                global_step += 1
                if sub.steps % o.log_interval == 0:
                    m = sub.mean()
                    log.info("epoch %d step %d loss=%.4f", epoch, sub.steps,
                             m.get("loss", float("nan")))
            train_mean = sub.mean()
            # All-invalid abort (trainer.py:434-440 all_steps_are_invalid):
            # an epoch where EVERY update was skipped for non-finite
            # gradients means training is diverged/broken — fail loudly
            # instead of burning epochs.
            if sub.steps > 0 and train_mean.get("skipped", 0.0) >= 1.0:
                raise RuntimeError(
                    f"all {sub.steps} steps of epoch {epoch} produced "
                    "non-finite gradients; aborting (check lr/loss scale)")
            reporter.observe(epoch, "train", train_mean)

            sub = SubReporter()
            for batch in valid_iter_factory(epoch):
                stats = self.eval_step(state, self._place(batch))
                sub.register({k: v for k, v in stats.items()})
            valid_mean = sub.mean()
            reporter.observe(epoch, "valid", valid_mean)
            log.info(reporter.log_line(epoch))
            for sink in sinks:
                sink.scalars("train", train_mean, epoch)
                sink.scalars("valid", valid_mean, epoch)

            if self.attention_hook is not None and primary:
                try:
                    self.attention_hook(state, epoch)
                except Exception as e:  # diagnostics must not kill training
                    log.warning("attention plot hook failed: %s", e)

            if o.guard_factor is not None:
                state, rolled = self._guard(state, reporter, epoch,
                                            phase, key, mode)
                if rolled:
                    n_rollbacks += 1
                    if n_rollbacks > o.guard_max:
                        raise RuntimeError(
                            f"divergence guard rolled back {n_rollbacks} "
                            "times; training is unstable (check lr)")

            self.ckpt.save_epoch(epoch, state, reporter)
            if o.patience is not None and reporter.check_early_stopping(
                    o.patience, phase, key, mode):
                log.info("early stopping at epoch %d", epoch)
                break

        if prof is not None:
            prof.close()
        for sink in sinks:
            sink.close()
        if o.nbest_average > 1:
            try:
                self.ckpt.average_nbest(reporter, o.nbest_average)
            except RuntimeError:
                pass
        return state
