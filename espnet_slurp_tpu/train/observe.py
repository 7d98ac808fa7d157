"""Observability sinks: tensorboard scalars + jax.profiler traces.

Parity target: reference reporter sinks (espnet2/train/reporter.py:539
tensorboard_add_scalar + wandb_log, trainer.py:247-257 SummaryWriter /
wandb.init wiring) and the SURVEY §5 TPU plan (jax.profiler trace hooks in
place of torch.profiler). wandb is an optional dependency: WandbSink
degrades to a no-op when the package is absent (this image ships without
it), mirroring the reference's --use_wandb gate.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

log = logging.getLogger("espnet_slurp_tpu")


class TensorboardSink:
    """Scalar sink writing exp_dir/tensorboard/{train,valid} event files."""

    def __init__(self, exp_dir: str | Path):
        self._writers = {}
        self._root = Path(exp_dir) / "tensorboard"
        try:
            from tensorboardX import SummaryWriter
            self._cls = SummaryWriter
        except Exception:  # pragma: no cover - optional dependency
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._cls = SummaryWriter
            except Exception:
                self._cls = None
                log.info("tensorboard writer unavailable; scalars disabled")

    def _writer(self, phase: str):
        if self._cls is None:
            return None
        if phase not in self._writers:
            self._writers[phase] = self._cls(str(self._root / phase))
        return self._writers[phase]

    def scalars(self, phase: str, stats: Dict[str, float], step: int):
        w = self._writer(phase)
        if w is None:
            return
        for k, v in stats.items():
            if isinstance(v, (int, float)):
                w.add_scalar(k, v, step)

    def close(self):
        for w in self._writers.values():
            w.close()


class WandbSink:
    """Scalar sink logging to Weights & Biases (reporter.py:560 wandb_log).

    Keys are namespaced ``{phase}/{key}`` and logged against the epoch,
    matching the reference's ``wandb.log({...}, step=epoch)`` layout so
    dashboards line up across frameworks.
    """

    def __init__(self, exp_dir: str | Path, project: Optional[str] = None,
                 name: Optional[str] = None):
        self._run = None
        try:
            import wandb
        except Exception:  # pragma: no cover - optional dependency
            log.info("wandb unavailable; wandb scalars disabled")
            return
        exp_dir = Path(exp_dir)
        self._run = wandb.init(
            project=project or "espnet_slurp_tpu",
            name=name or exp_dir.name,
            dir=str(exp_dir),
            resume="allow",
        )

    def scalars(self, phase: str, stats: Dict[str, float], step: int):
        if self._run is None:
            return
        payload = {f"{phase}/{k}": v for k, v in stats.items()
                   if isinstance(v, (int, float))}
        payload["epoch"] = step
        self._run.log(payload, step=step)

    def close(self):
        if self._run is not None:
            self._run.finish()
            self._run = None


class MatplotlibSink:
    """Training-curve PNG sink (reporter.py:492 matplotlib_plot analogue).

    Accumulates per-(phase, key) epoch history and redraws
    ``exp_dir/images/<key>.png`` after every epoch with one line per
    phase — the same at-a-glance loss/acc curves the reference drops into
    the experiment dir. No-op when matplotlib is absent.
    """

    def __init__(self, exp_dir: str | Path):
        self._dir = Path(exp_dir) / "images"
        self._hist: Dict[str, Dict[str, list]] = {}  # key -> phase -> [(e,v)]
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            self._plt = plt
        except Exception:  # pragma: no cover - optional dependency
            self._plt = None
            log.info("matplotlib unavailable; curve plots disabled")

    def scalars(self, phase: str, stats: Dict[str, float], step: int):
        if self._plt is None:
            return
        changed = []
        for k, v in stats.items():
            if not isinstance(v, (int, float)):
                continue
            self._hist.setdefault(k, {}).setdefault(phase, []).append(
                (step, float(v)))
            changed.append(k)
        self._dir.mkdir(parents=True, exist_ok=True)
        for k in changed:
            fig, ax = self._plt.subplots(figsize=(5, 3))
            for ph, pts in sorted(self._hist[k].items()):
                xs, ys = zip(*pts)
                ax.plot(xs, ys, marker="o", markersize=2, label=ph)
            ax.set_xlabel("epoch")
            ax.set_ylabel(k)
            ax.grid(True, alpha=0.3)
            ax.legend()
            fig.tight_layout()
            fig.savefig(self._dir / f"{k.replace('/', '.')}.png")
            self._plt.close(fig)

    def close(self):
        pass


class ProfilerHook:
    """jax.profiler trace over a step window (torch.profiler analogue).

    Produces a TensorBoard-viewable trace under exp_dir/profile covering
    steps [start, stop).
    """

    def __init__(self, exp_dir: str | Path, start_step: int, stop_step: int):
        self.dir = str(Path(exp_dir) / "profile")
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def step(self, global_step: int):
        import jax
        if not self._active and global_step == self.start_step:
            jax.profiler.start_trace(self.dir)
            self._active = True
            log.info("jax.profiler trace started (step %d) -> %s",
                     global_step, self.dir)
        elif self._active and global_step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            log.info("jax.profiler trace stopped (step %d)", global_step)

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
