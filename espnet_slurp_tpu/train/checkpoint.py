"""Checkpoint / resume / n-best parameter averaging.

Parity target: reference trainer.py:124-151,339-432 (checkpoint.pth with
model+reporter+optimizers, per-epoch weights, best symlinks, n-best pruning)
and main_funcs/average_nbest_models.py. Uses orbax for the array pytrees
(multi-host-safe) and JSON for the reporter.
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .reporter import Reporter


class CheckpointManager:
    def __init__(self, exp_dir: str | Path, keep_nbest: int = 10,
                 criterion: tuple = ("valid", "loss", "min")):
        self.exp_dir = Path(exp_dir)
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self.keep_nbest = keep_nbest
        self.criterion = criterion
        self._ckpt = ocp.PyTreeCheckpointer()

    # -- paths --
    def epoch_dir(self, epoch: int) -> Path:
        return self.exp_dir / f"{epoch}epoch"

    @property
    def latest_file(self) -> Path:
        return self.exp_dir / "latest.json"

    @staticmethod
    def _is_primary() -> bool:
        return jax.process_index() == 0

    @staticmethod
    def _sync(tag: str):
        """Cross-process barrier so non-primary hosts never read
        half-written checkpoints (multi-host save is primary-only: state is
        replicated numpy after device_get, so one writer suffices)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(tag)

    # -- save/load --
    def save_epoch(self, epoch: int, state, reporter: Reporter):
        """Save full train state for resume + record latest epoch.

        Multi-process: the orbax save itself is COLLECTIVE (it runs its own
        cross-process barriers), so every process calls it; only the
        directory cleanup and the JSON sidecars are primary-only.
        """
        path = self.epoch_dir(epoch)
        if self._is_primary() and path.exists():
            shutil.rmtree(path)
        self._sync(f"ckpt_rm_{epoch}")
        tree = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step, "rng": state.rng}
        for opt_field in ("ema_params", "lr_scale", "gnorm_ema"):
            if getattr(state, opt_field, None) is not None:
                tree[opt_field] = getattr(state, opt_field)
        self._ckpt.save(path.absolute(), jax.device_get(tree))
        if self._is_primary():
            reporter.save(self.exp_dir / "reporter.json")
            with open(self.latest_file, "w") as f:
                json.dump({"epoch": epoch}, f)
            self.prune(reporter)
        self._sync(f"ckpt_epoch_{epoch}")

    def latest_epoch(self) -> Optional[int]:
        if not self.latest_file.exists():
            return None
        with open(self.latest_file) as f:
            return json.load(f)["epoch"]

    def restore(self, epoch: int, state):
        """Restore a TrainState saved at `epoch` (template = current state).

        Optional subtrees (EMA shadow, divergence-guard scalars) may be
        absent from checkpoints written before those features existed;
        restore falls back to the base tree and keeps the live values.
        """
        tpl = {"params": state.params, "opt_state": state.opt_state,
               "step": state.step, "rng": state.rng}
        path = self.epoch_dir(epoch).absolute()
        opt_fields = [f for f in ("ema_params", "lr_scale", "gnorm_ema")
                      if getattr(state, f, None) is not None]
        if opt_fields:
            try:
                full = dict(tpl)
                for f in opt_fields:
                    full[f] = getattr(state, f)
                restored = self._ckpt.restore(path,
                                              item=jax.device_get(full))
                return state.replace(
                    params=restored["params"],
                    opt_state=restored["opt_state"], step=restored["step"],
                    rng=restored["rng"],
                    **{f: restored[f] for f in opt_fields})
            except Exception:
                pass
        restored = self._ckpt.restore(path, item=jax.device_get(tpl))
        return state.replace(params=restored["params"],
                             opt_state=restored["opt_state"],
                             step=restored["step"], rng=restored["rng"])

    def load_reporter(self) -> Reporter:
        p = self.exp_dir / "reporter.json"
        return Reporter.load(p) if p.exists() else Reporter()

    # -- retention --
    def prune(self, reporter: Reporter):
        """Keep n-best (by criterion) + latest epoch dirs (trainer.py:355-432)."""
        phase, key, mode = self.criterion
        keep = set(reporter.sort_epochs(phase, key, mode)[:self.keep_nbest])
        latest = self.latest_epoch()
        if latest is not None:
            keep.add(latest)
        for p in self.exp_dir.glob("*epoch"):
            try:
                ep = int(p.name.replace("epoch", ""))
            except ValueError:
                continue
            if ep not in keep:
                shutil.rmtree(p)

    def average_nbest(self, reporter: Reporter, n: int = 10) -> Any:
        """Parameter-average the n best epochs (average_nbest_models.py:13).

        Collective in multi-process runs (orbax restore/save on every
        process; primary cleans the output dir)."""
        phase, key, mode = self.criterion
        epochs = [e for e in reporter.sort_epochs(phase, key, mode)[:n]
                  if self.epoch_dir(e).exists()]
        if not epochs:
            raise RuntimeError("no checkpoints to average")
        avg = None
        for e in epochs:
            p = self._ckpt.restore(self.epoch_dir(e).absolute())["params"]
            if avg is None:
                avg = jax.tree.map(lambda x: np.asarray(x, np.float64), p)
            else:
                avg = jax.tree.map(lambda a, x: a + np.asarray(x, np.float64),
                                   avg, p)
        avg = jax.tree.map(lambda a: (a / len(epochs)).astype(np.float32), avg)
        out = self.exp_dir / f"{phase}.{key}.ave_{len(epochs)}best"
        if self._is_primary() and out.exists():
            shutil.rmtree(out)
        self._sync("ave_nbest_rm")
        self._ckpt.save(out.absolute(), {"params": avg})
        return avg

    def load_params(self, name: str) -> Any:
        """Load params-only checkpoint by dir name (e.g. 'valid.loss.ave_5best')."""
        return self._ckpt.restore((self.exp_dir / name).absolute())["params"]
