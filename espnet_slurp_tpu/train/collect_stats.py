"""Collect-stats pass: feature mean/var for GlobalMVN + shape files.

Parity target: reference espnet2/main_funcs/collect_stats.py:19- (pre-training
pass writing per-utt shape files and aggregated feature statistics consumed
by GlobalMVN). Runs the jitted frontend over the dataset in bucketed batches.
"""
from __future__ import annotations

from pathlib import Path
from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.fileio import DatadirWriter
from ..ops.frontend import FrontendConfig, default_frontend
from ..ops.masks import length_mask


def collect_stats(
    batches: Iterable[dict],
    frontend_cfg: FrontendConfig,
    output_dir: str | Path,
    input_feats: bool = False,
) -> dict:
    """batches: iterator of {speech, speech_lengths, (uids)} host batches.

    Writes {output_dir}/feats_stats.npz (count/sum/sum_square) and
    speech_shape; returns the stats dict. ``input_feats``: speech already
    IS the [B, T, D] feature matrix (stage-3 dump path) — skip the
    frontend and aggregate over it directly.
    """
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def one(speech, speech_lengths):
        if input_feats:
            feats, flens = speech.astype(jnp.float32), speech_lengths
        else:
            feats, flens = default_frontend(speech, speech_lengths,
                                            frontend_cfg)
        mask = length_mask(flens, feats.shape[1])[..., None]
        s = jnp.sum(jnp.where(mask, feats, 0.0), axis=(0, 1))
        sq = jnp.sum(jnp.where(mask, feats**2, 0.0), axis=(0, 1))
        count = jnp.sum(flens)
        return s, sq, count, flens

    total_s = None
    total_sq = None
    total_n = 0
    writer = DatadirWriter(out)
    for batch in batches:
        s, sq, n, flens = one(batch["speech"], batch["speech_lengths"])
        total_s = np.asarray(s, np.float64) if total_s is None \
            else total_s + np.asarray(s, np.float64)
        total_sq = np.asarray(sq, np.float64) if total_sq is None \
            else total_sq + np.asarray(sq, np.float64)
        total_n += int(n)
        for uid, fl in zip(batch.get("uids", []), np.asarray(flens)):
            writer["speech_shape"][uid] = f"{int(fl)},{frontend_cfg.n_mels}"
    writer.close()
    stats = {"count": np.asarray(total_n),
             "sum": total_s.astype(np.float64),
             "sum_square": total_sq.astype(np.float64)}
    np.savez(out / "feats_stats.npz", **stats)
    return stats
