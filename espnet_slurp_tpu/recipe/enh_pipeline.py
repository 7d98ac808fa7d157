"""Staged enhancement recipe pipeline — the enh.sh analogue.

Parity target: reference egs2/TEMPLATE/enh1/enh.sh (validation, training,
separation, scoring). Scoring reports SI-SNR and SI-SNR improvement over
the unprocessed mixture with the best output-reference permutation
(the reference's scoring stage via espnet2/bin/enh_scoring.py).
"""
from __future__ import annotations

import itertools
import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..data.fileio import load_wav, read_2column_text, write_wav
from ..tasks.enh import EnhTask, EnhTaskConfig, SeparateSpeech

log = logging.getLogger("espnet_slurp_tpu")


def si_snr_np(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SNR in dB (numpy scoring-side implementation)."""
    est = est - est.mean()
    ref = ref - ref.mean()
    s = np.dot(est, ref) / max(np.dot(ref, ref), 1e-8) * ref
    e = est - s
    return float(10 * np.log10(max(np.dot(s, s), 1e-8)
                               / max(np.dot(e, e), 1e-8)))


def score_separation(est: np.ndarray, refs: np.ndarray,
                     mix: np.ndarray) -> Dict[str, float]:
    """est [S, N], refs [S, N], mix [N] -> best-permutation SI-SNR(i)."""
    s = refs.shape[0]
    n = min(est.shape[1], refs.shape[1], len(mix))
    best = -np.inf
    for perm in itertools.permutations(range(s)):
        val = np.mean([si_snr_np(est[perm[i], :n], refs[i, :n])
                       for i in range(s)])
        best = max(best, val)
    base = np.mean([si_snr_np(mix[:n], refs[i, :n]) for i in range(s)])
    return {"si_snr": best, "si_snr_i": best - base}


def run_enh_pipeline(
    cfg: EnhTaskConfig,
    stage: int = 1,
    stop_stage: int = 13,
    eval_dirs: Optional[List[str]] = None,
) -> Dict[str, float]:
    """Stages: 1 validate -> 11 train -> 12 separate -> 13 score."""
    results: Dict[str, float] = {}
    exp = Path(cfg.exp_dir)
    exp.mkdir(parents=True, exist_ok=True)
    n_spk = cfg.model.n_spk

    if stage <= 1 <= stop_stage:
        for d in (cfg.train_dir, cfg.valid_dir):
            d = Path(d)
            wavs = read_2column_text(d / "wav.scp")
            for i in range(n_spk):
                refs = read_2column_text(d / f"spk{i+1}.scp")
                if set(wavs) != set(refs):
                    raise RuntimeError(f"{d}: wav.scp/spk{i+1}.scp mismatch")
        log.info("stage1: enh data validated")

    if stage <= 11 <= stop_stage:
        EnhTask.train(cfg)
        log.info("stage11: enh training done")

    if stage <= 12 <= stop_stage:
        sep = SeparateSpeech(str(exp))
        for dname in [cfg.valid_dir] + list(eval_dirs or []):
            dname = Path(dname)
            out = exp / f"separate_{dname.name}"
            (out / "wav").mkdir(parents=True, exist_ok=True)
            wavs = read_2column_text(dname / "wav.scp")
            ref_scps = [read_2column_text(dname / f"spk{i+1}.scp")
                        for i in range(n_spk)]
            scores = []
            for uid, path in wavs.items():
                mix, _ = load_wav(path)
                est = sep(mix)                       # [S, N]
                for s in range(n_spk):
                    write_wav(str(out / "wav" / f"{uid}_spk{s+1}.wav"),
                              est[s])
                if stage <= 13 <= stop_stage:
                    refs = np.stack([load_wav(r[uid])[0]
                                     for r in ref_scps])
                    scores.append(score_separation(est, refs, mix))
            log.info("stage12 %s: separated %d mixtures -> %s",
                     dname.name, len(wavs), out)
            if stage <= 13 <= stop_stage and scores:
                for key in ("si_snr", "si_snr_i"):
                    results[f"{key}_{dname.name}"] = float(
                        np.mean([s[key] for s in scores]))
                log.info("stage13 %s: SI-SNR %.2f dB (improvement %.2f dB)",
                         dname.name, results[f"si_snr_{dname.name}"],
                         results[f"si_snr_i_{dname.name}"])
    return results
