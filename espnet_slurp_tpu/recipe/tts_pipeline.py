"""Staged TTS recipe pipeline — the tts.sh analogue.

Parity target: reference egs2/TEMPLATE/tts1/tts.sh (data validation,
stats/training, decoding, objective evaluation). Stage numbering follows
the asr/slu pipelines; the objective-eval stage computes a log-mel L1
distance between synthesized and ground-truth features (the reference's
MCD-style scoring, scripts/utils/evaluate_*.sh, reduced to the in-framework
feature space).
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..data.fileio import load_wav, read_2column_text, write_wav
from ..tasks.tts import Text2Speech, TTSTask, TTSTaskConfig

log = logging.getLogger("espnet_slurp_tpu")


def mel_l1_distance(wav_hyp: np.ndarray, wav_ref: np.ndarray,
                    cfg: TTSTaskConfig) -> float:
    """Objective eval: mean |logmel(hyp) - logmel(ref)| over the shorter
    of the two (dynamic-time alignment omitted; synth length comes from
    the model's own duration predictions)."""
    import jax.numpy as jnp
    from ..ops.frontend import default_frontend
    fc = cfg.data.frontend
    n = min(len(wav_hyp), len(wav_ref))
    if n < fc.n_fft:
        return float("nan")
    feats = []
    for w in (wav_hyp[:n], wav_ref[:n]):
        m, ml = default_frontend(jnp.asarray(w[None], jnp.float32),
                                 jnp.asarray([n]), fc)
        feats.append(np.asarray(m)[0][: int(ml[0])])
    t = min(f.shape[0] for f in feats)
    return float(np.mean(np.abs(feats[0][:t] - feats[1][:t])))


def run_tts_pipeline(
    cfg: TTSTaskConfig,
    stage: int = 1,
    stop_stage: int = 13,
    eval_dirs: Optional[List[str]] = None,
    max_frames: int = 500,
) -> Dict[str, float]:
    """Stages: 1 validate -> 11 train -> 12 synthesize -> 13 objective eval."""
    results: Dict[str, float] = {}
    exp = Path(cfg.exp_dir)
    exp.mkdir(parents=True, exist_ok=True)

    if stage <= 1 <= stop_stage:
        for d in (cfg.data.train_dir, cfg.data.valid_dir):
            d = Path(d)
            wavs = read_2column_text(d / "wav.scp")
            texts = read_2column_text(d / "text")
            if set(wavs) != set(texts):
                raise RuntimeError(f"{d}: wav.scp/text mismatch")
        log.info("stage1: TTS data validated")

    if stage <= 11 <= stop_stage:
        TTSTask.train(cfg)
        log.info("stage11: TTS training done")

    if stage <= 12 <= stop_stage:
        t2s = Text2Speech(str(exp))
        for dname in [cfg.data.valid_dir] + list(eval_dirs or []):
            dname = Path(dname)
            out = exp / f"synth_{dname.name}"
            (out / "wav").mkdir(parents=True, exist_ok=True)
            texts = read_2column_text(dname / "text")
            wavs = read_2column_text(dname / "wav.scp")
            dists = []
            for uid, text in texts.items():
                mel, wav = t2s(text, max_frames=max_frames)
                if wav is None or len(wav) == 0:
                    continue
                write_wav(str(out / "wav" / f"{uid}.wav"),
                          np.asarray(wav, np.float32))
                if stage <= 13 <= stop_stage and uid in wavs:
                    ref, _ = load_wav(wavs[uid])
                    d13 = mel_l1_distance(np.asarray(wav), ref, cfg)
                    if np.isfinite(d13):
                        dists.append(d13)
            log.info("stage12 %s: synthesized %d utts -> %s",
                     dname.name, len(texts), out)
            if stage <= 13 <= stop_stage and dists:
                key = f"mel_l1_{dname.name}"
                results[key] = float(np.mean(dists))
                log.info("stage13 %s: mel-L1 %.4f", dname.name, results[key])
    return results
