"""Diarization inference CLI (reference espnet2/bin/diar_inference.py):
frame activity decisions written as RTTM."""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Diarize speech")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--frame_shift", type=float, default=None,
                   help="seconds per encoder frame (default from config)")
    args = p.parse_args(argv)
    import numpy as np
    from ..data.fileio import load_wav, read_2column_text
    from ..tasks.diar import DiarizeSpeech
    diar = DiarizeSpeech(args.exp_dir, ckpt_name=args.ckpt,
                         threshold=args.threshold)
    fcfg = diar.cfg.model.frontend
    shift = args.frame_shift or (fcfg.hop_length / 16000.0)
    wavs = read_2column_text(Path(args.data_dir) / "wav.scp")
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "rttm", "w") as f:
        for uid, path in wavs.items():
            wav, _ = load_wav(path)
            post, dec = diar(wav)
            for s in range(dec.shape[1]):
                active = np.flatnonzero(dec[:, s])
                if active.size == 0:
                    continue
                # merge consecutive frames into segments
                splits = np.split(active,
                                  np.nonzero(np.diff(active) > 1)[0] + 1)
                for seg in splits:
                    start = seg[0] * shift
                    dur = (seg[-1] - seg[0] + 1) * shift
                    f.write(f"SPEAKER {uid} 1 {start:.2f} {dur:.2f} "
                            f"<NA> <NA> spk{s+1} <NA> <NA>\n")
    logging.info("diarized %d utts -> %s/rttm", len(wavs), out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
