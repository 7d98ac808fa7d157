"""VC inference CLI: convert every source utterance in a data dir."""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Voice conversion (TPU-native)")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True,
                   help="dir with src_wav.scp")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--max_frames", type=int, default=500)
    args = p.parse_args(argv)
    from ..data.fileio import load_wav, read_2column_text, write_wav
    from ..tasks.vc import Speech2Speech
    s2s = Speech2Speech(args.exp_dir, ckpt_name=args.ckpt)
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    wavs = read_2column_text(Path(args.data_dir) / "src_wav.scp")
    n = 0
    for uid, path in wavs.items():
        wav, sr = load_wav(path)
        mel, conv = s2s(wav, max_frames=args.max_frames)
        import numpy as np
        np.save(out / "wav" / f"{uid}.npy", mel)
        if conv is not None:
            write_wav(str(out / "wav" / f"{uid}.wav"), conv, sr)
        n += 1
    logging.info("converted %d utterances -> %s", n, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
