"""Enhancement inference CLI (reference espnet2/bin/enh_inference.py):
separate every mixture in a data dir, write per-speaker wavs."""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Separate speech (TPU-native)")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None)
    args = p.parse_args(argv)
    from ..data.fileio import (DatadirWriter, load_wav, read_2column_text,
                               write_wav)
    from ..tasks.enh import SeparateSpeech
    sep = SeparateSpeech(args.exp_dir, ckpt_name=args.ckpt)
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    wavs = read_2column_text(Path(args.data_dir) / "wav.scp")
    with DatadirWriter(out) as w:
        for uid, path in wavs.items():
            wav, sr = load_wav(path, keep_channels=sep.multichannel)
            est = sep(wav)
            for s in range(est.shape[0]):
                wav_path = out / "wav" / f"{uid}_spk{s+1}.wav"
                write_wav(str(wav_path), est[s], sr)
                w[f"spk{s+1}.scp"][uid] = str(wav_path)
    logging.info("separated %d mixtures -> %s", len(wavs), out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
