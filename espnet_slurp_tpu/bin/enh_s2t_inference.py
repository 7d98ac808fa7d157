"""Enh+ASR inference CLI: mixture -> per-speaker transcripts."""
from __future__ import annotations

import argparse
import logging
from pathlib import Path

from ..data.fileio import DatadirWriter, load_wav, read_2column_text
from ..tasks.enh_s2t import EnhSpeech2Text

log = logging.getLogger("espnet_slurp_tpu")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(
        description="Enh+ASR inference (TPU-native)")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None)
    args = p.parse_args(argv)

    s2t = EnhSpeech2Text(args.exp_dir, args.ckpt)
    wavs = read_2column_text(Path(args.data_dir) / "wav.scp")
    with DatadirWriter(args.output_dir) as writer:
        for uid, path in wavs.items():
            mix, _ = load_wav(path)
            for s, text in enumerate(s2t(mix)):
                writer[f"text_spk{s+1}"][uid] = text
    log.info("transcribed %d mixtures -> %s", len(wavs), args.output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
