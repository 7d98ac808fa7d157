"""SVS inference CLI (reference espnet2/bin/svs_inference.py analogue).

Reads score streams (label/midi/tempo .scp of int sequences) from a data
dir and writes mel (.npy) + Griffin-Lim wavs per utterance.
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from ..data.fileio import read_2column_text, write_wav
from ..tasks.svs import SingingGenerate

log = logging.getLogger("espnet_slurp_tpu")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="SVS inference (TPU-native)")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--speed", type=float, default=1.0)
    args = p.parse_args(argv)

    gen = SingingGenerate(args.exp_dir, args.ckpt, speed=args.speed)
    d = Path(args.data_dir)
    streams = {name: read_2column_text(d / f"{name}.scp")
               for name in ("label", "midi", "tempo")}
    out = Path(args.output_dir)
    (out / "wav").mkdir(parents=True, exist_ok=True)
    (out / "mel").mkdir(parents=True, exist_ok=True)
    n = 0
    for uid in streams["label"]:
        ints = {k: np.array([int(t) for t in streams[k][uid].split()],
                            np.int32) for k in streams}
        mel, wav = gen(ints["label"], ints["midi"], ints["tempo"])
        np.save(out / "mel" / f"{uid}.npy", mel)
        if wav is not None:
            write_wav(str(out / "wav" / f"{uid}.wav"), np.asarray(wav))
        n += 1
    log.info("synthesized %d scores -> %s", n, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
