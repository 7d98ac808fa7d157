"""Enhancement/separation scoring CLI.

Parity target: reference espnet2/bin/enh_scoring.py — per-utterance
STOI/ESTOI/SI-SNR/SDR/SAR/SIR over (reference, estimate) scp pairs with
best-permutation assignment, written one file per metric per speaker
(STOI_spk1, SI_SNR_spk2, ...) plus RESULTS-style means in score.txt.
"""
from __future__ import annotations

import argparse
import logging
from collections import defaultdict
from pathlib import Path


def get_parser():
    p = argparse.ArgumentParser(description="Score separated speech")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ref_scp", action="append", required=True,
                   help="reference wav.scp (repeat per speaker)")
    p.add_argument("--inf_scp", action="append", required=True,
                   help="estimate wav.scp (repeat per speaker)")
    p.add_argument("--key_file", default=None,
                   help="utterance list; defaults to the first ref_scp keys")
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args(argv)
    import numpy as np
    from ..data.fileio import DatadirWriter, load_wav, read_2column_text
    from ..enh.scoring import bss_eval_sources, si_snr, stoi

    if len(args.ref_scp) != len(args.inf_scp):
        raise SystemExit("--ref_scp and --inf_scp counts must match")
    refs = [read_2column_text(f) for f in args.ref_scp]
    infs = [read_2column_text(f) for f in args.inf_scp]
    if args.key_file:
        keys = [line.split(maxsplit=1)[0] for line in
                Path(args.key_file).read_text().splitlines() if line.strip()]
    else:
        keys = list(refs[0].keys())
    n_spk = len(refs)
    sums = defaultdict(float)
    n_scored = 0
    with DatadirWriter(args.output_dir) as w:
        for key in keys:
            missing = [i for i, d in enumerate(refs + infs) if key not in d]
            if missing:
                # A failed separation job leaves holes; report and keep
                # scoring the rest instead of aborting with partial files.
                logging.warning("skipping %s: missing from scp #%s", key,
                                missing)
                continue
            n_scored += 1
            ref_audio, fs = [], 16000
            for r in refs:
                wav, fs = load_wav(r[key])
                ref_audio.append(wav)
            inf_audio = []
            for e in infs:
                wav, _ = load_wav(e[key])
                inf_audio.append(wav)
            n = min(min(len(a) for a in ref_audio),
                    min(len(a) for a in inf_audio))
            ref = np.stack([a[:n] for a in ref_audio])
            inf = np.stack([a[:n] for a in inf_audio])
            sdr, sir, sar, perm = bss_eval_sources(ref, inf)
            for i in range(n_spk):
                e = inf[int(perm[i])]
                vals = {
                    "STOI": stoi(ref[i], e, fs) * 100.0,
                    "ESTOI": stoi(ref[i], e, fs, extended=True) * 100.0,
                    "SI_SNR": si_snr(e, ref[i]),
                    "SDR": float(sdr[i]),
                    "SAR": float(sar[i]),
                    "SIR": float(sir[i]),
                }
                for name, v in vals.items():
                    w[f"{name}_spk{i + 1}"][key] = str(v)
                    sums[f"{name}_spk{i + 1}"] += v
                w[f"wav_spk{i + 1}"][key] = infs[int(perm[i])][key]
    with open(Path(args.output_dir) / "score.txt", "w") as f:
        for name in sorted(sums):
            mean = sums[name] / max(n_scored, 1)
            f.write(f"{name} {mean:.4f}\n")
            logging.info("%s mean = %.4f", name, mean)
    if n_scored < len(keys):
        logging.warning("scored %d/%d keys", n_scored, len(keys))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
