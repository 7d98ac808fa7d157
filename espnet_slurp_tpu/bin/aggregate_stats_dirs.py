"""Aggregate split collect-stats directories into one.

Parity target: reference espnet2/bin/aggregate_stats_dirs.py — when
collect-stats runs sharded over nj jobs (split_scps), each shard writes its
own {shape files, feats_stats.npz}; this merges them: shape files are
concatenated (key-sorted), stats npz fields (count/sum/sum_square) summed.

Here the stats layout is flat (stats_dir/{feats_stats.npz,speech_shape,...})
rather than the reference's train|valid subdirs; subdirs are handled too if
present.
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def aggregate(input_dirs, output_dir) -> None:
    import numpy as np
    input_dirs = [Path(p) for p in input_dirs]
    out = Path(output_dir)

    def one_level(in_dirs, out_dir):
        out_dir.mkdir(parents=True, exist_ok=True)
        # shape files: any non-npz regular file ending in _shape or named
        # like the DatadirWriter outputs — concatenate key-sorted.
        names = set()
        for d in in_dirs:
            for f in d.iterdir():
                if f.is_file() and not f.name.endswith(".npz"):
                    names.add(f.name)
        for name in sorted(names):
            lines = []
            for d in in_dirs:
                p = d / name
                if p.exists():
                    lines += [ln for ln in
                              p.read_text(encoding="utf-8").splitlines()
                              if ln.strip()]
            lines.sort(key=lambda x: x.split()[0])
            (out_dir / name).write_text("\n".join(lines) + "\n",
                                        encoding="utf-8")
        # npz stats: field-wise sums.
        npz_names = set()
        for d in in_dirs:
            npz_names |= {f.name for f in d.glob("*.npz")}
        for name in sorted(npz_names):
            total = None
            for d in in_dirs:
                p = d / name
                if not p.exists():
                    continue
                stats = dict(np.load(p))
                if total is None:
                    total = stats
                else:
                    for k in stats:
                        total[k] = total[k] + stats[k]
            np.savez(out_dir / name, **total)

    subdirs = [d.name for d in input_dirs[0].iterdir() if d.is_dir()]
    if subdirs:
        for sub in subdirs:
            one_level([d / sub for d in input_dirs if (d / sub).exists()],
                      out / sub)
    if any(f.is_file() for f in input_dirs[0].iterdir()):
        one_level(input_dirs, out)


def get_parser():
    p = argparse.ArgumentParser(
        description="Aggregate collect-stats directories into one")
    p.add_argument("--input_dir", action="append", required=True,
                   help="stats dir (repeatable)")
    p.add_argument("--output_dir", required=True)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args(argv)
    aggregate(args.input_dir, args.output_dir)
    logging.info("aggregated %d dirs -> %s", len(args.input_dir),
                 args.output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
