"""Split scp files into N parallel shards (espnet2/bin/split_scps.py
analogue) — the recipe decode stage fans utterances over jobs with this.
Writes <output_dir>/split<N>/<i>/<name> plus num_splits."""
from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description="Split scps (TPU-native)")
    p.add_argument("--scps", nargs="+", required=True)
    p.add_argument("--num_splits", type=int, required=True)
    p.add_argument("--names", nargs="+", default=None)
    p.add_argument("--output_dir", required=True)
    args = p.parse_args(argv)
    if args.num_splits < 2:
        raise SystemExit("num_splits must be >= 2")
    names = args.names or [Path(s).name for s in args.scps]
    if len(set(names)) != len(names):
        raise SystemExit(f"duplicated names: {names}")
    out = Path(args.output_dir)
    handles = []
    for i in range(args.num_splits):
        d = out / f"split{args.num_splits}" / str(i)
        d.mkdir(parents=True, exist_ok=True)
        handles.append([open(d / n, "w", encoding="utf-8") for n in names])
    try:
        for j, scp in enumerate(args.scps):
            with open(scp, encoding="utf-8") as f:
                for k, line in enumerate(f):
                    handles[k % args.num_splits][j].write(line)
    finally:
        for hs in handles:
            for h in hs:
                h.close()
    (out / f"split{args.num_splits}" / "num_splits").write_text(
        str(args.num_splits))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
