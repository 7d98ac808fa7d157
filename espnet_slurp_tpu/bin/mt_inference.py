"""MT inference CLI: translate a src_text file."""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Text translation decode")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--max_len", type=int, default=32)
    args = p.parse_args(argv)
    from ..data.fileio import DatadirWriter, read_2column_text
    from ..tasks.mt import Text2Text
    t2t = Text2Text(args.exp_dir, ckpt_name=args.ckpt, max_len=args.max_len)
    srcs = read_2column_text(Path(args.data_dir) / "src_text")
    with DatadirWriter(args.output_dir) as w:
        for uid, src in srcs.items():
            w["text"][uid] = t2t(src)
    logging.info("translated %d lines -> %s", len(srcs), args.output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
