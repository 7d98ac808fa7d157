"""Model packaging CLI.

Parity target: reference espnet2/bin/pack.py (zip config + token list +
best checkpoint for distribution; unpacked archives are loadable by the
inference wrappers via exp_dir). Fronts recipe/asr_pipeline.py pack/unpack.
"""
from __future__ import annotations

import argparse
import logging


def get_parser():
    p = argparse.ArgumentParser(description="Pack/unpack a trained exp dir")
    sub = p.add_subparsers(dest="mode", required=True)
    pk = sub.add_parser("pack", help="exp dir -> zip archive")
    pk.add_argument("--exp_dir", required=True)
    pk.add_argument("--out", required=True, help="output .zip path")
    up = sub.add_parser("unpack", help="zip archive -> exp dir")
    up.add_argument("--archive", required=True)
    up.add_argument("--out_dir", required=True)
    pb = sub.add_parser("publish",
                        help="archive -> local model zoo (stage-16 "
                             "upload analogue, no egress)")
    pb.add_argument("--archive", required=True)
    pb.add_argument("--name", required=True)
    pb.add_argument("--zoo_dir", default=None)
    ft = sub.add_parser("fetch",
                        help="zoo name -> decodable exp dir "
                             "(from_pretrained analogue)")
    ft.add_argument("--name", required=True)
    ft.add_argument("--out_dir", required=True)
    ft.add_argument("--zoo_dir", default=None)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args(argv)
    from ..recipe.asr_pipeline import fetch, pack, publish, unpack
    if args.mode == "pack":
        out = pack(args.exp_dir, args.out)
        logging.info("packed %s -> %s", args.exp_dir, out)
    elif args.mode == "unpack":
        out = unpack(args.archive, args.out_dir)
        logging.info("unpacked %s -> %s", args.archive, out)
    elif args.mode == "publish":
        out = publish(args.archive, args.name, args.zoo_dir)
        logging.info("published %s as %r -> %s", args.archive, args.name,
                     out)
    else:
        out = fetch(args.name, args.out_dir, args.zoo_dir)
        logging.info("fetched %r -> %s", args.name, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
