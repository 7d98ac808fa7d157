"""VC training CLI (espnet1 vc_train.py analogue)."""
from __future__ import annotations

import argparse
import logging

from ..tasks.vc import VCTask, load_vc_config
from .asr_train import parse_overrides


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Train VC (TPU-native)")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", dest="overrides")
    args = p.parse_args(argv)
    VCTask.train(load_vc_config(args.config, parse_overrides(args.overrides)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
