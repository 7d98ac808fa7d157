"""diar training CLI (reference espnet2/bin/diar_train.py analogue)."""
from __future__ import annotations

import argparse
import logging

from ..tasks.diar import load_diar_config
from ..tasks.diar import DiarTask
from .asr_train import parse_overrides


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Train diar (TPU-native)")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", dest="overrides")
    args = p.parse_args(argv)
    cfg = load_diar_config(args.config, parse_overrides(args.overrides))
    DiarTask.train(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
