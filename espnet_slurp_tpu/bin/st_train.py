"""st training CLI (reference espnet2/bin/st_train.py analogue)."""
from __future__ import annotations

import argparse
import logging

from ..tasks.st import load_st_config
from ..tasks.st import STTask
from .asr_train import parse_overrides


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Train st (TPU-native)")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", dest="overrides")
    args = p.parse_args(argv)
    cfg = load_st_config(args.config, parse_overrides(args.overrides))
    STTask.train(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
