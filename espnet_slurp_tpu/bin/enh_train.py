"""enh training CLI (reference espnet2/bin/enh_train.py analogue)."""
from __future__ import annotations

import argparse
import logging

from ..tasks.enh import load_enh_config
from ..tasks.enh import EnhTask
from .asr_train import parse_overrides


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Train enh (TPU-native)")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", dest="overrides")
    args = p.parse_args(argv)
    cfg = load_enh_config(args.config, parse_overrides(args.overrides))
    EnhTask.train(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
