"""hubert training CLI (reference espnet2/bin/hubert_train.py analogue)."""
from __future__ import annotations

import argparse
import logging

from ..tasks.hubert import load_hubert_config
from ..tasks.hubert import HubertTask
from .asr_train import parse_overrides


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Train hubert (TPU-native)")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", dest="overrides")
    args = p.parse_args(argv)
    cfg = load_hubert_config(args.config, parse_overrides(args.overrides))
    HubertTask.train(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
