"""Enh+ASR joint training CLI (reference espnet2/bin/enh_s2t_train.py)."""
from __future__ import annotations

import argparse
import logging

from ..tasks.enh_s2t import EnhS2TTask, load_enh_s2t_config
from .asr_train import parse_overrides


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Train Enh+ASR (TPU-native)")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", dest="overrides")
    args = p.parse_args(argv)
    cfg = load_enh_s2t_config(args.config, parse_overrides(args.overrides))
    EnhS2TTask.train(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
