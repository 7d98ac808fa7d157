"""Transducer training CLI (reference espnet2/bin/asr_transducer_train.py)."""
from __future__ import annotations

import argparse
import logging

from ..tasks.asr_transducer import ASRTransducerTask, load_transducer_config
from .asr_train import parse_overrides


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Train transducer ASR")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", dest="overrides")
    args = p.parse_args(argv)
    ASRTransducerTask.train(
        load_transducer_config(args.config, parse_overrides(args.overrides)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
