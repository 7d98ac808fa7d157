"""SLU training CLI (reference espnet2/bin/slu_train.py analogue)."""
import argparse
import logging

from ..tasks.slu import SLUTask, load_slu_config
from .asr_train import parse_overrides


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Train SLU (TPU-native)")
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", dest="overrides")
    args = p.parse_args(argv)
    SLUTask.train(load_slu_config(args.config,
                                  parse_overrides(args.overrides)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
