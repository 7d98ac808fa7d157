"""TTS training CLI (reference espnet2/bin/tts_train.py analogue)."""
import argparse
import logging

from ..tasks.tts import TTSTask, load_tts_config
from .asr_train import parse_overrides


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--set", nargs="*", dest="overrides")
    args = p.parse_args(argv)
    TTSTask.train(load_tts_config(args.config,
                                  parse_overrides(args.overrides)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
