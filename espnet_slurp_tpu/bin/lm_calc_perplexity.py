"""LM perplexity CLI (reference espnet2/bin/lm_calc_perplexity.py analogue)."""
import argparse

from ..tasks.lm import LMTask


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--ckpt", default=None)
    args = p.parse_args(argv)
    ppl = LMTask.perplexity(args.exp_dir, args.text, args.ckpt)
    print(f"perplexity: {ppl:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
