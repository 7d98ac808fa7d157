"""Tokenize a text file (reference espnet2/bin/tokenize_text.py analogue).

Reads '<uid> <sentence>' lines (or raw sentences with --no_uid), writes
tokenized lines, and optionally a vocabulary with counts.
"""
from __future__ import annotations

import argparse
import sys
from collections import Counter


def main(argv=None):
    p = argparse.ArgumentParser(description="Tokenize text (TPU-native)")
    p.add_argument("--input", required=True, help="'-' for stdin")
    p.add_argument("--output", required=True, help="'-' for stdout")
    p.add_argument("--token_type", default="char",
                   choices=["char", "word", "bpe", "phn"])
    p.add_argument("--bpemodel", default=None)
    p.add_argument("--no_uid", action="store_true",
                   help="lines are raw sentences without a leading uid")
    p.add_argument("--write_vocabulary", action="store_true")
    p.add_argument("--vocabulary_output", default=None)
    p.add_argument("--cutoff", type=int, default=0,
                   help="drop tokens with count <= cutoff from the vocab")
    args = p.parse_args(argv)
    from ..data.tokenizer import build_tokenizer
    tok = build_tokenizer(args.token_type, bpemodel=args.bpemodel)
    fin = sys.stdin if args.input == "-" else open(args.input,
                                                   encoding="utf-8")
    fout = sys.stdout if args.output == "-" else open(args.output, "w",
                                                      encoding="utf-8")
    counts = Counter()
    with fin, fout:
        for line in fin:
            line = line.rstrip("\n")
            if not line:
                continue
            if args.no_uid:
                uid, text = None, line
            else:
                parts = line.split(maxsplit=1)
                uid, text = parts[0], parts[1] if len(parts) > 1 else ""
            tokens = tok.text2tokens(text)
            counts.update(tokens)
            prefix = f"{uid} " if uid is not None else ""
            fout.write(prefix + " ".join(tokens) + "\n")
    if args.write_vocabulary:
        out = args.vocabulary_output or (args.output + ".vocab")
        with open(out, "w", encoding="utf-8") as f:
            for t, c in counts.most_common():
                if c > args.cutoff:
                    f.write(f"{t}\t{c}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
