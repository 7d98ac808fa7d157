"""Export a HuggingFace tokenizer vocabulary as a token-list file.

Parity target: reference espnet2/bin/hugging_face_export_vocabulary.py —
dump id-ordered tokens (one per line) with optional inserted symbols
("<blank>:0" style), producing a tokens.txt usable as the task vocabulary
when decoding against an HF-bridged model (models/hf_transformer.py).
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path


def export_vocabulary(output: str, model_name_or_path: str,
                      add_symbol=()) -> int:
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
    vocab = tokenizer.get_vocab()
    words = ["" for _ in range(max(vocab.values()) + 1)]
    for w, i in vocab.items():
        words[i] = w
    for symbol_and_id in add_symbol:
        try:
            symbol, idx = symbol_and_id.rsplit(":", 1)
            idx = int(idx)
        except ValueError:
            raise RuntimeError(
                f"Format error: expected '<blank>:0', got {symbol_and_id}")
        if idx < 0:
            idx = len(words) + 1 + idx
        words.insert(idx, symbol)
    if output == "-":
        fout = sys.stdout
    else:
        p = Path(output)
        p.parent.mkdir(parents=True, exist_ok=True)
        fout = p.open("w", encoding="utf-8")
    for w in words:
        fout.write(w + "\n")
    if output != "-":
        fout.close()
    return len(words)


def get_parser():
    p = argparse.ArgumentParser(
        description="Export an HF tokenizer vocabulary as tokens.txt")
    p.add_argument("--output", required=True, help="path or '-' for stdout")
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--add_symbol", action="append", default=[],
                   help="e.g. '<blank>:0' (repeatable)")
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = get_parser().parse_args(argv)
    n = export_vocabulary(args.output, args.model_name_or_path,
                          args.add_symbol)
    logging.info("wrote %d tokens to %s", n, args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
