"""Convert an espnet1 data.json manifest to this framework's data dirs.

Migration aid for users of the reference fork: espnet1 recipes (incl. the
fork's egs/slurp workbench) store everything in JSON manifests produced by
utils/data2json.sh —

    {"utts": {uid: {"input":  [{"name", "feat", "shape"}, ...],
                    "output": [{"name", "text", "token", "tokenid",
                                "shape"}, ...],
                    "utt2spk": spk, ...fork extras...}}}

This writes the Kaldi-style dir the tasks here consume: feats.scp (or
wav.scp when the feat paths are audio files), text (+ text_2.. for extra
output streams), utt2spk, shape files, and — for the fork's SLU JSONs —
transcript / slots streams when present.
"""
from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="espnet1 data.json -> data dir")
    p.add_argument("--json", required=True)
    p.add_argument("--output_dir", required=True)
    args = p.parse_args(argv)
    utts = json.loads(Path(args.json).read_text())["utts"]
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    feats, shapes, texts, utt2spk, extras = {}, {}, {}, {}, {}
    audio = False
    for uid, ent in sorted(utts.items()):
        ins = ent.get("input", [])
        if ins:
            feat = ins[0].get("feat", "")
            feats[uid] = feat
            audio = audio or feat.endswith((".wav", ".flac", ".sph"))
            shp = ins[0].get("shape")
            if shp:
                shapes[uid] = ",".join(str(int(d)) for d in shp)
        outs = ent.get("output", [])
        if outs:
            texts[uid] = outs[0].get("text", "")
            for k, o in enumerate(outs[1:], start=2):
                extras.setdefault(f"text_{k}", {})[uid] = o.get("text", "")
        if "utt2spk" in ent:
            utt2spk[uid] = ent["utt2spk"]
        # fork SLU extras (CustomConverter payloads, asr.py:349-451)
        for key, fname in (("orig_text", "transcript"),
                           ("transcript", "transcript"),
                           ("slots", "slots"), ("intent", "intent")):
            if key in ent:
                extras.setdefault(fname, {})[uid] = str(ent[key])

    def write(name, mapping):
        if not mapping:
            return
        with open(out / name, "w", encoding="utf-8") as f:
            for uid in sorted(mapping):
                f.write(f"{uid} {mapping[uid]}\n")

    write("wav.scp" if audio else "feats.scp", feats)
    write("text", texts)
    write("utt2spk", utt2spk)
    write("speech_shape", shapes)
    for name, mapping in extras.items():
        write(name, mapping)
    logging.info("converted %d utts (%s input) -> %s", len(utts),
                 "audio" if audio else "kaldi-feat", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
