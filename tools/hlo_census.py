"""Aggregate optimized-HLO output-buffer bytes by op kind (traffic proxy)."""
import re
import sys
from collections import Counter

import numpy as np

DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1,
      "f16": 2, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2, "c64": 8}


def shape_bytes(s):
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", s):
        dt, dims = m.group(1), m.group(2)
        if dt not in DT:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT[dt]
    return total


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_default_prng_impl", "rbg")
    sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
    from perf_probe import build
    step, state, batch = build(0.1, 64, 15, 64)
    compiled = step.lower(state, batch).compile()
    txt = compiled.as_text()
    by_kind = Counter()
    biggest = []
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (.+?) ([\w\-]+)\(", line)
        if not m:
            continue
        shape, op = m.group(1), m.group(2)
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast", "copy", "while", "conditional", "call"):
            continue
        b = shape_bytes(shape)
        by_kind[op] += b
        if b > 50e6:
            biggest.append((b, op, shape[:90], line[:40]))
    print("== output bytes by op kind (GB) ==")
    for k, v in by_kind.most_common(25):
        print(f"  {k:28s} {v/1e9:8.2f}")
    print("== individual outputs > 50 MB ==")
    biggest.sort(reverse=True)
    for b, op, shape, name in biggest[:40]:
        print(f"  {b/1e6:9.1f} MB  {op:20s} {shape}")


if __name__ == "__main__":
    main()
