"""Dump the train step's biggest HLO buffers + per-op HBM traffic estimate."""
import sys
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
    from perf_probe import build
    step, state, batch = build(0.1, 64, 15, 64)
    lowered = step.lower(state, batch) if hasattr(step, "lower") else None
    if lowered is None:
        import jax
        step = jax.jit(step)
        lowered = step.lower(state, batch)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print("argument bytes: %.2f GB" % (ma.argument_size_in_bytes / 1e9))
    print("output bytes:   %.2f GB" % (ma.output_size_in_bytes / 1e9))
    print("temp bytes:     %.2f GB" % (ma.temp_size_in_bytes / 1e9))
    print("peak bytes:     %.2f GB" % (
        (ma.argument_size_in_bytes + ma.output_size_in_bytes +
         ma.temp_size_in_bytes) / 1e9))
    # Cost analysis: flops + bytes accessed.
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("flops: %.2f T" % (ca.get("flops", 0) / 1e12))
    print("bytes accessed: %.2f GB" % (ca.get("bytes accessed", 0) / 1e9))
    for k, v in sorted(ca.items(), key=lambda kv: -abs(kv[1]))[:20]:
        if k.startswith("bytes accessed") and v > 1e8:
            print("  %s: %.2f GB" % (k, v / 1e9))
    # Top buffer allocations from the HLO buffer assignment.
    txt = compiled.as_text()
    import re
    allocs = []
    for m in re.finditer(r"allocation \d+: size (\d+)", txt):
        allocs.append(int(m.group(1)))
    if allocs:
        allocs.sort(reverse=True)
        print("top allocations (MB):", [round(a / 1e6, 1) for a in allocs[:15]])


if __name__ == "__main__":
    main()
