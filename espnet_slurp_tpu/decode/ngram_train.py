"""N-gram LM estimation -> ARPA (KenLM lmplz analogue, orders 1-3).

Parity target: the reference's asr.sh stage 9 trains a KenLM n-gram
(tools/installers/install_kenlm.sh; scorers/ngram.py consumes it). Here
the counts and smoothing are in-framework so the recipe has no external
binary: absolute discounting with properly normalized Katz-style backoff
weights,

    p(w | ctx)  = (c(ctx, w) - D) / c(ctx)          for seen n-grams
    bo(ctx)     = [D * N1+(ctx) / c(ctx)] / [1 - sum_{w seen} p'(w|ctx')]

so every context's distribution sums to one (pinned by the test through
the decode/ngram.py scorer). Host-side pure python — LM estimation is a
one-off recipe stage, not a training hot path.
"""
from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Tuple

BOS, EOS = "<s>", "</s>"
LOG10 = math.log(10.0)


def train_ngram(sentences: Iterable[List[str]], order: int = 3,
                discount: float = 0.7) -> Dict[int, Dict[Tuple[str, ...],
                                                          Tuple[float, float]]]:
    """-> {n: {ngram_tuple: (log10 p, log10 backoff)}} (ARPA layout)."""
    assert 1 <= order <= 3
    counts = [Counter() for _ in range(order + 1)]  # counts[n]
    for toks in sentences:
        seq = [BOS] + list(toks) + [EOS]
        for n in range(1, order + 1):
            for i in range(len(seq) - n + 1):
                if n == 1 and seq[i] == BOS:
                    continue  # <s> is context-only at order 1
                counts[n][tuple(seq[i:i + n])] += 1
    counts[1][(BOS,)] = 0  # listed with prob ~0, used as context

    # context totals + distinct-continuation counts
    ctx_total = [defaultdict(int) for _ in range(order + 1)]
    ctx_types = [defaultdict(int) for _ in range(order + 1)]
    for n in range(1, order + 1):
        for ng, c in counts[n].items():
            ctx_total[n][ng[:-1]] += c
            ctx_types[n][ng[:-1]] += 1

    tables: Dict[int, Dict[Tuple[str, ...], Tuple[float, float]]] = {}
    # unigrams: ML with a floor (discounting at order 1 adds little here)
    uni_total = sum(c for ng, c in counts[1].items())
    tables[1] = {}
    for ng, c in counts[1].items():
        p = max(c, 0.5) / max(uni_total, 1)
        tables[1][ng] = [math.log10(p), 0.0]

    def prob(n, ng):
        """Smoothed p(w | ctx) at order n with recursive backoff."""
        if n == 1:
            return 10.0 ** tables[1].get(ng[-1:], [-9.0, 0.0])[0]
        ctx = ng[:-1]
        c = counts[n].get(ng, 0)
        tot = ctx_total[n].get(ctx, 0)
        if tot == 0:
            return prob(n - 1, ng[1:])
        if c > 0:
            return (c - discount) / tot + _bo_mass(n, ctx) * prob(n - 1,
                                                                  ng[1:])
        return _bo_mass(n, ctx) * prob(n - 1, ng[1:])

    def _bo_mass(n, ctx):
        tot = ctx_total[n].get(ctx, 0)
        if tot == 0:
            return 1.0
        return discount * ctx_types[n].get(ctx, 0) / tot

    # ARPA-style backoff form: p_arpa(w|ctx) for seen = interpolated prob;
    # bo(ctx) scaled so the unseen mass routed through the lower order
    # normalizes exactly.
    for n in range(2, order + 1):
        tables[n] = {}
        for ng, c in counts[n].items():
            tables[n][ng] = [math.log10(max(prob(n, ng), 1e-12)), 0.0]
        # attach backoff weights to (n-1)-gram CONTEXT entries
        for ctx in ctx_total[n]:
            seen = [ng for ng in counts[n] if ng[:-1] == ctx]
            seen_mass = sum(10.0 ** tables[n][ng][0] for ng in seen)
            lower_seen = sum(prob(n - 1, ng[1:]) for ng in seen)
            denom = max(1.0 - lower_seen, 1e-12)
            bo = max(1.0 - seen_mass, 1e-12) / denom
            if ctx in tables[n - 1]:
                tables[n - 1][ctx][1] = math.log10(max(bo, 1e-12))
    return {n: {k: (v[0], v[1]) for k, v in t.items()}
            for n, t in tables.items()}


def write_arpa(tables, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for n in sorted(tables):
            f.write(f"ngram {n}={len(tables[n])}\n")
        f.write("\n")
        for n in sorted(tables):
            f.write(f"\\{n}-grams:\n")
            for ng in sorted(tables[n]):
                lp, bo = tables[n][ng]
                line = f"{lp:.6f}\t{' '.join(ng)}"
                if bo != 0.0:
                    line += f"\t{bo:.6f}"
                f.write(line + "\n")
            f.write("\n")
        f.write("\\end\\\n")


def train_arpa_file(text_path: str, out_path: str, order: int = 3,
                    discount: float = 0.7) -> None:
    """'<uid> sentence' lines -> ARPA file."""
    sents = []
    with open(text_path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) > 1:
                sents.append(parts[1:])
    write_arpa(train_ngram(sents, order, discount), out_path)
