"""Error-rate scoring (WER/CER) — the sclite/sctk replacement.

Parity target: stage-13 scoring in egs2/TEMPLATE/asr1/asr.sh:1276-1396 (sclite
alignment + WER) and the fork's rare-word scorer espnet/nets/pytorch_backend/
KB_utils/wer.py. Pure-python Levenshtein with alignment counts.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple


@dataclass
class ErrorStats:
    hits: int = 0
    substitutions: int = 0
    deletions: int = 0
    insertions: int = 0

    @property
    def ref_len(self) -> int:
        return self.hits + self.substitutions + self.deletions

    @property
    def errors(self) -> int:
        return self.substitutions + self.deletions + self.insertions

    @property
    def error_rate(self) -> float:
        return self.errors / max(self.ref_len, 1)

    def __add__(self, other: "ErrorStats") -> "ErrorStats":
        return ErrorStats(self.hits + other.hits,
                          self.substitutions + other.substitutions,
                          self.deletions + other.deletions,
                          self.insertions + other.insertions)


def align_stats(ref: Sequence, hyp: Sequence) -> ErrorStats:
    """Levenshtein alignment counts between token sequences."""
    n, m = len(ref), len(hyp)
    # dp[i][j] = (cost, hits, subs, dels, ins)
    INF = 10**9
    prev = [(j, 0, 0, 0, j) for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [(i, 0, 0, i, 0)] + [None] * m
        for j in range(1, m + 1):
            # substitution / hit
            c, h, s, d, ins = prev[j - 1]
            if ref[i - 1] == hyp[j - 1]:
                best = (c, h + 1, s, d, ins)
            else:
                best = (c + 1, h, s + 1, d, ins)
            # deletion
            c, h, s, d, ins = prev[j]
            if c + 1 < best[0]:
                best = (c + 1, h, s, d + 1, ins)
            # insertion
            c, h, s, d, ins = cur[j - 1]
            if c + 1 < best[0]:
                best = (c + 1, h, s, d, ins + 1)
            cur[j] = best
        prev = cur
    _, h, s, d, ins = prev[m]
    return ErrorStats(h, s, d, ins)


def error_rate(refs: Dict[str, str], hyps: Dict[str, str],
               unit: str = "word") -> Tuple[float, ErrorStats]:
    """Corpus WER (unit='word') or CER (unit='char').

    Fast path: the native C++ batch scorer (native/edit_distance.cpp, the
    sclite-analogue hot loop) with identical tie-breaking; falls back to
    the python DP when the toolchain is unavailable.
    """
    pairs = []
    for uid, ref in refs.items():
        hyp = hyps.get(uid, "")
        if unit == "word":
            pairs.append((ref.split(), hyp.split()))
        else:
            pairs.append((list(ref.replace(" ", "")),
                          list(hyp.replace(" ", ""))))
    # Tokens -> ids for the int-based native kernel.
    from ..native import edit_stats_batch
    vocab: Dict[str, int] = {}

    def ids(tokens):
        return [vocab.setdefault(t, len(vocab)) for t in tokens]

    stats = edit_stats_batch([ids(r) for r, _ in pairs],
                             [ids(h) for _, h in pairs]) \
        if pairs else None
    total = ErrorStats()
    if stats is not None:
        for h, s, d, i in stats:
            total = total + ErrorStats(int(h), int(s), int(d), int(i))
    else:
        for r, h in pairs:
            total = total + align_stats(r, h)
    return total.error_rate, total


def rare_word_error_rate(refs: Dict[str, str], hyps: Dict[str, str],
                         rare_words) -> Tuple[float, float, ErrorStats,
                                              ErrorStats]:
    """WER split into rare (biasing-list) vs common words.

    Parity target: the fork's rare-word scorer
    espnet/nets/pytorch_backend/KB_utils/wer.py (197 LoC): aligns ref/hyp,
    then attributes each ref-word slot to the rare or common bucket.
    Returns (rare_wer, common_wer, rare_stats, common_stats).
    """
    rare_set = set(rare_words)
    rare = ErrorStats()
    common = ErrorStats()
    for uid, ref in refs.items():
        r = ref.split()
        h = hyps.get(uid, "").split()
        # alignment backtrace
        n, m = len(r), len(h)
        dp = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(n + 1):
            dp[i][0] = i
        for j in range(m + 1):
            dp[0][j] = j
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dp[i][j] = min(
                    dp[i - 1][j - 1] + (r[i - 1] != h[j - 1]),
                    dp[i - 1][j] + 1, dp[i][j - 1] + 1)
        i, j = n, m
        while i > 0 or j > 0:
            if i > 0 and j > 0 and \
                    dp[i][j] == dp[i - 1][j - 1] + (r[i - 1] != h[j - 1]):
                bucket = rare if r[i - 1] in rare_set else common
                if r[i - 1] == h[j - 1]:
                    bucket.hits += 1
                else:
                    bucket.substitutions += 1
                i, j = i - 1, j - 1
            elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
                bucket = rare if r[i - 1] in rare_set else common
                bucket.deletions += 1
                i -= 1
            else:
                common.insertions += 1
                j -= 1
    return rare.error_rate, common.error_rate, rare, common


def corpus_bleu(refs: Dict[str, str], hyps: Dict[str, str],
                max_n: int = 4) -> float:
    """Corpus-level BLEU in [0, 100] (sacrebleu analogue, host-side).

    Parity target: the reference's ST scoring stage (st.sh stage 13 scores
    hypotheses with sacrebleu, an external dep); standard BLEU-4: geometric
    mean of clipped n-gram precisions (n=1..max_n) with sacrebleu's default
    exponential smoothing (Chen & Cherry method 3: each zero-match order k
    contributes p_n = 1/(2^invcnt * total_n), invcnt doubling per zero
    order — small corpora with no 4-gram matches score small-positive, not
    hard 0) and the brevity penalty exp(1 - ref_len/hyp_len) for
    hyp_len < ref_len.
    """
    import math
    from collections import Counter

    match = [0] * max_n
    total = [0] * max_n
    hyp_len = 0
    ref_len = 0
    for uid, ref in refs.items():
        r = ref.split()
        h = hyps.get(uid, "").split()
        hyp_len += len(h)
        ref_len += len(r)
        for n in range(1, max_n + 1):
            h_ngrams = Counter(tuple(h[i:i + n])
                               for i in range(len(h) - n + 1))
            r_ngrams = Counter(tuple(r[i:i + n])
                               for i in range(len(r) - n + 1))
            overlap = sum(min(c, r_ngrams[g]) for g, c in h_ngrams.items())
            match[n - 1] += overlap
            total[n - 1] += max(len(h) - n + 1, 0)
    if hyp_len == 0 or total[0] == 0 or match[0] == 0:
        return 0.0
    log_p = 0.0
    invcnt = 1.0
    for n in range(max_n):
        if total[n] == 0:
            return 0.0
        if match[n] == 0:
            invcnt *= 2.0
            p = 1.0 / (invcnt * total[n])
        else:
            p = match[n] / total[n]
        log_p += math.log(p)
    log_p /= max_n
    bp = 1.0 if hyp_len >= ref_len else math.exp(1.0 - ref_len / hyp_len)
    return 100.0 * bp * math.exp(log_p)
