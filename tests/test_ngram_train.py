"""In-framework ARPA n-gram training (decode/ngram_train.py).

The emitted model must be a PROPER backoff LM: for any history, the
backed-off distribution over vocab + <unk> sums to 1 (checked with an
independent ARPA-semantics scorer), and it must load + score through the
repo's ArpaLM/make_ngram_fusion decode path (KenLM-lmplz analogue;
reference trains n-grams externally via tools/installers/install_kenlm.sh).
"""
import math

import numpy as np
import pytest

from espnet_slurp_tpu.decode.ngram_train import train_arpa


CORPUS = [
    "the cat sat on the mat".split(),
    "the cat ran".split(),
    "a dog sat on a log".split(),
    "the dog ran fast".split(),
    "a cat and a dog".split(),
]


def _parse_arpa(path):
    tables = {1: {}, 2: {}, 3: {}}
    bo = {1: {}, 2: {}}
    order = 0
    for line in open(path):
        line = line.strip()
        if line.startswith("\\") and "-grams:" in line:
            order = int(line[1])
            continue
        if not line or line.startswith(("\\", "ngram ")):
            continue
        parts = line.split("\t")
        lp = float(parts[0])
        words = tuple(parts[1].split())
        tables[order][words] = lp
        if len(parts) > 2:
            bo[order][words] = float(parts[2])
    return tables, bo


def _score(tables, bo, g):
    """Reference ARPA backoff scorer: log10 p(g[-1] | g[:-1])."""
    if len(g) > 1 and g not in tables[len(g)]:
        return bo[len(g) - 1].get(g[:-1], 0.0) + _score(tables, bo, g[1:])
    if len(g) == 1 and g not in tables[1]:
        g = ("<unk>",)
    return tables[len(g)][g]


@pytest.mark.parametrize("order", [2, 3])
def test_arpa_distributions_sum_to_one(tmp_path, order):
    path = train_arpa(CORPUS, tmp_path / "lm.arpa", order=order)
    tables, bo = _parse_arpa(path)
    vocab = sorted({w for s in CORPUS for w in s}) + ["</s>", "<unk>"]
    hists = [("<s>",), ("the",), ("cat",), ("log",)]
    if order == 3:
        hists += [("<s>", "the"), ("the", "cat"), ("on", "a"),
                  ("fast", "the")]  # unseen bigram history -> pure backoff
    for h in hists:
        tot = sum(10.0 ** _score(tables, bo, h + (w,)) for w in vocab)
        assert tot == pytest.approx(1.0, abs=2e-3), (h, tot)


def test_arpa_orders_sensible(tmp_path):
    path = train_arpa(CORPUS, tmp_path / "lm.arpa", order=3)
    tables, bo = _parse_arpa(path)
    # 'the cat' is frequent; 'the log' unseen -> backoff and smaller
    p_cat = _score(tables, bo, ("the", "cat"))
    p_log = _score(tables, bo, ("the", "log"))
    assert p_cat > p_log
    # trigram memory: 'sat on' -> 'the'/'a' both seen; '<s> the' -> 'cat'
    assert ("sat", "on", "the") in tables[3]
    # <s> carries -99-class logp (never predicted) but has a backoff row
    assert tables[1][("<s>",)] < -90


def test_arpa_loads_into_decoder_scorer(tmp_path):
    import jax.numpy as jnp
    from espnet_slurp_tpu.decode.ngram import ArpaLM, make_ngram_fusion
    path = train_arpa(CORPUS, tmp_path / "lm.arpa", order=3)
    vocab = sorted({w for s in CORPUS for w in s})
    tok2id = {w: i for i, w in enumerate(vocab)}
    sos_id = len(vocab)
    tok2id["<s>"] = sos_id
    tok2id["</s>"] = sos_id  # joint sos/eos id, as asr_inference wires it
    lm = ArpaLM(str(path), tok2id, len(vocab) + 1)
    step, init = make_ngram_fusion(lm, sos_id)
    st = init(1)
    row, st = step(jnp.asarray([tok2id["the"]]), st)
    row = np.asarray(row)[0]
    # p(cat | <s> the) must beat p(log | <s> the) (unseen continuation)
    assert row[tok2id["cat"]] > row[tok2id["log"]]
    # joint sos/eos slot keeps the PREDICTABLE eos probability — <s>'s
    # -99 context-only row must not clobber it (decode/ngram.py loader)
    assert row[sos_id] > math.log(1e-9)
    # the row is a sub-distribution: <= 1, shortfall = the dropped <unk>
    # mass only (large here because the corpus is tiny)
    total = float(np.exp(row).sum())
    assert 0.5 < total <= 1.0 + 1e-3, total
