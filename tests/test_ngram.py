"""ARPA n-gram fusion tests (KenLM-replacement scorer, decode/ngram.py)
against a direct python backoff evaluator."""
import math

import numpy as np
import jax.numpy as jnp

from espnet_slurp_tpu.decode.ngram import ArpaLM, make_ngram_fusion

ARPA = """\
\\data\\
ngram 1=5
ngram 2=4
ngram 3=2

\\1-grams:
-1.0\t<s>\t-0.30103
-0.60206\ta\t-0.15
-0.69897\tb\t-0.2
-1.30103\tc\t0.0
-1.0\t</s>

\\2-grams:
-0.30103\t<s> a\t-0.1
-0.52\ta b\t-0.05
-0.7\tb a\t0.0
-0.9\tb c

\\3-grams:
-0.2\t<s> a b
-0.4\ta b c

\\end\\
"""

TOK = {"<s>": 4, "</s>": 4, "a": 1, "b": 2, "c": 3}
V = 5
L10 = math.log(10.0)


def py_score(c1, c2, w, lm_raw):
    uni, uni_bo, bi, bi_bo, tri = lm_raw
    if (c1, c2, w) in tri:
        return tri[(c1, c2, w)]
    p = bi_bo.get((c1, c2), 0.0)
    if (c2, w) in bi:
        return p + bi[(c2, w)]
    return p + uni_bo.get(c2, 0.0) + uni.get(w, math.log(1e-10))


def _raw_tables():
    uni = {4: -1.0 * L10, 1: -0.60206 * L10, 2: -0.69897 * L10,
           3: -1.30103 * L10}
    # </s> and <s> share id 4; the later unigram (-1.0 </s>) overwrites —
    # same value here by construction.
    uni_bo = {4: -0.30103 * L10, 1: -0.15 * L10, 2: -0.2 * L10, 3: 0.0}
    bi = {(4, 1): -0.30103 * L10, (1, 2): -0.52 * L10, (2, 1): -0.7 * L10,
          (2, 3): -0.9 * L10}
    bi_bo = {(4, 1): -0.1 * L10, (1, 2): -0.05 * L10}
    tri = {(4, 1, 2): -0.2 * L10, (1, 2, 3): -0.4 * L10}
    return uni, uni_bo, bi, bi_bo, tri


def test_ngram_rows_match_python(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    lm = ArpaLM(str(p), TOK, V)
    step, init = make_ngram_fusion(lm, sos_id=4)
    raw = _raw_tables()

    state = init(3)
    # histories: (<s>, a), (a, b), (b, c)  — fed as successive y_prev
    contexts = [(4, 1), (1, 2), (2, 3)]
    y = jnp.asarray([c2 for _, c2 in contexts])
    state = {"c1": jnp.asarray([c1 for c1, _ in contexts]),
             "c2": jnp.asarray([0, 0, 0])}
    logp, _ = step(y, {"c1": state["c2"], "c2": state["c1"]})
    # direct call shape check
    assert logp.shape == (3, V)
    # score each context exactly
    for i, (c1, c2) in enumerate(contexts):
        row, _ = step(jnp.asarray([c2]),
                      {"c1": jnp.asarray([0]), "c2": jnp.asarray([c1])})
        for w in range(1, 4):
            want = py_score(c1, c2, w, raw)
            got = float(row[0, w])
            assert abs(got - want) < 1e-4, (c1, c2, w, got, want)


def test_ngram_beam_fusion_runs():
    """Hooks drive the batched beam search end-to-end."""
    import jax
    from espnet_slurp_tpu.decode.beam import (BeamSearchConfig,
                                              batch_beam_search)
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "lm.arpa"
        p.write_text(ARPA)
        lm = ArpaLM(str(p), TOK, 5)
    cfg = ASRConfig(vocab_size=5, d_model=32, n_head=2, d_ff=64,
                    num_encoder_blocks=1, num_decoder_blocks=1,
                    decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
                    ctc_weight=0.0,
                    frontend=FrontendConfig(n_fft=128, hop_length=64,
                                            n_mels=16), specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {"speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32)),
             "speech_lengths": jnp.asarray([1600]),
             "text": jnp.asarray([[1, 2]]), "text_lengths": jnp.asarray([2])}
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    hs, hl, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    lm_step, lm_init = make_ngram_fusion(lm, sos_id=cfg.sos_id)
    toks, lens = batch_beam_search(
        model, params, hs, hl,
        BeamSearchConfig(beam_size=2, pre_beam_size=5, max_len=4,
                         ctc_weight=0.0, lm_weight=0.5),
        lm_step=lm_step, lm_init=lm_init)
    assert toks.shape == (1, 4)


def test_ngram_binary_cache_roundtrip(tmp_path):
    """save_binary/load_binary (kenlm build_binary analogue) is exact, and
    gzip ARPA input reads transparently."""
    import gzip

    p = tmp_path / "lm.arpa.gz"
    with gzip.open(p, "wt") as f:
        f.write(ARPA)
    lm = ArpaLM(str(p), TOK, V)
    binp = tmp_path / "lm.npz"
    lm.save_binary(str(binp))
    lm2 = ArpaLM.load_binary(str(binp))
    lm3 = ArpaLM(str(binp), TOK, V)  # path-based dispatch in __init__
    for src in (lm2, lm3):
        assert src.v == lm.v and src.max_row == lm.max_row
        for k in ("uni", "uni_bo", "bi_ctx", "bi_w", "bi_lp", "tri_ctx",
                  "tri_w", "tri_lp", "bi_bo_key", "bi_bo"):
            np.testing.assert_array_equal(getattr(src, k), getattr(lm, k))
    step, init = make_ngram_fusion(lm, sos_id=4)
    step2, init2 = make_ngram_fusion(lm2, sos_id=4)
    st, st2 = init(2), init2(2)
    y = jnp.asarray([1, 2])
    row, _ = step(y, st)
    row2, _ = step2(y, st2)
    np.testing.assert_allclose(np.asarray(row), np.asarray(row2))


def test_ngram_compile_cli(tmp_path):
    from espnet_slurp_tpu.bin import ngram_compile

    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(["<blank>", "a", "b", "c", "<sos/eos>"]))
    out = tmp_path / "lm.npz"
    ngram_compile.main(["--arpa", str(arpa), "--tokens", str(tokens),
                        "--output", str(out)])
    lm = ArpaLM.load_binary(str(out))
    assert lm.v == 5
    # unigram for 'a' present at id 1
    assert abs(lm.uni[1] - (-0.60206 * L10)) < 1e-4


def test_ngram_training_normalizes(tmp_path):
    """In-framework lmplz analogue: the written ARPA, read back through the
    scorer, gives per-context distributions that sum to ~1 and prefer the
    training bigrams."""
    from espnet_slurp_tpu.decode.ngram_train import (train_arpa,
                                                     train_arpa_from_file)

    sents = [["a", "b", "c"], ["a", "b", "a"], ["b", "c", "a"],
             ["a", "c"], ["c", "b", "a", "b"]] * 3
    p = tmp_path / "lm.arpa"
    train_arpa(sents, p, order=3, discount=0.4)

    # score through the runtime scorer
    vocab = {"a": 1, "b": 2, "c": 3, "<s>": 4, "</s>": 4}
    lm = ArpaLM(str(p), vocab, 5)
    step, init = make_ngram_fusion(lm, sos_id=4)
    st = init(1)
    row, st = step(jnp.asarray([4]), st)   # context (<s>)
    probs = np.exp(np.asarray(row[0]))
    # ids 1..4 cover a/b/c/</s>: total mass ~1 minus the dropped <unk>
    assert 0.8 < probs[1:].sum() < 1.001
    # 'a' is the most common sentence starter
    assert probs[1] == probs[1:4].max()
    row2, _ = step(jnp.asarray([1]), st)   # context (<s>, a)
    probs2 = np.exp(np.asarray(row2[0]))
    assert 0.8 < probs2[1:].sum() < 1.001
    assert probs2[2] > probs2[3]           # 'a b' dominates 'a c'

    # file-level entry point
    txt = tmp_path / "text"
    txt.write_text("u1 a b c\nu2 a b a\n")
    train_arpa_from_file(str(txt), str(tmp_path / "lm2.arpa"), order=2)
    lm2 = ArpaLM(str(tmp_path / "lm2.arpa"), vocab, 5)
    assert lm2.uni[1] > lm2.uni[3]  # 'a' more frequent than 'c'
