"""Data pipeline tests: fileio, tokenizers, samplers, collate, mini corpus."""
import numpy as np
import pytest

from espnet_slurp_tpu.data import (
    CharTokenizer, CommonPreprocessor, DatadirWriter, SpeechDataset,
    TokenIDConverter, WordTokenizer, build_batches, build_token_list,
    bucket_length, common_collate, epoch_shuffle, load_wav,
    read_2column_text, shard_batches, write_wav,
)
from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus


def test_wav_roundtrip(tmp_path):
    wav = np.sin(np.linspace(0, 100, 1600)).astype(np.float32) * 0.5
    p = str(tmp_path / "a.wav")
    write_wav(p, wav, 16000)
    out, sr = load_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(out, wav, atol=1e-4)


def test_datadir_writer(tmp_path):
    with DatadirWriter(tmp_path / "d") as w:
        w["text"]["b"] = "hello"
        w["text"]["a"] = "world"
    m = read_2column_text(tmp_path / "d" / "text")
    assert m == {"a": "world", "b": "hello"}
    assert list(m) == ["a", "b"]  # sorted


def test_char_tokenizer():
    tok = CharTokenizer()
    toks = tok.text2tokens("ab c")
    assert toks == ["a", "b", "<space>", "c"]
    assert tok.tokens2text(toks) == "ab c"


def test_token_id_converter_roundtrip():
    tl = build_token_list(["hello world", "foo"], WordTokenizer())
    conv = TokenIDConverter(tl)
    assert tl[0] == "<blank>" and tl[-1] == "<sos/eos>"
    ids = conv.tokens2ids(["hello", "foo"])
    assert conv.ids2tokens(ids) == ["hello", "foo"]
    # unknown maps to <unk>
    assert conv.tokens2ids(["zzz"]) == [conv.token2id["<unk>"]]


def test_bpe_tokenizer(tmp_path):
    from espnet_slurp_tpu.data import BpeTokenizer
    texts = ["the quick brown fox", "the lazy dog", "quick quick fox"] * 10
    tok = BpeTokenizer.train(texts, vocab_size=50,
                             out_path=str(tmp_path / "bpe.json"))
    toks = tok.text2tokens("the quick fox")
    assert len(toks) >= 3
    assert tok.tokens2text(toks) == "the quick fox"


def test_build_batches_numel_and_shard():
    shapes = [{f"u{i}": (100 + 10 * i,) for i in range(10)}]
    batches = build_batches(shapes, batch_type="numel", batch_bins=800,
                            min_batch_size=2)
    all_utts = sorted(u for b in batches for u in b)
    assert all_utts == sorted(shapes[0])
    # each batch's padded numel stays near budget
    for b in batches[:-1]:
        first = max(shapes[0][u][0] for u in b)
        assert len(b) * first <= 1000
    sharded = shard_batches([["a", "b", "c", "d"]], rank=1, world=2)
    assert sharded == [["b", "d"]]
    s0 = epoch_shuffle(batches, seed=0, epoch=1)
    s1 = epoch_shuffle(batches, seed=0, epoch=1)
    assert s0 == s1


def test_bucket_length():
    assert bucket_length(100, 64) % 64 == 0
    assert bucket_length(100, 64) >= 100
    # bounded number of buckets up to 100k
    buckets = {bucket_length(n, 640) for n in range(1, 100000, 137)}
    assert len(buckets) < 30


def test_collate_bucketing():
    items = [
        ("a", {"speech": np.ones(1000, np.float32),
               "text": np.array([1, 2, 3])}),
        ("b", {"speech": np.ones(500, np.float32),
               "text": np.array([4])}),
    ]
    uids, out = common_collate(items, bucket_multiples={"speech": 640,
                                                        "text": 8})
    assert uids == ["a", "b"]
    assert out["speech"].shape[1] % 640 == 0
    assert out["speech"].shape[1] >= 1000
    assert out["text"].shape[1] % 8 == 0
    np.testing.assert_array_equal(out["speech_lengths"], [1000, 500])
    np.testing.assert_array_equal(out["text_lengths"], [3, 1])
    assert out["text"][1, 1] == -1  # int pad


def test_mini_corpus_and_dataset(tmp_path):
    train_dir, dev_dir = make_mini_corpus(tmp_path, n_train=6, n_dev=2)
    texts = read_2column_text(train_dir / "text")
    assert len(texts) == 6
    tok = WordTokenizer()
    tl = build_token_list(texts.values(), tok)
    conv = TokenIDConverter(tl)
    pre = CommonPreprocessor(tok, conv)
    ds = SpeechDataset(
        [(str(train_dir / "wav.scp"), "speech", "sound"),
         (str(train_dir / "text"), "text", "text")],
        preprocess=pre)
    uid, data = ds[0]
    assert data["speech"].dtype == np.float32
    assert data["speech"].ndim == 1 and len(data["speech"]) > 1000
    assert data["text"].dtype == np.int64
    assert (data["text"] > 0).all()


def test_rare_word_wer():
    from espnet_slurp_tpu.utils.metrics import rare_word_error_rate
    refs = {"a": "play zelda now", "b": "call bob"}
    hyps = {"a": "play zebra now", "b": "call bob"}
    rare_wer, common_wer, rs, cs = rare_word_error_rate(
        refs, hyps, rare_words={"zelda", "bob"})
    assert rare_wer == 0.5  # zelda wrong, bob right
    assert common_wer == 0.0
    assert rs.substitutions == 1 and rs.hits == 1


def test_phoneme_tokenizer(tmp_path):
    from espnet_slurp_tpu.data.tokenizer import (PhonemeTokenizer,
                                                 build_tokenizer)
    lex = tmp_path / "lexicon.txt"
    lex.write_text("hello HH AH L OW\nworld W ER L D\n")
    tok = PhonemeTokenizer(lexicon=str(lex))
    assert tok.text2tokens("hello world") == \
        ["HH", "AH", "L", "OW", "W", "ER", "L", "D"]
    # case-insensitive lexicon lookup + letter fallback for OOV
    assert tok.text2tokens("Hello zz") == ["HH", "AH", "L", "OW", "z", "z"]
    # word separator insertion
    tok2 = PhonemeTokenizer(lexicon=str(lex), word_separator="<space>")
    assert tok2.text2tokens("hello world")[4] == "<space>"
    # factory path
    t3 = build_tokenizer("phn", g2p_lexicon=str(lex))
    assert t3.text2tokens("world") == ["W", "ER", "L", "D"]


def test_detect_non_silence_and_volume_normalize():
    import numpy as np
    from espnet_slurp_tpu.data.dataset import (CommonPreprocessor,
                                               detect_non_silence)
    rng = np.random.RandomState(0)
    x = np.zeros(8000, np.float32)
    x[2000:4000] = rng.randn(2000).astype(np.float32)  # speech burst
    vad = detect_non_silence(x)
    assert vad.shape == x.shape
    # the speech burst is detected, leading silence is not
    assert vad[2500:3500].mean() > 0.9
    assert vad[:1000].mean() < 0.2
    pre = CommonPreprocessor(speech_volume_normalize=0.5)
    out = pre("u0", {"speech": x * 3.0})
    assert abs(float(np.abs(out["speech"]).max()) - 0.5) < 1e-3


def test_rand_loader_types(tmp_path):
    from espnet_slurp_tpu.data.dataset import SpeechDataset
    shp = tmp_path / "shape"
    shp.write_text("u1 5,3\nu2 4,3\n")
    ds = SpeechDataset([(str(shp), "feat", "rand_float"),
                        (str(shp), "lab", "rand_int_0_9")])
    uid, d = ds["u1"]
    assert d["feat"].shape == (5, 3) and d["feat"].dtype == np.float32
    assert d["lab"].shape == (5, 3)
    assert d["lab"].min() >= 0 and d["lab"].max() <= 9
    # deterministic per uid
    _, d2 = ds["u1"]
    np.testing.assert_array_equal(d["feat"], d2["feat"])


def test_tokenize_and_split_clis(tmp_path):
    from espnet_slurp_tpu.bin import split_scps, tokenize_text
    src = tmp_path / "text"
    src.write_text("u1 hello world\nu2 foo\n")
    out = tmp_path / "tok.txt"
    tokenize_text.main(["--input", str(src), "--output", str(out),
                        "--token_type", "char", "--write_vocabulary"])
    lines = out.read_text().splitlines()
    assert lines[0].startswith("u1 h e l l o")
    assert (tmp_path / "tok.txt.vocab").exists()
    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"u{i} /x/{i}.wav\n" for i in range(5)))
    split_scps.main(["--scps", str(scp), "--num_splits", "3",
                     "--output_dir", str(tmp_path / "sp")])
    n = sum(len((tmp_path / "sp" / "split3" / str(i) / "wav.scp")
                .read_text().splitlines()) for i in range(3))
    assert n == 5


def test_data_json_convert_cli(tmp_path):
    """espnet1 data.json migration (utils/data2json.sh manifest shape)."""
    import json
    from espnet_slurp_tpu.bin import data_json_convert
    manifest = {"utts": {
        "u1": {"input": [{"name": "input1", "feat": "/d/a.wav",
                          "shape": [16000]}],
               "output": [{"name": "target1", "text": "hi there"}],
               "utt2spk": "s1", "orig_text": "hi there"},
        "u2": {"input": [{"name": "input1",
                          "feat": "/d/feats.ark:123", "shape": [50, 80]}],
               "output": [{"name": "target1", "text": "bye"}]},
    }}
    j = tmp_path / "data.json"
    j.write_text(json.dumps(manifest))
    out = tmp_path / "dd"
    data_json_convert.main(["--json", str(j), "--output_dir", str(out)])
    # mixed: one audio path forces wav.scp naming
    text = dict(l.split(" ", 1) for l in
                (out / "text").read_text().splitlines())
    assert text == {"u1": "hi there", "u2": "bye"}
    assert (out / "transcript").exists()
    shape = (out / "speech_shape").read_text()
    assert "u2 50,80" in shape


def test_numeric_text_loader_types(tmp_path):
    from espnet_slurp_tpu.data.dataset import SpeechDataset
    (tmp_path / "ti").write_text("u1 1 2 3\n")
    (tmp_path / "tf").write_text("u1 0.5 1.5\n")
    (tmp_path / "ci").write_text("u1 4,5,6\n")
    (tmp_path / "cf").write_text("u1 0.25,0.75\n")
    ds = SpeechDataset([(str(tmp_path / "ti"), "a", "text_int"),
                        (str(tmp_path / "tf"), "b", "text_float"),
                        (str(tmp_path / "ci"), "c", "csv_int"),
                        (str(tmp_path / "cf"), "d", "csv_float"),
                        (str(tmp_path / "ti"), "e", "duration")])
    _, d = ds["u1"]
    np.testing.assert_array_equal(d["a"], [1, 2, 3])
    np.testing.assert_allclose(d["b"], [0.5, 1.5])
    np.testing.assert_array_equal(d["c"], [4, 5, 6])
    np.testing.assert_allclose(d["d"], [0.25, 0.75])
    np.testing.assert_array_equal(d["e"], [1, 2, 3])
    assert d["a"].dtype == np.int64 and d["d"].dtype == np.float32


def test_batch_size_multiple_buckets_numel_batches():
    """batch_size_multiple rounds numel-packed batch sizes down to the
    multiple, carrying tails forward; nothing is dropped, order stays
    descending, and only the last batch may be ragged (bounds XLA
    recompile count — data/sampler.py _apply_batch_multiple)."""
    from espnet_slurp_tpu.data.sampler import build_batches
    rng = np.random.RandomState(0)
    shapes = [{f"u{i:03d}": (int(rng.randint(50, 400)),)
               for i in range(137)}]
    base = build_batches(shapes, batch_type="numel", batch_bins=3000)
    got = build_batches(shapes, batch_type="numel", batch_bins=3000,
                        batch_size_multiple=8)
    # every batch except the last is a multiple of 8
    assert all(len(b) % 8 == 0 for b in got[:-1])
    # same utterances overall, each exactly once
    flat_base = [u for b in base for u in b]
    flat_got = [u for b in got for u in b]
    assert sorted(flat_base) == sorted(flat_got)
    # global descending length order preserved
    lens = [shapes[0][u][0] for u in flat_got]
    assert lens == sorted(lens, reverse=True)
    # distinct batch sizes collapse to far fewer values
    assert len({len(b) for b in got}) <= len({len(b) for b in base})
