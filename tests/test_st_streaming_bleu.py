"""Tests: corpus BLEU metric + streaming ST inference CLI."""
import numpy as np
import pytest

from espnet_slurp_tpu.data.fileio import write_wav
from espnet_slurp_tpu.utils.metrics import corpus_bleu


def test_corpus_bleu_perfect_and_degraded():
    refs = {"a": "the cat sat on the mat", "b": "hello world again today"}
    assert corpus_bleu(refs, dict(refs)) == pytest.approx(100.0)
    worse = {"a": "the cat sat on a mat", "b": "hello world again now"}
    mid = corpus_bleu(refs, worse)
    assert 0 < mid < 100
    assert corpus_bleu(refs, {"a": "zzz yyy xxx www", "b": "qq pp"}) == 0.0
    # brevity penalty: a short exact prefix scores below the full match
    short = {"a": "the cat sat on", "b": "hello world again"}
    assert 0 < corpus_bleu(refs, short) < 100


def test_corpus_bleu_empty_hyp():
    assert corpus_bleu({"a": "x y"}, {"a": ""}) == 0.0


def test_st_streaming_cli_e2e(tmp_path):
    from espnet_slurp_tpu.bin import st_inference_streaming, st_train
    rng = np.random.RandomState(3)

    def tone(n, f):
        t = np.arange(n) / 16000.0
        return (0.3 * np.sin(2 * np.pi * f * t)
                + 0.01 * rng.randn(n)).astype(np.float32)

    for split, n_utt in (("train", 6), ("dev", 2)):
        d = tmp_path / split
        d.mkdir(parents=True, exist_ok=True)
        rows_w, rows_t, rows_s = [], [], []
        for i in range(n_utt):
            p = d / f"u{i}.wav"
            write_wav(str(p), tone(3200, 300 + 40 * i))
            rows_w.append(f"u{i} {p}")
            rows_t.append(f"u{i} bonjour le monde {i % 2}")
            rows_s.append(f"u{i} hello the world {i % 2}")
        (d / "wav.scp").write_text("\n".join(rows_w) + "\n")
        (d / "text").write_text("\n".join(rows_t) + "\n")
        (d / "src_text").write_text("\n".join(rows_s) + "\n")
    exp = tmp_path / "exp"
    # chunk_size > 0: streaming-capable encoder (chunk attention + causal
    # convs) so the incremental recognizer is exact.
    st_train.main([
        "--set", f"exp_dir={exp}", f"train_dir={tmp_path/'train'}",
        f"valid_dir={tmp_path/'dev'}", "run.max_epoch=1",
        "run.nbest_average=1", "batch_size=3",
        "model.d_model=32", "model.n_head=2", "model.d_ff=64",
        "model.num_encoder_blocks=1", "model.num_decoder_blocks=1",
        "model.decoder_d_ff=64", "model.kernel_size=7",
        "model.dropout_rate=0.0", "model.specaug=null",
        "model.chunk_size=4", "model.left_chunks=1",
        "model.frontend.n_fft=128", "model.frontend.hop_length=64",
        "model.frontend.n_mels=16", "speech_bucket_multiple=2048"])
    rc = st_inference_streaming.main(
        ["--exp_dir", str(exp), "--data_dir", str(tmp_path / "dev"),
         "--output_dir", str(tmp_path / "dec"),
         "--sim_chunk_length", "1600", "--beam_size", "2",
         "--max_len", "8"])
    assert rc == 0
    assert (tmp_path / "dec" / "text").exists()
    assert "BLEU" in (tmp_path / "dec" / "score.txt").read_text()


def test_corpus_bleu_exp_smoothing_no_4gram():
    """Zero 4-gram matches give a small positive score (sacrebleu's exp
    smoothing), not a hard 0."""
    refs = {"a": "the big cat sat on the mat"}
    hyps = {"a": "the big cat mat on the sat"}  # good 1-2 grams, no 4-gram
    score = corpus_bleu(refs, hyps)
    assert 0.0 < score < 60.0
