"""Tests: pack/unpack CLI, aggregate_stats_dirs CLI, HF vocab export CLI."""
import json

import numpy as np
import pytest


def test_aggregate_stats_dirs(tmp_path):
    from espnet_slurp_tpu.bin.aggregate_stats_dirs import main as cli_main
    d1, d2 = tmp_path / "s1", tmp_path / "s2"
    for d, utts, count in ((d1, ["a", "b"], 10), (d2, ["c"], 5)):
        d.mkdir()
        (d / "speech_shape").write_text(
            "".join(f"{u} {i + 3},16\n" for i, u in enumerate(utts)))
        np.savez(d / "feats_stats.npz", count=np.asarray(count),
                 sum=np.full((16,), float(count)),
                 sum_square=np.full((16,), 2.0 * count))
    out = tmp_path / "agg"
    rc = cli_main(["--input_dir", str(d1), "--input_dir", str(d2),
                   "--output_dir", str(out)])
    assert rc == 0
    lines = (out / "speech_shape").read_text().splitlines()
    assert [ln.split()[0] for ln in lines] == ["a", "b", "c"]
    stats = np.load(out / "feats_stats.npz")
    assert int(stats["count"]) == 15
    np.testing.assert_allclose(stats["sum"], np.full((16,), 15.0))


def test_pack_unpack_cli(tmp_path):
    from espnet_slurp_tpu.bin.pack import main as cli_main
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "config.yaml").write_text("exp_dir: x\n")
    (exp / "tokens.txt").write_text("<blank>\na\n")
    best = exp / "valid.loss.ave_2best"
    best.mkdir()
    (best / "params.bin").write_bytes(b"\x00\x01")
    archive = tmp_path / "model.zip"
    assert cli_main(["pack", "--exp_dir", str(exp),
                     "--out", str(archive)]) == 0
    assert archive.exists()
    out = tmp_path / "unpacked"
    assert cli_main(["unpack", "--archive", str(archive),
                     "--out_dir", str(out)]) == 0
    assert (out / "config.yaml").exists()
    assert (out / "tokens.txt").read_text() == "<blank>\na\n"
    assert (out / "valid.loss.ave_2best" / "params.bin").exists()


def test_hf_export_vocabulary(tmp_path):
    transformers = pytest.importorskip("transformers")
    tokenizers = pytest.importorskip("tokenizers")
    from espnet_slurp_tpu.bin.hugging_face_export_vocabulary import (
        main as cli_main)
    # Build a tiny local tokenizer dir (no network), AutoTokenizer-loadable.
    from tokenizers import Tokenizer, models, trainers, pre_tokenizers
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(vocab_size=40, special_tokens=["<unk>"])
    tok.train_from_iterator(["hello world", "speech on tpu"], trainer)
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    tok.save(str(tok_dir / "tokenizer.json"))
    (tok_dir / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "PreTrainedTokenizerFast"}))
    out = tmp_path / "tokens.txt"
    rc = cli_main(["--output", str(out),
                   "--model_name_or_path", str(tok_dir),
                   "--add_symbol", "<blank>:0", "--add_symbol", "<eos>:-1"])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "<blank>"
    assert lines[-1] == "<eos>"
    assert "<unk>" in lines

def test_publish_fetch_zoo(tmp_path):
    """Stage-16 analogue: pack -> publish to the local zoo -> fetch by name
    (sha256-verified) -> self-contained dir; corrupted archives refuse."""
    from espnet_slurp_tpu.bin.pack import main as cli_main
    exp = tmp_path / "exp"
    exp.mkdir()
    (exp / "config.yaml").write_text("exp_dir: x\n")
    (exp / "tokens.txt").write_text("<blank>\na\n")
    archive = tmp_path / "model.zip"
    assert cli_main(["pack", "--exp_dir", str(exp),
                     "--out", str(archive)]) == 0
    zoo = tmp_path / "zoo"
    assert cli_main(["publish", "--archive", str(archive),
                     "--name", "demo_asr", "--zoo_dir", str(zoo)]) == 0
    idx = json.loads((zoo / "index.json").read_text())
    assert "demo_asr" in idx and len(idx["demo_asr"]["sha256"]) == 64
    out = tmp_path / "fetched"
    assert cli_main(["fetch", "--name", "demo_asr",
                     "--out_dir", str(out), "--zoo_dir", str(zoo)]) == 0
    assert (out / "tokens.txt").read_text() == "<blank>\na\n"
    # tamper -> sha mismatch refuses
    from espnet_slurp_tpu.recipe.asr_pipeline import fetch
    (zoo / "demo_asr.zip").write_bytes(b"corrupt")
    with pytest.raises(ValueError, match="sha256 mismatch"):
        fetch("demo_asr", tmp_path / "f2", zoo)
    with pytest.raises(KeyError):
        fetch("nope", tmp_path / "f3", zoo)
