"""Text cleaner (espnet2/text/cleaner.py) + enh dynamic mixing
(espnet2/train/preprocessor.py:586-726 DynamicMixingPreprocessor)."""
import numpy as np
import pytest

from espnet_slurp_tpu.data.cleaner import TextCleaner
from espnet_slurp_tpu.data.fileio import write_wav
from espnet_slurp_tpu.enh.mixing import DynamicMixer


def test_tacotron_cleaner_reference_example():
    # the exact example from espnet2/text/cleaner.py:18-22
    c = TextCleaner("tacotron")
    assert c("(Hello-World);   &  jr. & dr.") == \
        "HELLO WORLD, AND JUNIOR AND DOCTOR"


def test_tacotron_cleaner_numbers_and_abbrev_safety():
    c = TextCleaner("tacotron")
    assert c("3 cats") == "THREE CATS"
    assert c("$2.50") == "TWO POINT FIVE ZERO DOLLARS"
    # the abbreviation regex must require the dot: "cold" contains "co"
    assert c("cold co.") == "COLD COMPANY"
    assert c("in 1892") == "IN ONE THOUSAND EIGHT HUNDRED NINETY TWO"


def test_cleaner_chain_and_unknown_type():
    assert TextCleaner(["lowercase", "whitespace"])("  A   B ") == "a b"
    assert TextCleaner("jaconv")("ＡＢＣ１２３") == "ABC123"
    assert TextCleaner(None)("unchanged  text") == "unchanged  text"
    with pytest.raises(ValueError):
        TextCleaner("nope")


def test_cleaner_in_preprocessor():
    from espnet_slurp_tpu.data.dataset import CommonPreprocessor
    from espnet_slurp_tpu.data.tokenizer import (CharTokenizer,
                                                 TokenIDConverter)
    tok = CharTokenizer()
    conv = TokenIDConverter(["<blank>", "<unk>", "A", "B", "<space>"])
    pre = CommonPreprocessor(tok, conv, cleaner=TextCleaner("uppercase"))
    out = pre("u1", {"text": "ab"})
    ids = list(out["text"])
    assert ids == [conv.token2id["A"], conv.token2id["B"]]


@pytest.fixture
def source_corpus(tmp_path):
    """6 single-speaker sources across 3 speakers, varying lengths."""
    rng = np.random.RandomState(0)
    scp, u2s = [], []
    for i in range(6):
        uid, spk = f"utt{i}", f"spk{i % 3}"
        wav = rng.randn(800 + 300 * i).astype(np.float32) * 0.1
        p = tmp_path / f"{uid}.wav"
        write_wav(str(p), wav)
        scp.append(f"{uid} {p}")
        u2s.append(f"{uid} {spk}")
    (tmp_path / "spk1.scp").write_text("\n".join(scp) + "\n")
    (tmp_path / "utt2spk").write_text("\n".join(u2s) + "\n")
    return tmp_path


def test_dynamic_mixer_consistency(source_corpus):
    from espnet_slurp_tpu.data.fileio import load_wav
    mixer = DynamicMixer(str(source_corpus / "spk1.scp"), n_spk=2,
                         gain_db=5.0,
                         utt2spk=str(source_corpus / "utt2spk"), seed=3)
    anchor, _ = load_wav(str(source_corpus / "utt0.wav"))
    out = mixer("utt0", {"spk1": anchor})
    # mixture == sum of emitted references, all reference-length == anchor
    assert set(out) == {"speech_mix", "spk1", "spk2"}
    np.testing.assert_allclose(out["speech_mix"], out["spk1"] + out["spk2"],
                               rtol=1e-5, atol=1e-6)
    assert out["spk1"].shape == out["spk2"].shape == anchor.shape
    # spk1 is the (gained) anchor: collinear with it
    g = out["spk1"][:100] / np.where(np.abs(anchor[:100]) > 1e-8,
                                     anchor[:100], 1.0)
    assert np.ptp(g[np.abs(anchor[:100]) > 1e-8]) < 1e-4


def test_dynamic_mixer_picks_other_speakers(source_corpus):
    from espnet_slurp_tpu.data.fileio import load_wav
    mixer = DynamicMixer(str(source_corpus / "spk1.scp"), n_spk=3,
                         utt2spk=str(source_corpus / "utt2spk"), seed=0)
    # utt0 is spk0; utt0/utt3 share spk0 — interferers must avoid spk0
    for _ in range(5):
        picked = mixer._pick("utt0")
        assert len(picked) == 2
        spks = {mixer.utt2spk[k] for k in picked}
        assert "spk0" not in spks and len(spks) == 2


def test_dynamic_mixing_task_dataset(source_corpus):
    from espnet_slurp_tpu.tasks.enh import EnhTask
    ds = EnhTask.build_dataset(str(source_corpus), n_spk=2,
                               dynamic_mixing=True,
                               utt2spk=str(source_corpus / "utt2spk"))
    uid, data = ds["utt2"]
    assert uid == "utt2"
    np.testing.assert_allclose(data["speech_mix"],
                               data["spk1"] + data["spk2"],
                               rtol=1e-5, atol=1e-6)
