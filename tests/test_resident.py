"""Device-resident corpus (data/resident.py): on-device batch gathers must
reproduce the host collate path exactly (int16 wavs round-trip bit-exact)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from espnet_slurp_tpu.data.fileio import read_2column_text  # noqa: E402
from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus  # noqa: E402
from espnet_slurp_tpu.data.resident import ResidentCorpus  # noqa: E402


def test_resident_matches_host_collate(tmp_path):
    train, _ = make_mini_corpus(tmp_path / "corpus", n_train=6, n_dev=2)
    scp = read_2column_text(train / "wav.scp")
    rc = ResidentCorpus(scp, workers=4)
    uids = sorted(scp)[:4]
    from espnet_slurp_tpu.data.fileio import load_wav
    host = [load_wav(scp[u])[0] for u in uids]
    t_pad = -(-(max(len(x) for x in host) + 37) // 128) * 128
    dev, lens = rc.speech(uids, t_pad)
    np.testing.assert_array_equal(lens, [len(x) for x in host])
    got = np.asarray(dev)
    assert got.shape == (4, t_pad)
    for i, x in enumerate(host):
        q = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)
        np.testing.assert_allclose(got[i, :len(x)],
                                   q.astype(np.float32) / 32768.0,
                                   atol=1e-7)
        assert np.all(got[i, len(x):] == 0.0)


def test_resident_rejects_overlong(tmp_path):
    train, _ = make_mini_corpus(tmp_path / "corpus", n_train=3, n_dev=1)
    scp = read_2column_text(train / "wav.scp")
    rc = ResidentCorpus(scp, workers=2)
    uids = sorted(scp)[:2]
    with pytest.raises(ValueError):
        rc.speech(uids, 4)


def test_iter_factory_resident_batches(tmp_path):
    """The ASR iter factory with a materializer yields batches whose speech
    equals the plain host path (and whose text streams are identical)."""
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.tasks.asr import (ASRTask, ASRTaskConfig,
                                            DataConfig)
    train, dev = make_mini_corpus(tmp_path / "corpus", n_train=6, n_dev=2)
    cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=ASRConfig(d_model=16, n_head=2, d_ff=32,
                        num_encoder_blocks=1, num_decoder_blocks=1,
                        use_mvn="none", specaug=None),
        data=DataConfig(train_dir=str(train), valid_dir=str(dev),
                        token_type="word", batch_type="sorted",
                        batch_size=3))
    tokenizer, converter, model_cfg = ASRTask.prepare_vocab(cfg)
    ds = ASRTask.build_dataset(str(train), tokenizer, converter)
    rc = ResidentCorpus.from_datadirs([str(train)])
    plain = list(ASRTask.build_iter_factory(cfg, ds, shuffle=False)(1))
    res = list(ASRTask.build_iter_factory(
        cfg, ds, shuffle=False, speech_materializer=rc.materializer())(1))
    assert len(plain) == len(res)
    for bp, br in zip(plain, res):
        assert set(bp) == set(br)
        np.testing.assert_array_equal(bp["text"], np.asarray(br["text"]))
        np.testing.assert_array_equal(bp["speech_lengths"],
                                      np.asarray(br["speech_lengths"]))
        assert bp["speech"].shape == br["speech"].shape
        np.testing.assert_allclose(np.asarray(br["speech"]), bp["speech"],
                                   atol=1e-6)
