"""Enh+ASR joint task tests: model forward/grads, permutation alignment,
task e2e via the real CLIs.

Parity target: reference espnet2/enh/espnet_enh_s2t_model.py +
espnet2/tasks/enh_s2t.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.enh.model import EnhConfig
from espnet_slurp_tpu.models.asr_model import ASRConfig
from espnet_slurp_tpu.models.enh_s2t import EnhS2TConfig, EnhS2TModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig

TINY = EnhS2TConfig(
    enh=EnhConfig(n_spk=2, n_fft=128, hop_length=64, hidden=16,
                  num_layers=1),
    asr=ASRConfig(vocab_size=16, d_model=32, n_head=2, d_ff=64,
                  num_encoder_blocks=1, num_decoder_blocks=1,
                  decoder_d_ff=64, kernel_size=7, ctc_weight=0.3,
                  use_mvn="none", specaug=None,
                  frontend=FrontendConfig(n_fft=128, hop_length=64,
                                          n_mels=16)))


def _batch(rng, with_ref=True):
    s1 = rng.randn(2, 3200).astype(np.float32) * 0.3
    s2 = rng.randn(2, 3200).astype(np.float32) * 0.3
    out = {
        "speech_mix": jnp.asarray(s1 + s2),
        "speech_mix_lengths": jnp.asarray([3200, 2560], jnp.int32),
        "text_spk1": jnp.asarray(rng.randint(1, 15, (2, 4)), jnp.int32),
        "text_spk1_lengths": jnp.asarray([4, 3], jnp.int32),
        "text_spk2": jnp.asarray(rng.randint(1, 15, (2, 4)), jnp.int32),
        "text_spk2_lengths": jnp.asarray([4, 2], jnp.int32),
    }
    if with_ref:
        out["speech_ref"] = jnp.asarray(np.stack([s1, s2], 1))
    return out


@pytest.mark.parametrize("with_ref", [True, False])
def test_enh_s2t_forward_and_grads(with_ref):
    model = EnhS2TModel(TINY)
    rng = np.random.RandomState(0)
    batch = _batch(rng, with_ref)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "asr_loss" in stats
    assert ("enh_loss" in stats) == with_ref
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_enh_s2t_task_e2e(tmp_path):
    from espnet_slurp_tpu.bin import enh_s2t_inference, enh_s2t_train
    from espnet_slurp_tpu.data.fileio import write_wav
    rng = np.random.RandomState(1)
    words = ["alpha", "bravo", "charlie", "delta"]
    for split, n_utt in (("train", 8), ("dev", 2)):
        d = tmp_path / split
        d.mkdir(parents=True, exist_ok=True)
        scp = {k: [] for k in ("wav", "spk1", "spk2", "t1", "t2")}
        for i in range(n_utt):
            t = np.arange(3200) / 16000.0
            a = (0.3 * np.sin(2 * np.pi * (300 + 40 * i) * t)
                 ).astype(np.float32)
            b = (0.3 * np.sin(2 * np.pi * (900 + 40 * i) * t)
                 ).astype(np.float32)
            for name, x in (("mix", a + b), ("s1", a), ("s2", b)):
                write_wav(str(d / f"{name}_{i}.wav"), x)
            scp["wav"].append(f"u{i} {d}/mix_{i}.wav")
            scp["spk1"].append(f"u{i} {d}/s1_{i}.wav")
            scp["spk2"].append(f"u{i} {d}/s2_{i}.wav")
            scp["t1"].append(f"u{i} {words[i % 4]}")
            scp["t2"].append(f"u{i} {words[(i + 1) % 4]}")
        (d / "wav.scp").write_text("\n".join(scp["wav"]) + "\n")
        (d / "spk1.scp").write_text("\n".join(scp["spk1"]) + "\n")
        (d / "spk2.scp").write_text("\n".join(scp["spk2"]) + "\n")
        (d / "text_spk1").write_text("\n".join(scp["t1"]) + "\n")
        (d / "text_spk2").write_text("\n".join(scp["t2"]) + "\n")
    exp = tmp_path / "exp"
    enh_s2t_train.main([
        "--set", f"exp_dir={exp}", f"train_dir={tmp_path/'train'}",
        f"valid_dir={tmp_path/'dev'}", "run.max_epoch=1",
        "run.nbest_average=1", "batch_size=4",
        "model.enh.n_fft=128", "model.enh.hop_length=64",
        "model.enh.hidden=16", "model.enh.num_layers=1",
        "model.asr.d_model=32", "model.asr.n_head=2", "model.asr.d_ff=64",
        "model.asr.num_encoder_blocks=1", "model.asr.num_decoder_blocks=1",
        "model.asr.decoder_d_ff=64", "model.asr.kernel_size=7",
        "model.asr.use_mvn=none", "model.asr.specaug=null",
        "model.asr.frontend.n_fft=128", "model.asr.frontend.hop_length=64",
        "model.asr.frontend.n_mels=16", "speech_bucket_multiple=2048"])
    import json
    hist = json.loads((exp / "reporter.json").read_text())["history"]
    assert hist and np.isfinite(hist[-1]["train"]["loss"])
    assert "enh_loss" in hist[-1]["train"]
    enh_s2t_inference.main(["--exp_dir", str(exp), "--data_dir",
                            str(tmp_path / "dev"), "--output_dir",
                            str(tmp_path / "dec")])
    assert (tmp_path / "dec" / "text_spk1").exists()
    assert (tmp_path / "dec" / "text_spk2").exists()
