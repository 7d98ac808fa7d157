"""SVS tests: XiaoiceSing forward/inference, RNN variant, task e2e CLIs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.tts.svs import SVSConfig, XiaoiceSing

MICRO_FRONTEND = FrontendConfig(n_fft=128, hop_length=64, n_mels=16)


def _micro_cfg(**kw):
    return SVSConfig(vocab_size=12, midi_dim=16, tempo_dim=8, d_model=32,
                     n_head=2, d_ff=64, enc_blocks=1, dec_blocks=1,
                     var_channels=16, var_layers=1, postnet_layers=2,
                     postnet_channels=16, rnn_hidden=16,
                     frontend=MICRO_FRONTEND, max_frames=64, **kw)


def _score_batch(rng, b=2, l=6, n=3200):
    return {
        "label": jnp.asarray(rng.randint(1, 12, (b, l)), jnp.int32),
        "label_lengths": jnp.asarray([l, l - 2], jnp.int32),
        "midi": jnp.asarray(rng.randint(0, 16, (b, l)), jnp.int32),
        "tempo": jnp.asarray(rng.randint(0, 8, (b, l)), jnp.int32),
        "durations": jnp.full((b, l), 8, jnp.int32),
        "speech": jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([n, n - 640], jnp.int32),
    }


@pytest.mark.parametrize("enc", ["transformer", "rnn"])
def test_svs_trains_and_infers(enc):
    cfg = _micro_cfg(encoder_type=enc)
    model = XiaoiceSing(cfg)
    rng = np.random.RandomState(0)
    batch = _score_batch(rng)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"l1_loss", "duration_loss"} <= set(stats)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    mel, flens = model.apply(
        {"params": params}, batch["label"], batch["label_lengths"],
        batch["midi"], batch["tempo"], 1.0,
        method=lambda m, a, b, c, d, s: m.inference(a, b, c, d, s))
    assert mel.shape == (2, cfg.max_frames, cfg.n_mels)
    assert int(flens[0]) > 0


def test_svs_task_e2e(tmp_path):
    from espnet_slurp_tpu.bin import svs_inference, svs_train
    from espnet_slurp_tpu.data.fileio import write_wav
    rng = np.random.RandomState(1)
    for split, n_utt in (("train", 8), ("dev", 2)):
        d = tmp_path / split
        d.mkdir(parents=True, exist_ok=True)
        scps = {k: [] for k in ("wav", "label", "midi", "tempo", "duration")}
        for i in range(n_utt):
            t = np.arange(3200) / 16000.0
            freq = 200 + 50 * (i % 4)
            wav = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
            write_wav(str(d / f"u{i}.wav"), wav)
            l = 5
            scps["wav"].append(f"u{i} {d}/u{i}.wav")
            scps["label"].append(
                f"u{i} " + " ".join(str(rng.randint(1, 12))
                                    for _ in range(l)))
            scps["midi"].append(
                f"u{i} " + " ".join(str(rng.randint(0, 16))
                                    for _ in range(l)))
            scps["tempo"].append(
                f"u{i} " + " ".join(str(rng.randint(0, 8))
                                    for _ in range(l)))
            scps["duration"].append(f"u{i} " + " ".join("10" for _ in
                                                        range(l)))
        for k, lines in scps.items():
            (d / f"{k}.scp").write_text("\n".join(lines) + "\n")
    exp = tmp_path / "exp"
    svs_train.main([
        "--set", f"exp_dir={exp}", f"train_dir={tmp_path/'train'}",
        f"valid_dir={tmp_path/'dev'}", "run.max_epoch=1",
        "run.nbest_average=1", "batch_size=4",
        "model.vocab_size=12", "model.midi_dim=16", "model.tempo_dim=8",
        "model.d_model=32", "model.n_head=2", "model.d_ff=64",
        "model.enc_blocks=1", "model.dec_blocks=1", "model.var_channels=16",
        "model.var_layers=1", "model.postnet_layers=2",
        "model.postnet_channels=16", "model.max_frames=64",
        "model.frontend.n_fft=128", "model.frontend.hop_length=64",
        "model.frontend.n_mels=16", "speech_bucket_multiple=2048"])
    import json
    hist = json.loads((exp / "reporter.json").read_text())["history"]
    assert hist and np.isfinite(hist[-1]["train"]["loss"])
    svs_inference.main(["--exp_dir", str(exp), "--data_dir",
                        str(tmp_path / "dev"), "--output_dir",
                        str(tmp_path / "syn")])
    assert (tmp_path / "syn" / "mel" / "u0.npy").exists()
    assert (tmp_path / "syn" / "wav" / "u0.wav").exists()
