"""Serving export: jax.export StableHLO artifact round trip (bin/export_model)."""
import numpy as np
import jax.numpy as jnp


def test_export_and_reload_decodes(tmp_path):
    from espnet_slurp_tpu.bin.export_model import (export_speech2text,
                                                   load_exported)
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.asr import ASRTask, ASRTaskConfig, DataConfig
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=4, n_dev=2)
    cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=ASRConfig(d_model=32, n_head=2, d_ff=64,
                        num_encoder_blocks=1, num_decoder_blocks=1,
                        frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                n_mels=16),
                        specaug=None, use_mvn="none"),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=4,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    ASRTask.train(cfg)

    out = export_speech2text(cfg.exp_dir, str(tmp_path / "served"),
                             batch=2, num_samples=4096, beam_size=1,
                             max_len=8)
    assert (out / "model.stablehlo").exists()
    call, tokens, meta = load_exported(str(out))
    rng = np.random.RandomState(0)
    speech = jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.1)
    lens = jnp.asarray([4096, 3000], jnp.int32)
    toks, tlens = call(speech, lens)
    assert toks.shape == (2, 8)
    assert (np.asarray(tlens) <= 8).all()
    assert len(tokens) > 4  # token list shipped with the artifact
