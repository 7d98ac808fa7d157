"""MaskCTC tests: training loss + mask-predict decode."""
import numpy as np
import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.asr_model import ASRConfig
from espnet_slurp_tpu.models.maskctc import MaskCTCModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig

CFG = ASRConfig(
    vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
    num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
    ctc_weight=0.3,
    frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
    specaug=None)


def test_maskctc_train_and_decode():
    model = MaskCTCModel(CFG)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 18, size=(2, 5))),
        "text_lengths": jnp.asarray([5, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch,
                        mask_rng=jax.random.PRNGKey(1))["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch,
                           mask_rng=jax.random.PRNGKey(1))

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"loss_ctc", "loss_mlm", "acc_mlm"} <= set(stats)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))

    tokens, lengths = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"], 8, 2,
        method=lambda m, s, sl, ml, it: m.decode(s, sl, max_len=ml,
                                                 n_iterations=it))
    assert tokens.shape == (2, 8)
    assert (np.asarray(lengths) <= 8).all()
    # no mask tokens remain
    assert not (np.asarray(tokens) == CFG.vocab_size - 1).any()


def test_maskctc_task_train_and_cli(tmp_path):
    """model_arch=maskctc end-to-end: task train -> inference CLI."""
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.tasks.asr import (ASRTask, ASRTaskConfig,
                                            DataConfig, Speech2TextMaskCTC)
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "corpus",
                                          n_train=8, n_dev=3)
    exp = tmp_path / "exp"
    cfg = ASRTaskConfig(
        exp_dir=str(exp), model_arch="maskctc",
        model=CFG,
        optim=OptimConfig(lr=1e-3, scheduler="constant", grad_clip=5.0),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted",
                        batch_size=4, speech_bucket_multiple=2048,
                        text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1, log_interval=10)
    state = ASRTask.train(cfg)
    assert int(state.step) > 0

    s2t = Speech2TextMaskCTC(str(exp), max_len=8, n_iterations=2)
    from espnet_slurp_tpu.data.fileio import load_wav, read_2column_text
    wavs = read_2column_text(dev_dir / "wav.scp")
    wav, _ = load_wav(next(iter(wavs.values())))
    out = s2t(wav)
    assert isinstance(out, str)

    from espnet_slurp_tpu.bin.asr_inference_maskctc import main as cli_main
    rc = cli_main(["--exp_dir", str(exp), "--data_dir", str(dev_dir),
                   "--output_dir", str(tmp_path / "decode"),
                   "--max_len", "8", "--n_iterations", "2",
                   "--batch_size", "3"])
    assert rc == 0
    assert (tmp_path / "decode" / "text").exists()
    assert (tmp_path / "decode" / "score.txt").exists()
