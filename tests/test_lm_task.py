"""LM task + collect-stats + LM shallow-fusion tests."""
import numpy as np
import jax.numpy as jnp
import pytest


def _write_text(path, lines):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for i, line in enumerate(lines):
            f.write(f"utt{i:03d} {line}\n")


def test_lm_task_train_and_ppl(tmp_path):
    from espnet_slurp_tpu.models.lm import LMConfig
    from espnet_slurp_tpu.tasks.lm import LMDataConfig, LMTask, LMTaskConfig
    from espnet_slurp_tpu.train.optim import OptimConfig

    lines = ["hello world", "hello there", "world of speech"] * 4
    _write_text(tmp_path / "train_text", lines)
    _write_text(tmp_path / "valid_text", ["hello world", "world of speech"])
    cfg = LMTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=LMConfig(arch="transformer", d_model=16, n_head=2, d_ff=32,
                       num_blocks=1),
        optim=OptimConfig(lr=1e-2, scheduler="constant"),
        data=LMDataConfig(train_text=str(tmp_path / "train_text"),
                          valid_text=str(tmp_path / "valid_text"),
                          token_type="word", batch_size=4),
        max_epoch=3, keep_nbest=2)
    LMTask.train(cfg)
    ppl = LMTask.perplexity(cfg.exp_dir, str(tmp_path / "valid_text"))
    assert np.isfinite(ppl) and ppl > 1.0
    # The model should have learned something vs uniform (~vocab size).
    assert ppl < 10.0


def test_lm_fusion_in_beam_search(tmp_path):
    """Beam search accepts the LM shallow-fusion hooks end to end."""
    import jax
    from espnet_slurp_tpu.decode.beam import (BeamSearchConfig,
                                              batch_beam_search)
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.models.lm import LMConfig, TransformerLM
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.lm import make_lm_fusion

    cfg = ASRConfig(vocab_size=20, d_model=32, n_head=2, d_ff=64,
                    num_encoder_blocks=1, num_decoder_blocks=1,
                    decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
                    ctc_weight=0.0,
                    frontend=FrontendConfig(n_fft=128, hop_length=64,
                                            n_mels=16),
                    specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[1, 2, 3]]), "text_lengths": jnp.asarray([3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))

    lm = TransformerLM(LMConfig(vocab_size=20, d_model=16, n_head=2,
                                d_ff=32, num_blocks=1))
    lm_params = lm.init(jax.random.PRNGKey(1), batch["text"],
                        batch["text_lengths"])["params"]
    max_len = 6
    lm_step, lm_init = make_lm_fusion(lm, lm_params, 3, max_len)
    bs_cfg = BeamSearchConfig(beam_size=3, pre_beam_size=8, max_len=max_len,
                              ctc_weight=0.0, lm_weight=0.3)
    tokens, lengths = batch_beam_search(model, params, hs, h_lengths, bs_cfg,
                                        lm_step=lm_step, lm_init=lm_init)
    assert tokens.shape == (1, max_len)


def test_collect_stats(tmp_path):
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.ops.normalize import global_mvn_params
    from espnet_slurp_tpu.train.collect_stats import collect_stats

    fc = FrontendConfig(n_fft=128, hop_length=64, n_mels=16)
    rng = np.random.RandomState(0)

    def batches():
        for i in range(3):
            yield {"speech": jnp.asarray(
                       rng.randn(2, 1600).astype(np.float32)),
                   "speech_lengths": jnp.asarray([1600, 800]),
                   "uids": [f"a{i}", f"b{i}"]}

    stats = collect_stats(batches(), fc, tmp_path / "stats")
    assert (tmp_path / "stats" / "feats_stats.npz").exists()
    assert (tmp_path / "stats" / "speech_shape").exists()
    mean, inv_std = global_mvn_params(str(tmp_path / "stats" /
                                          "feats_stats.npz"))
    assert mean.shape == (16,)
    assert np.isfinite(mean).all() and np.isfinite(inv_std).all()
    assert int(stats["count"]) == 3 * (26 + 13)


def test_speech2text_with_lm_fusion(tmp_path):
    """Speech2Text wires a trained LM into beam search end to end."""
    import dataclasses
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.data.fileio import load_wav, read_2column_text
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.models.lm import LMConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.asr import (ASRTask, ASRTaskConfig,
                                            DataConfig, Speech2Text)
    from espnet_slurp_tpu.tasks.lm import LMDataConfig, LMTask, LMTaskConfig
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=6, n_dev=2)
    asr_cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "asr"),
        model=ASRConfig(d_model=32, n_head=2, d_ff=64,
                        num_encoder_blocks=1, num_decoder_blocks=1,
                        decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
                        ctc_weight=0.3,
                        frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                n_mels=16),
                        specaug=None),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=6,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    ASRTask.train(asr_cfg)
    # LM trained on the SAME token list (copy tokens.txt so ids align).
    lm_dir = tmp_path / "lm"
    lm_dir.mkdir()
    (lm_dir / "tokens.txt").write_text(
        (tmp_path / "asr" / "tokens.txt").read_text())
    lm_cfg = LMTaskConfig(
        exp_dir=str(lm_dir),
        model=LMConfig(d_model=16, n_head=2, d_ff=32, num_blocks=1),
        optim=OptimConfig(lr=1e-2, scheduler="constant"),
        data=LMDataConfig(train_text=str(train_dir / "text"),
                          valid_text=str(dev_dir / "text"),
                          token_type="word", batch_size=4),
        max_epoch=1, keep_nbest=1)
    LMTask.train(lm_cfg)

    s2t = Speech2Text(str(tmp_path / "asr"), beam_size=3, ctc_weight=0.3,
                      max_len=8, lm_exp_dir=str(lm_dir), lm_weight=0.3)
    wavs = read_2column_text(dev_dir / "wav.scp")
    wav, _ = load_wav(next(iter(wavs.values())))
    out = s2t(wav)
    assert isinstance(out, str)


def test_attention_harvest(tmp_path):
    """calculate_all_attentions analogue: sown attention maps collected."""
    import jax
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.train.attention_plot import (
        calculate_all_attentions, plot_attentions)

    cfg = ASRConfig(vocab_size=20, d_model=32, n_head=2, d_ff=64,
                    num_encoder_blocks=1, num_decoder_blocks=1,
                    decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
                    encoder="transformer",
                    frontend=FrontendConfig(n_fft=128, hop_length=64,
                                            n_mels=16),
                    specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32)),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[1, 2]]), "text_lengths": jnp.asarray([2]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    atts = calculate_all_attentions(model, params, batch)
    assert len(atts) >= 1  # transformer encoder sows attention
    paths = plot_attentions(atts, tmp_path / "plots")
    assert len(paths) >= 1


@pytest.mark.slow
def test_fusion_weight_sweep_no_retrace(tmp_path):
    """set_fusion_weights sweeps reuse ONE compiled decode program and
    match a fresh Speech2Text constructed at the same weights.

    The weights are traced inputs of the jitted decode (tasks/asr.py
    _build_decode): a Python-float weight would recompile every bucket
    shape per sweep point over the remote-TPU transport."""
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.data.fileio import load_wav, read_2column_text
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.models.lm import LMConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.asr import (ASRTask, ASRTaskConfig,
                                            DataConfig, Speech2Text)
    from espnet_slurp_tpu.tasks.lm import LMDataConfig, LMTask, LMTaskConfig
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=6, n_dev=2)
    asr_cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "asr"),
        model=ASRConfig(d_model=32, n_head=2, d_ff=64,
                        num_encoder_blocks=1, num_decoder_blocks=1,
                        decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
                        ctc_weight=0.3,
                        frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                n_mels=16),
                        specaug=None),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=6,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    ASRTask.train(asr_cfg)
    lm_dir = tmp_path / "lm"
    lm_dir.mkdir()
    (lm_dir / "tokens.txt").write_text(
        (tmp_path / "asr" / "tokens.txt").read_text())
    lm_cfg = LMTaskConfig(
        exp_dir=str(lm_dir),
        model=LMConfig(d_model=16, n_head=2, d_ff=32, num_blocks=1),
        optim=OptimConfig(lr=1e-2, scheduler="constant"),
        data=LMDataConfig(train_text=str(train_dir / "text"),
                          valid_text=str(dev_dir / "text"),
                          token_type="word", batch_size=4),
        max_epoch=1, keep_nbest=1)
    LMTask.train(lm_cfg)

    wavs = read_2column_text(dev_dir / "wav.scp")
    wav, _ = load_wav(next(iter(wavs.values())))

    sweep = Speech2Text(str(tmp_path / "asr"), beam_size=3, ctc_weight=0.3,
                        max_len=8, lm_exp_dir=str(lm_dir), lm_weight=0.1,
                        sweep_fusion=True)
    outs = {}
    for w, ilm in ((0.1, 0.0), (0.5, 0.0), (0.5, 0.2)):
        sweep.set_fusion_weights(lm_weight=w, ilm_weight=ilm)
        outs[(w, ilm)] = sweep(wav)
    # one trace for the whole sweep
    assert sweep._decode_jit._cache_size() == 1

    for (w, ilm), txt in outs.items():
        fresh = Speech2Text(str(tmp_path / "asr"), beam_size=3,
                            ctc_weight=0.3, max_len=8,
                            lm_exp_dir=str(lm_dir), lm_weight=w,
                            sweep_fusion=True, ilm_weight=ilm)
        assert fresh(wav) == txt, (w, ilm)
