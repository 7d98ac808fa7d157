"""ASR model forward/backward smoke + data-parallel train-step tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.models import ASRConfig, ASRModel, add_sos_eos
from espnet_slurp_tpu.models.asr_model import label_smoothing_loss
from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.ops.specaug import SpecAugConfig
from espnet_slurp_tpu.parallel.mesh import make_mesh, shard_batch, replicated
from espnet_slurp_tpu.train.optim import OptimConfig, build_optimizer
from espnet_slurp_tpu.train.state import TrainState, make_train_step

TINY = ASRConfig(
    vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=2,
    num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
    ctc_weight=0.3, lsm_weight=0.1,
    frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
    specaug=SpecAugConfig(time_warp_window=2, freq_mask_width_range=(0, 4),
                          time_mask_width_range=(0, 4)),
)


def tiny_batch(b=4, n=1600, u=6, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "speech": jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray(
            np.linspace(n // 2, n, b).astype(np.int32)),
        "text": jnp.asarray(rng.randint(1, 19, size=(b, u))),
        "text_lengths": jnp.asarray(rng.randint(2, u + 1, size=(b,))),
    }


def test_add_sos_eos():
    ys = jnp.asarray([[3, 4, 5], [6, 0, 0]])
    ys_in, ys_out = add_sos_eos(ys, jnp.array([3, 1]), sos=19, eos=19)
    np.testing.assert_array_equal(np.asarray(ys_in),
                                  [[19, 3, 4, 5], [19, 6, 19, 19]])
    np.testing.assert_array_equal(np.asarray(ys_out),
                                  [[3, 4, 5, 19], [6, 19, -1, -1]])


def test_label_smoothing_loss_matches_ce_when_no_smoothing():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 3, 5).astype(np.float32))
    tgt = jnp.asarray([[1, 2, -1], [0, -1, -1]])
    loss, acc = label_smoothing_loss(logits, tgt, smoothing=0.0)
    lp = jax.nn.log_softmax(logits, -1)
    ref = -(lp[0, 0, 1] + lp[0, 1, 2] + lp[1, 0, 0]) / 3
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    assert 0.0 <= float(acc) <= 1.0


def test_model_forward_and_grads():
    model = ASRModel(TINY)
    batch = tiny_batch()
    params = model.init(
        jax.random.PRNGKey(0), batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"])["params"]

    def loss_fn(p):
        loss, stats = model.apply(
            {"params": p}, batch["speech"], batch["speech_lengths"],
            batch["text"], batch["text_lengths"], train=True,
            specaug_rng=jax.random.PRNGKey(1))
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"loss_ctc", "loss_att", "acc", "loss"} <= set(stats)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # Some gradient mass everywhere important.
    gnorm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in leaves)))
    assert gnorm > 0


def test_train_step_decreases_loss_on_mesh():
    """Overfit one tiny batch for a few steps on the 8-device CPU mesh."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    model = ASRModel(TINY)
    batch = tiny_batch(b=8)
    params = model.init(
        jax.random.PRNGKey(0), batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"])["params"]
    tx = build_optimizer(OptimConfig(lr=1e-3, scheduler="constant",
                                     grad_clip=5.0))
    state = TrainState.create(params, tx, jax.random.PRNGKey(42))
    state = jax.device_put(state, replicated(mesh))
    sbatch = shard_batch(mesh, batch)
    step = make_train_step(model, tx, donate=False)
    losses = []
    for _ in range(5):
        state, stats = step(state, sbatch)
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_ebranchformer_encoder():
    import dataclasses
    cfg = dataclasses.replace(TINY, encoder="ebranchformer")
    model = ASRModel(cfg)
    batch = tiny_batch()
    params = model.init(
        jax.random.PRNGKey(0), batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"])["params"]
    loss, stats = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"])
    assert np.isfinite(float(loss))
    # branch structure present
    assert "cgmlp" in str(jax.tree_util.tree_structure(params))[:10000] or \
        any("cgmlp" in k for k in params["encoder"]["block_0"])


def test_encoder_registry_extension():
    """Third-party encoders plug in via the registry (ClassChoices)."""
    import dataclasses
    import flax.linen as nn
    from espnet_slurp_tpu.utils.registry import encoders
    from espnet_slurp_tpu.ops.masks import length_mask

    if "toy" not in encoders:
        @encoders.register("toy")
        class ToyEncoder(nn.Module):
            cfg: object

            @nn.compact
            def __call__(self, feats, feat_lengths, deterministic=True):
                x = nn.Dense(self.cfg.d_model)(feats)
                return x, feat_lengths, []

    cfg = dataclasses.replace(TINY, encoder="toy")
    model = ASRModel(cfg)
    batch = tiny_batch(b=2)
    params = model.init(
        jax.random.PRNGKey(0), batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"])["params"]
    loss, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        batch["text"], batch["text_lengths"])
    assert np.isfinite(float(loss))


def test_rnn_las_decoder_train_and_decode():
    """ASRModel with decoder='rnn' (LAS + location-aware attention): loss,
    grads, greedy and beam decode through the shared interfaces
    (reference espnet2/asr/decoder/rnn_decoder.py / decoders.py:55-195)."""
    from espnet_slurp_tpu.decode.beam import (BeamSearchConfig,
                                              batch_beam_search)
    from espnet_slurp_tpu.decode.greedy import attention_greedy_decode
    cfg = ASRConfig(
        vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3, decoder="rnn",
        rnn_decoder_units=32, rnn_decoder_layers=2,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 18, size=(2, 5))),
        "text_lengths": jnp.asarray([5, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    # location-attention conv got gradients (the LAS-specific part)
    g_att = grads["decoder"]["att"]["loc_conv"]["kernel"]
    assert float(jnp.sum(jnp.abs(g_att))) > 0

    hs, hl, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    toks, lens = attention_greedy_decode(model, params, hs, hl, max_len=6)
    assert toks.shape == (2, 6)
    bt, bl = batch_beam_search(
        model, params, hs, hl,
        BeamSearchConfig(beam_size=3, pre_beam_size=10, max_len=6,
                         ctc_weight=0.3))
    assert bt.shape == (2, 6)
    assert (np.asarray(bl) <= 6).all()
