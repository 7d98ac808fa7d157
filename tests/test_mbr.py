"""MBR / KB-MBR training tests (train/mbr.py).

Reference semantics: e2e_asr.py:854-982 (get_mbr_loss / get_KBmbr_loss with
use_wp_errors), n-best from decoders.py:1781-1962.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.train.mbr import (MBRConfig, compact_masked,
                                        edit_distance, mbr_loss)


def _py_edit_distance(a, b):
    dp = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        new = [i]
        for j, y in enumerate(b, 1):
            new.append(min(dp[j] + 1, new[-1] + 1, dp[j - 1] + (x != y)))
        dp = new
    return dp[-1]


def test_edit_distance_matches_python():
    rng = np.random.RandomState(0)
    hyps, refs, hl, rl = [], [], [], []
    for _ in range(16):
        h = rng.randint(1, 6, size=rng.randint(0, 9))
        r = rng.randint(1, 6, size=rng.randint(1, 11))
        hyps.append(np.pad(h, (0, 10 - len(h))))
        refs.append(np.pad(r, (0, 12 - len(r))))
        hl.append(len(h))
        rl.append(len(r))
    got = edit_distance(jnp.asarray(np.stack(hyps)), jnp.asarray(hl),
                        jnp.asarray(np.stack(refs)), jnp.asarray(rl))
    want = [_py_edit_distance(list(h[:n]), list(r[:m]))
            for h, n, r, m in zip(hyps, hl, refs, rl)]
    assert list(np.asarray(got)) == want


def test_compact_masked():
    tokens = jnp.asarray([[3, 1, 4, 1, 5], [2, 2, 3, 9, 9]])
    lengths = jnp.asarray([5, 3])
    keep = jnp.zeros((10,), bool).at[jnp.asarray([1, 3])].set(True)
    out, ln = compact_masked(tokens, lengths, keep)
    assert list(np.asarray(ln)) == [3, 1]
    assert list(np.asarray(out)[0][:3]) == [3, 1, 1]
    assert list(np.asarray(out)[1][:1]) == [3]


@pytest.fixture(scope="module")
def toy():
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    cfg = ASRConfig(
        vocab_size=12, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 10, size=(2, 4))),
        "text_lengths": jnp.asarray([4, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    return model, params, batch


def test_mbr_loss_and_grads(toy):
    model, params, batch = toy
    cfg = MBRConfig(weight=1.0, beam_size=3, pre_beam_size=6, max_len=6)

    def f(p):
        hs, hl, _ = model.apply(
            {"params": p}, batch["speech"], batch["speech_lengths"],
            method=lambda m, s, sl: m.encode(s, sl))
        loss, stats = mbr_loss(model, p, hs, hl, batch["text"],
                               batch["text_lengths"], cfg)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "mbr_expected_risk" in stats
    assert float(stats["mbr_expected_risk"]) >= 0.0
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # rescoring must move the decoder: some decoder grads nonzero
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in
                jax.tree.leaves(grads["decoder"]))
    assert gnorm > 0


def test_kb_mbr_rare_term(toy):
    model, params, batch = toy
    kb_mask = jnp.zeros((12,), bool).at[jnp.asarray([2, 3])].set(True)
    cfg = MBRConfig(weight=1.0, beam_size=2, pre_beam_size=6, max_len=6,
                    rare_weight=0.5)
    hs, hl, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    loss, stats = mbr_loss(model, params, hs, hl, batch["text"],
                           batch["text_lengths"], cfg, kb_token_mask=kb_mask)
    assert np.isfinite(float(loss))
    assert "mbr_rare_risk" in stats


def test_mbr_training_reduces_expected_risk(toy):
    """A few pure-MBR steps should lower E_p[risk] on a fixed batch."""
    import optax
    model, params, batch = toy
    cfg = MBRConfig(weight=1.0, beam_size=3, pre_beam_size=6, max_len=6,
                    include_gt=True)

    def loss_fn(p):
        hs, hl, _ = model.apply(
            {"params": p}, batch["speech"], batch["speech_lengths"],
            method=lambda m, s, sl: m.encode(s, sl))
        return mbr_loss(model, p, hs, hl, batch["text"],
                        batch["text_lengths"], cfg)

    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = jax.jit(lambda p, o: _step(p, o))

    def _step(p, o):
        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, stats["mbr_expected_risk"]

    risks = []
    for _ in range(8):
        params, opt, risk = step(params, opt)
        risks.append(float(risk))
    assert risks[-1] < risks[0], risks


def test_mbr_aux_in_train_step(toy):
    """aux_loss_fn wiring through make_train_step (hybrid loss composes)."""
    from espnet_slurp_tpu.train.mbr import make_mbr_aux_loss
    from espnet_slurp_tpu.train.optim import OptimConfig, build_optimizer
    from espnet_slurp_tpu.train.state import TrainState, make_train_step
    model, params, batch = toy
    cfg = MBRConfig(weight=0.5, beam_size=2, pre_beam_size=6, max_len=5)
    tx = build_optimizer(OptimConfig(lr=1e-3, scheduler="constant"))
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, donate=False,
                           aux_loss_fn=make_mbr_aux_loss(model, cfg))
    state, stats = step(state, batch)
    assert np.isfinite(float(stats["loss"]))
    assert "loss_mbr" in stats and "loss_att" in stats
