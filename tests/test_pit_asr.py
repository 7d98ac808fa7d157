"""PIT multi-speaker ASR tests (reference pit_espnet_model.py analogue)."""
import numpy as np
import jax
import jax.numpy as jnp

from espnet_slurp_tpu.models.asr_model import ASRConfig
from espnet_slurp_tpu.models.pit_asr import PITASRModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.ops.specaug import SpecAugConfig
from espnet_slurp_tpu.train.optim import OptimConfig, build_optimizer
from espnet_slurp_tpu.train.state import TrainState, make_train_step

TINY = ASRConfig(
    vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
    num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
    ctc_weight=0.3, lsm_weight=0.1, num_ref=2, pit_branch_blocks=1,
    frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
    specaug=SpecAugConfig(time_warp_window=2, freq_mask_width_range=(0, 4),
                          time_mask_width_range=(0, 4)),
)


def tiny_batch(b=2, n=6400, u=6, seed=0):
    # n=6400 -> ~100 STFT frames -> ~25 encoder frames: keeps every
    # (ref, stream) CTC pair feasible so the permutation solve is
    # meaningful (infeasible pairs all collapse to the 1e9 sentinel and
    # the argmin tie makes the matching arbitrary).
    rng = np.random.RandomState(seed)
    return {
        "speech": jnp.asarray(rng.randn(b, n).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray(np.full((b,), n, np.int32)),
        "text": jnp.asarray(rng.randint(1, 19, size=(b, u))),
        "text_lengths": jnp.asarray(rng.randint(2, u + 1, size=(b,))),
        "text_spk2": jnp.asarray(rng.randint(1, 19, size=(b, u))),
        "text_spk2_lengths": jnp.asarray(rng.randint(2, u + 1, size=(b,))),
    }


def _init(model, batch):
    return model.init(jax.random.PRNGKey(0), **batch)["params"]


def test_pit_forward_backward():
    model = PITASRModel(TINY)
    batch = tiny_batch()
    params = _init(model, batch)

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"loss_ctc", "loss_att", "loss"} <= set(stats)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # Both speaker branches receive gradient.
    for n in range(2):
        g = jax.tree.leaves(grads[f"branch_{n}"])
        assert float(sum(jnp.sum(x ** 2) for x in g)) > 0


def test_pit_loss_invariant_to_reference_order():
    """Swapping the two reference transcripts must not change the loss:
    the permutation solve re-matches streams to references (the defining
    PIT property, pit_espnet_model.py PITLossWrapper)."""
    model = PITASRModel(TINY)
    batch = tiny_batch()
    params = _init(model, batch)
    loss_a, _ = model.apply({"params": params}, **batch)
    swapped = dict(batch)
    swapped["text"], swapped["text_spk2"] = batch["text_spk2"], batch["text"]
    swapped["text_lengths"], swapped["text_spk2_lengths"] = \
        batch["text_spk2_lengths"], batch["text_lengths"]
    loss_b, _ = model.apply({"params": params}, **swapped)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-4)


def test_pit_train_step_decreases_loss():
    model = PITASRModel(TINY)
    batch = tiny_batch()
    params = _init(model, batch)
    tx = build_optimizer(OptimConfig(lr=1e-3, scheduler="constant"))
    state = TrainState.create(params, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, tx)
    losses = []
    for _ in range(8):
        state, stats = step(state, batch)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)
