"""TCPGen learnability: the generation gate must OPEN when the pointer is
the only source of signal (tools/tcpgen_gate_probe.py distilled).

Targets are concatenations of words drawn fresh from a 4000-word pool each
batch — unmemorizable by the decoder — while every batch's biasing trie
contains exactly the words used. Guards the full training recipe
(per-batch tries, oracle labels, pointer CE, interpolated NLL): a
regression anywhere (walk semantics, label alignment, mixing formula)
collapses p_gen or kills the accuracy gap.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.slu.kb import TCPGenBatchAugmenter

VOCAB = 50
HALF = VOCAB // 2


def _pool(rng, n=4000):
    seen, pool = set(), []
    while len(pool) < n:
        k = rng.randint(1, 3)
        w = tuple(int(x) for x in rng.randint(3, HALF, size=k)) + (
            int(rng.randint(HALF, VOCAB - 1)),)
        if w not in seen:
            seen.add(w)
            pool.append(w)
    return pool


def _batch(rng, aug, b=8, n_words=4):
    rows = []
    for _ in range(b):
        ws = [aug.words[rng.randint(len(aug.words))] for _ in range(n_words)]
        rows.append([t for w in ws for t in w])
    u = max(len(r) for r in rows)
    text = np.full((b, u), -1, np.int32)
    for i, r in enumerate(rows):
        text[i, :len(r)] = r
    batch = {
        "speech": jnp.asarray(rng.randn(b, 800).astype(np.float32) * 0.05),
        "speech_lengths": jnp.asarray(np.full((b,), 800, np.int32)),
        "text": jnp.asarray(text),
        "text_lengths": jnp.asarray(
            np.array([len(r) for r in rows], np.int32)),
    }
    return aug.augment(batch, epoch=10)


@pytest.mark.slow
def test_gate_opens_when_pointer_is_informative():
    rng = np.random.RandomState(0)
    cfg = ASRConfig(
        vocab_size=VOCAB, d_model=32, n_head=2, d_ff=64,
        num_encoder_blocks=1, num_decoder_blocks=1, decoder_d_ff=64,
        kernel_size=7, dropout_rate=0.0, ctc_weight=0.0, use_tcpgen=True,
        tcpgen_ptr_loss_weight=1.0,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    aug = TCPGenBatchAugmenter(_pool(rng), set(range(HALF, VOCAB)),
                               cfg.sos_id, cfg.eos_id,
                               prefix_boundary=False, kb_len=40,
                               db_drop=0.0, sched_epochs=1, seed=1)
    model = ASRModel(cfg)
    b0 = _batch(rng, aug)
    params = model.init(jax.random.PRNGKey(0), **b0)["params"]
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch):
        def loss_fn(p):
            return model.apply({"params": p}, train=False, **batch)
        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, stats

    stats = None
    for _ in range(150):
        params, opt, stats = step(params, opt, _batch(rng, aug))
    p_gen = float(stats["p_gen"])
    acc = float(stats["acc"])
    assert p_gen > 0.3, f"gate failed to open: p_gen={p_gen}"
    # no-pointer control: same architecture, pointer off
    cfg0 = ASRConfig(**{**cfg.__dict__, "use_tcpgen": False,
                        "tcpgen_ptr_loss_weight": 0.0})
    m0 = ASRModel(cfg0)
    keys = ("speech", "speech_lengths", "text", "text_lengths")
    p0 = m0.init(jax.random.PRNGKey(0), **{k: b0[k] for k in keys})["params"]
    o0 = tx.init(p0)

    @jax.jit
    def step0(params, opt, batch):
        def loss_fn(p):
            return m0.apply({"params": p}, train=False, **batch)
        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, stats

    s0 = None
    for _ in range(150):
        p0, o0, s0 = step0(p0, o0,
                           {k: _batch(rng, aug)[k] for k in keys})
    acc0 = float(s0["acc"])
    assert acc > acc0 + 0.1, f"pointer gave no benefit: {acc} vs {acc0}"
