"""Gate-learnability probe: does p_gen OPEN when the pointer is the only
source of signal?

Targets are concatenations of words drawn from a huge random pool (fresh
per batch), so the decoder cannot memorize them; every batch's biasing trie
contains exactly the words used (plus distractors). If the TCPGen recipe is
healthy, the generation gate must rise and teacher-forced accuracy with the
pointer must beat the no-pointer baseline by a wide margin. Runs in ~3 min
on CPU; exercises asr_model + slu/kb augment exactly as ASRTask.train does.

Usage: JAX_PLATFORMS=cpu python tools/tcpgen_gate_probe.py [steps]
"""
import sys

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import optax

from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig
from espnet_slurp_tpu.slu.kb import TCPGenBatchAugmenter


def make_batch(rng, aug, vocab, b=8, n_words=4, epoch=10):
    """Random 'sentences' of words the augmenter knows about."""
    rows = []
    for _ in range(b):
        ws = [aug.words[rng.randint(len(aug.words))] for _ in range(n_words)]
        rows.append([t for w in ws for t in w])
    u = max(len(r) for r in rows)
    text = np.full((b, u), -1, np.int32)
    for i, r in enumerate(rows):
        text[i, :len(r)] = r
    lens = np.array([len(r) for r in rows], np.int32)
    batch = {
        "speech": jnp.asarray(rng.randn(b, 800).astype(np.float32) * 0.05),
        "speech_lengths": jnp.asarray(np.full((b,), 800, np.int32)),
        "text": jnp.asarray(text),
        "text_lengths": jnp.asarray(lens),
    }
    return aug.augment(batch, epoch)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    vocab = 50
    rng = np.random.RandomState(0)
    # 4000-word pool of 2-3 piece words over ids [3, vocab-2); the last
    # piece is "suffix-marked" by convention: declare ALL ids boundary-free
    # and use suffix walk with boundary set = ids >= vocab//2 (a synthetic
    # 'word-final piece' id range so walks reset).
    half = vocab // 2
    pool = []
    seen = set()
    while len(pool) < 4000:
        k = rng.randint(1, 3)
        w = tuple(int(x) for x in rng.randint(3, half, size=k)) + (
            int(rng.randint(half, vocab - 1)),)
        if w not in seen:
            seen.add(w)
            pool.append(w)
    bset = set(range(half, vocab))  # word-final id range
    cfg = ASRConfig(
        vocab_size=vocab, d_model=32, n_head=2, d_ff=64,
        num_encoder_blocks=1, num_decoder_blocks=1, decoder_d_ff=64,
        kernel_size=7, dropout_rate=0.0, ctc_weight=0.0, use_tcpgen=True,
        tcpgen_ptr_loss_weight=1.0,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    aug = TCPGenBatchAugmenter(pool, bset, cfg.sos_id, cfg.eos_id,
                               prefix_boundary=False, kb_len=40,
                               db_drop=0.0, sched_epochs=1, seed=1)
    model = ASRModel(cfg)
    b0 = make_batch(rng, aug, vocab)
    params = model.init(jax.random.PRNGKey(0), **b0)["params"]
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch):
        def loss_fn(p):
            loss, stats = model.apply({"params": p}, train=False, **batch)
            return loss, stats
        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss, stats

    hist = []
    for i in range(steps):
        batch = make_batch(rng, aug, vocab)
        params, opt, loss, stats = step(params, opt, batch)
        if (i + 1) % 50 == 0:
            hist.append((i + 1, float(loss), float(stats["acc"]),
                         float(stats["p_gen"]),
                         float(stats.get("loss_ptr", -1))))
            print(f"step {i+1}: loss {float(loss):.3f} "
                  f"acc {float(stats['acc']):.3f} "
                  f"p_gen {float(stats['p_gen']):.3f} "
                  f"loss_ptr {float(stats.get('loss_ptr', -1)):.3f}",
                  flush=True)

    # no-pointer control: same model family without tcpgen
    cfg0 = ASRConfig(**{**cfg.__dict__, "use_tcpgen": False,
                        "tcpgen_ptr_loss_weight": 0.0})
    m0 = ASRModel(cfg0)
    keys = ("speech", "speech_lengths", "text", "text_lengths")
    b00 = {k: b0[k] for k in keys}
    p0 = m0.init(jax.random.PRNGKey(0), **b00)["params"]
    o0 = tx.init(p0)

    @jax.jit
    def step0(params, opt, batch):
        def loss_fn(p):
            loss, stats = m0.apply({"params": p}, train=False, **batch)
            return loss, stats
        (loss, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss, stats

    acc0 = 0.0
    for i in range(steps):
        batch = make_batch(rng, aug, vocab)
        bb = {k: batch[k] for k in keys}
        p0, o0, loss0, stats0 = step0(p0, o0, bb)
        acc0 = float(stats0["acc"])
    final = hist[-1]
    print(f"FINAL: ptr acc {final[2]:.3f} p_gen {final[3]:.3f} "
          f"vs no-ptr acc {acc0:.3f}")
    assert final[3] > 0.2, "generation gate failed to open"
    assert final[2] > acc0 + 0.15, "pointer gave no accuracy benefit"
    print("GATE PROBE PASSED")


if __name__ == "__main__":
    main()
