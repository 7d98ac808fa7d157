"""Batched beam search vs a slow python reference beam.

Mirrors the reference's test_batch_beam_search.py strategy (batch beam must
equal serial beam). The python reference implements plain attention-only
label-synchronous beam search with per-hypothesis decoder calls.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.decode.beam import BeamSearchConfig, batch_beam_search
from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig

CFG = ASRConfig(
    vocab_size=12, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
    num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7, dropout_rate=0.0,
    ctc_weight=0.0,
    frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
    specaug=None)


def python_beam_search(model, params, hs, h_lengths, beam, max_len):
    """Slow reference: expand all V tokens per hyp via full-prefix decoder
    forward, keep top-K; ended hyps freeze."""
    sos, eos = model.cfg.sos_id, model.cfg.eos_id
    hyps = [([sos], 0.0, False)]
    for step in range(max_len):
        if all(h[2] for h in hyps):
            break
        cand = []
        for toks, score, ended in hyps:
            if ended:
                cand.append((toks, score, True))
                continue
            ys = jnp.asarray([toks])
            logits = model.apply(
                {"params": params}, ys, jnp.asarray([len(toks)]), hs,
                h_lengths,
                method=lambda m, y, yl, mem, ml: m.decoder(y, yl, mem, ml))
            logp = np.asarray(jax.nn.log_softmax(
                logits[0, len(toks) - 1].astype(jnp.float32)))
            # force eos at the final step (batched search semantics)
            if step == max_len - 1:
                ids = [eos]
            else:
                ids = range(model.cfg.vocab_size)
            for v in ids:
                cand.append((toks + [v], score + logp[v], v == eos))
        cand.sort(key=lambda x: -x[1])
        hyps = cand[:beam]
    best = max(hyps, key=lambda x: x[1])
    return best[0][1:], best[1]  # strip sos


@pytest.mark.parametrize("beam", [2, 4])
def test_batched_beam_matches_python(beam):
    model = ASRModel(CFG)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32) * 0.3),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[1, 2, 3]]), "text_lengths": jnp.asarray([3]),
    }
    params = model.init(jax.random.PRNGKey(3), **batch)["params"]
    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))

    max_len = 5
    ref_toks, ref_score = python_beam_search(model, params, hs, h_lengths,
                                             beam, max_len)
    tokens, lengths = batch_beam_search(
        model, params, hs, h_lengths,
        BeamSearchConfig(beam_size=beam, pre_beam_size=CFG.vocab_size,
                         max_len=max_len, ctc_weight=0.0))
    got = list(np.asarray(tokens)[0][: int(lengths[0])])
    ref_no_eos = [t for t in ref_toks if t != CFG.eos_id]
    assert got == ref_no_eos, (got, ref_toks, ref_score)
