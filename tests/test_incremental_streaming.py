"""Exactness tests for the O(1)-state incremental streaming encoder."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from espnet_slurp_tpu.decode.incremental import IncrementalConformerEncoder
from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
from espnet_slurp_tpu.ops.frontend import FrontendConfig


def _model(chunk=4, left=1, kernel=7, blocks=2):
    cfg = ASRConfig(
        vocab_size=20, d_model=32, n_head=2, d_ff=64,
        num_encoder_blocks=blocks, num_decoder_blocks=1, decoder_d_ff=64,
        kernel_size=kernel, dropout_rate=0.0, ctc_weight=0.3,
        chunk_size=chunk, left_chunks=left, use_mvn="none",
        flash_attention="off",
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(1, 4000)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(wav),
                        jnp.asarray([4000]), jnp.ones((1, 3), jnp.int32),
                        jnp.asarray([3]))["params"]
    return model, params


def _full_encode(model, params, wav):
    hs, hl, _ = model.apply(
        {"params": params}, jnp.asarray(wav[None]),
        jnp.asarray([len(wav)], jnp.int32),
        method=lambda m, s, sl: m.encode(s, sl))
    return np.asarray(hs[0, : int(hl[0])], np.float32)


@pytest.mark.parametrize("feed_size", [400, 1000, 4000])
def test_incremental_matches_full_encode(feed_size):
    model, params = _model()
    rng = np.random.RandomState(3)
    wav = (0.1 * rng.randn(5000)).astype(np.float32)
    want = _full_encode(model, params, wav)

    inc = IncrementalConformerEncoder(model, params)
    outs = []
    for off in range(0, len(wav), feed_size):
        final = off + feed_size >= len(wav)
        outs.append(inc.feed(wav[off:off + feed_size], is_final=final))
    got = np.concatenate(outs, axis=0)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_incremental_long_kernel_halo():
    """Conv kernel wider than a chunk (halo spans multiple chunks)."""
    model, params = _model(chunk=2, left=2, kernel=15, blocks=2)
    rng = np.random.RandomState(4)
    wav = (0.1 * rng.randn(4500)).astype(np.float32)
    want = _full_encode(model, params, wav)
    inc = IncrementalConformerEncoder(model, params)
    got = np.concatenate(
        [inc.feed(wav[:2000]), inc.feed(wav[2000:], is_final=True)], axis=0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_incremental_reset_and_reuse():
    model, params = _model()
    rng = np.random.RandomState(5)
    wav = (0.1 * rng.randn(3000)).astype(np.float32)
    want = _full_encode(model, params, wav)
    inc = IncrementalConformerEncoder(model, params)
    inc.feed(wav[:1500])
    inc.reset()
    got = np.concatenate([inc.feed(wav[:1000]),
                          inc.feed(wav[1000:], is_final=True)], axis=0)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_incremental_recognizer_matches_streaming_final():
    """IncrementalRecognizer's final result == StreamingRecognizer's
    (both beam over the same — exactness-verified — encoder states)."""
    from espnet_slurp_tpu.decode.incremental import IncrementalRecognizer
    from espnet_slurp_tpu.decode.streaming import StreamingRecognizer
    model, params = _model()
    rng = np.random.RandomState(6)
    wav = (0.1 * rng.randn(4800)).astype(np.float32)

    rec_old = StreamingRecognizer(model, params, chunk_samples=1600,
                                  max_len=8, beam_size=2)
    ids_old = []
    for off in range(0, len(wav), 1600):
        ids_old, done = rec_old(wav[off:off + 1600],
                                is_final=off + 1600 >= len(wav))

    rec_new = IncrementalRecognizer(model, params, chunk_samples=1600,
                                    max_len=8, beam_size=2)
    ids_new = []
    for off in range(0, len(wav), 1600):
        ids_new, done = rec_new(wav[off:off + 1600],
                                is_final=off + 1600 >= len(wav))
    assert done
    assert ids_new == ids_old
