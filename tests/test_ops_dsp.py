"""DSP op tests: STFT vs numpy/scipy reference, mel vs formula, masks, MVN.

Mirrors the reference's tolerance tests in test/espnet2/layers/ (SURVEY.md §4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.ops import (
    FrontendConfig, default_frontend, length_mask, causal_mask,
    global_mvn, utterance_mvn, mel_filterbank, stft, stft_out_lengths,
    specaug, SpecAugConfig,
)


def np_stft_ref(x, n_fft=512, hop=128, win_length=None):
    """Reference STFT via numpy rfft, torch.stft-compatible (center/reflect)."""
    if win_length is None:
        win_length = n_fft
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_length) / win_length)
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    off = (n_fft - win_length) // 2
    t = 1 + (len(x) - n_fft) // hop
    frames = np.stack([x[i * hop + off: i * hop + off + win_length] * w
                       for i in range(t)])
    full = np.zeros((t, n_fft))
    full[:, off:off + win_length] = frames
    return np.fft.rfft(full, n=n_fft, axis=-1)


@pytest.mark.parametrize("win_length", [None, 400])
def test_stft_matches_numpy(win_length):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1600).astype(np.float32)
    out = np.asarray(stft(jnp.asarray(x), n_fft=512, hop_length=128,
                          win_length=win_length))
    for b in range(2):
        ref = np_stft_ref(x[b], 512, 128, win_length)
        assert out.shape[1] == ref.shape[0]
        np.testing.assert_allclose(out[b, ..., 0], ref.real, atol=2e-3)
        np.testing.assert_allclose(out[b, ..., 1], ref.imag, atol=2e-3)


def test_stft_lengths():
    ilens = jnp.array([1600, 900])
    out = stft_out_lengths(ilens, n_fft=512, hop=128)
    np.testing.assert_array_equal(np.asarray(out), [13, 8])


def test_mel_filterbank_properties():
    mat = mel_filterbank(16000, 512, 80)
    assert mat.shape == (257, 80)
    assert (mat >= 0).all()
    # Every filter has some support; band centers increase monotonically.
    assert (mat.sum(0) > 0).all()
    centers = np.argmax(mat, axis=0)
    assert (np.diff(centers) >= 0).all()


def test_mel_filterbank_matches_librosa_if_available():
    librosa = pytest.importorskip("librosa")
    ref = librosa.filters.mel(sr=16000, n_fft=512, n_mels=80).T
    mat = mel_filterbank(16000, 512, 80)
    np.testing.assert_allclose(mat, ref, atol=1e-5)


def test_frontend_shapes_and_padding():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 3200).astype(np.float32)
    ilens = jnp.array([3200, 1600, 800])
    feats, flens = jax.jit(default_frontend)(jnp.asarray(x), ilens)
    assert feats.shape == (3, 26, 80)
    np.testing.assert_array_equal(np.asarray(flens), [26, 13, 7])
    # Padded frames are zeroed.
    assert np.abs(np.asarray(feats[1, 13:])).max() == 0.0
    assert np.abs(np.asarray(feats[2, 7:])).max() == 0.0
    # Valid frames are log-scale finite values.
    assert np.isfinite(np.asarray(feats)).all()


def test_masks():
    m = length_mask(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])
    c = causal_mask(3)
    np.testing.assert_array_equal(
        np.asarray(c), [[1, 0, 0], [1, 1, 0], [1, 1, 1]])


def test_utterance_mvn():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 10, 4).astype(np.float32))
    lens = jnp.array([10, 6])
    y = utterance_mvn(x, lens, norm_means=True, norm_vars=True)
    y = np.asarray(y)
    # Valid region has ~zero mean, unit var.
    np.testing.assert_allclose(y[1, :6].mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(y[1, :6].std(0), 1.0, atol=1e-4)
    assert np.abs(y[1, 6:]).max() == 0.0


def test_global_mvn():
    x = jnp.ones((1, 4, 3)) * 5.0
    mean = jnp.array([5.0, 5.0, 5.0])
    inv_std = jnp.array([0.5, 0.5, 0.5])
    y = global_mvn(x, jnp.array([4]), mean, inv_std)
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_specaug_shapes_and_masking():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 50, 80).astype(np.float32)) + 10.0
    lens = jnp.array([50, 30])
    key = jax.random.PRNGKey(0)
    y = jax.jit(lambda k, x, l: specaug(k, x, l, SpecAugConfig()))(key, x, lens)
    y = np.asarray(y)
    assert y.shape == x.shape
    # Some positions should be zeroed by masks (input is offset by +10).
    assert (y == 0.0).sum() > 0
    # Padding region stays zero.
    assert np.abs(y[1, 30:]).max() == 0.0
    # Determinism under same key (jit vs eager differ only in float noise).
    y2 = np.asarray(specaug(key, x, lens, SpecAugConfig()))
    np.testing.assert_allclose(y, y2, atol=1e-5)


def test_sliding_window_and_fused_frontend():
    """sliding_window/fused frontends (windowing.py / fused.py parity):
    frame axes align with the log-mel path; fused = concat on feature dim."""
    import dataclasses as _dc
    from espnet_slurp_tpu.ops.frontend import (fused_frontend,
                                               sliding_window_frontend)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4000).astype(np.float32)
    ilens = jnp.asarray([4000, 3000])
    cfg = FrontendConfig(n_fft=256, win_length=200, hop_length=128, n_mels=16)

    mels, mlens = jax.jit(lambda s, l: default_frontend(s, l, cfg))(
        jnp.asarray(x), ilens)
    raw, rlens = jax.jit(lambda s, l: sliding_window_frontend(s, l, cfg))(
        jnp.asarray(x), ilens)
    assert raw.shape[:2] == mels.shape[:2]
    assert raw.shape[2] == 200
    np.testing.assert_array_equal(np.asarray(mlens), np.asarray(rlens))
    # Every raw frame is a contiguous slice of the (zero-padded) signal.
    padded = np.pad(x, ((0, 0), (128, 128)))
    start = 4 * 128 + (256 - 200) // 2
    np.testing.assert_allclose(np.asarray(raw)[0, 4], padded[0, start:start + 200],
                               rtol=1e-6, atol=1e-6)

    fcfg = _dc.replace(cfg, type="fused")
    fused, flens = jax.jit(lambda s, l: default_frontend(s, l, fcfg))(
        jnp.asarray(x), ilens)
    assert fused.shape[2] == 16 + 200
    np.testing.assert_allclose(np.asarray(fused)[..., :16], np.asarray(mels),
                               rtol=1e-6, atol=1e-6)


def test_asr_model_frontend_types():
    """ASR model trains a step with each frontend type (shape-inferred)."""
    import dataclasses as _dc
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    for ftype in ("sliding_window", "fused"):
        cfg = ASRConfig(
            vocab_size=12, d_model=16, n_head=2, d_ff=32,
            num_encoder_blocks=1, num_decoder_blocks=1, decoder_d_ff=32,
            kernel_size=7, dropout_rate=0.0, use_mvn="utterance",
            frontend=FrontendConfig(type=ftype, n_fft=128, win_length=64,
                                    hop_length=64, n_mels=8),
            specaug=None)
        model = ASRModel(cfg)
        rng = np.random.RandomState(0)
        batch = dict(
            speech=jnp.asarray(rng.randn(2, 2048).astype(np.float32)),
            speech_lengths=jnp.asarray([2048, 1536]),
            text=jnp.asarray([[1, 2, 3], [4, 5, 0]]),
            text_lengths=jnp.asarray([3, 2]))
        params = model.init(jax.random.PRNGKey(0), **batch)["params"]
        loss, stats = model.apply({"params": params}, **batch)
        assert np.isfinite(float(loss))


def test_add_deltas_matches_manual():
    """Delta features (espnet/transform/add_deltas.py Kaldi regression)."""
    import numpy as np
    import jax.numpy as jnp
    from espnet_slurp_tpu.ops.frontend import add_deltas, delta_features
    rng = np.random.RandomState(0)
    f = rng.randn(2, 10, 4).astype(np.float32)
    d = np.asarray(delta_features(jnp.asarray(f), window=2))
    # manual at an interior frame
    t = 5
    want = (1 * (f[:, t + 1] - f[:, t - 1])
            + 2 * (f[:, t + 2] - f[:, t - 2])) / (2 * (1 + 4))
    np.testing.assert_allclose(d[:, t], want, rtol=1e-5)
    # linear ramp has constant delta equal to the slope
    ramp = np.tile(np.arange(10, dtype=np.float32)[None, :, None],
                   (1, 1, 3)) * 0.5
    dr = np.asarray(delta_features(jnp.asarray(ramp)))
    np.testing.assert_allclose(dr[0, 3:7], 0.5, rtol=1e-5)
    out = add_deltas(jnp.asarray(f), order=2)
    assert out.shape == (2, 10, 12)


def test_frontend_delta_order():
    import numpy as np
    import jax.numpy as jnp
    from espnet_slurp_tpu.ops.frontend import FrontendConfig, default_frontend
    cfg = FrontendConfig(n_fft=128, hop_length=64, n_mels=8, delta_order=2)
    speech = jnp.asarray(
        np.random.RandomState(1).randn(2, 800).astype(np.float32))
    feats, flens = default_frontend(speech, jnp.asarray([800, 400]), cfg)
    assert feats.shape[-1] == 24
