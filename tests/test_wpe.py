"""WPE dereverberation tests (ops/wpe.py, dnn_wpe/nara-wpe analogue)."""
import numpy as np
import jax.numpy as jnp

from espnet_slurp_tpu.ops.stft import stft
from espnet_slurp_tpu.ops.wpe import wpe_dereverb


def _spec(x, n_fft=256, hop=64):
    s = stft(jnp.asarray(x), n_fft=n_fft, hop_length=hop)
    return s[..., 0] + 1j * s[..., 1]


def test_wpe_reduces_late_reverberation():
    rng = np.random.RandomState(0)
    n = 8000
    # speech-like dry signal: smoothed noise bursts
    dry = rng.randn(n).astype(np.float32)
    env = np.abs(np.convolve(rng.rand(n) > 0.995, np.ones(400), "same"))
    dry = dry * (0.2 + env).astype(np.float32)
    # reverb: strong late echoes well past the WPE delay (3 frames * 32)
    rev = dry.copy()
    for lag, a in ((300, 0.7), (500, 0.5), (800, 0.35)):
        rev[lag:] += a * dry[:-lag]
    mics = np.stack([rev, np.roll(rev, 3)], 0)       # [C=2, N]
    dry_s = np.asarray(_spec(dry[None]))[0]          # [T, F]
    mix_s = _spec(mics)                              # [2, T, F]
    derev = np.asarray(wpe_dereverb(jnp.asarray(mix_s)[None], taps=12,
                                    delay=2, iters=3))[0]
    err_in = np.mean(np.abs(np.asarray(mix_s)[0] - dry_s) ** 2)
    err_out = np.mean(np.abs(derev[0] - dry_s) ** 2)
    assert np.isfinite(err_out)
    assert err_out < 0.5 * err_in  # tail substantially removed


def test_wpe_bounded_on_dry_signal():
    """White (unpredictable) input: WPE must stay near-identity up to the
    in-sample LS shrinkage floor (~C*taps/T of the energy) and never blow
    up across iterations (the failure mode the PSD floor guards)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4000).astype(np.float32)
    s = _spec(x)[None]                                # [1, 2, T, F]
    out = np.asarray(wpe_dereverb(jnp.asarray(s), taps=4, delay=4, iters=4))
    inp = np.asarray(s)
    assert np.isfinite(out).all()
    rel = np.linalg.norm(out - inp) / np.linalg.norm(inp)
    assert rel < 0.5


def test_wpe_beamformer_trains():
    import jax
    from espnet_slurp_tpu.enh import EnhConfig, EnhModel
    cfg = EnhConfig(n_spk=2, separator="beamformer", n_fft=128,
                    hop_length=64, hidden=16, num_layers=1, use_wpe=True)
    model = EnhModel(cfg)
    rng = np.random.RandomState(3)
    s1 = rng.randn(1, 2000).astype(np.float32) * 0.3
    s2 = rng.randn(1, 2000).astype(np.float32) * 0.3
    mix = np.stack([s1 + s2, 0.9 * (s1 + s2)], axis=2)
    batch = {"speech_mix": jnp.asarray(mix),
             "speech_mix_lengths": jnp.asarray([2000]),
             "speech_ref": jnp.asarray(np.stack([s1, s2], 1))}
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    (loss, _), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, **batch), has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
