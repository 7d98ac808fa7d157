"""VITS tests: monotonic alignment search vs a python Viterbi reference,
Gaussian log-likelihood table vs naive broadcast, GAN train-step smoke,
inference shapes, and task-level e2e (arch: vits).

Parity target: reference espnet2/gan_tts/vits/ + test_vits in the
reference suite; MAS reference mirrors monotonic_align/core.pyx.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from espnet_slurp_tpu.tts.hifigan import HiFiGANConfig, HiFiGANDiscriminator
from espnet_slurp_tpu.tts.vits import (VITSConfig, VITSGenerator,
                                       gaussian_logp_table,
                                       linear_spectrogram,
                                       make_vits_train_step,
                                       monotonic_alignment_search,
                                       rand_slice)

TINY = VITSConfig(
    vocab_size=30, d_model=16, n_head=2, d_ff=32, text_blocks=1,
    posterior_wn_layers=2, flow_layers=2, flow_wn_layers=1,
    dur_channels=8, segment_size=4, n_fft=64, hop_length=16, win_length=64,
    sample_rate=16000, n_mels=8,
    hifigan=HiFiGANConfig(
        in_channels=16, base_channels=16, upsample_rates=(4, 4),
        upsample_kernels=(8, 8), resblock_kernels=(3,),
        resblock_dilations=((1, 3),), periods=(2, 3), scales=2))

TINY_DISC = HiFiGANConfig(
    in_channels=16, base_channels=4, periods=(2, 3), scales=2)


def _mas_python(logp, t_len, l_len):
    """Reference Viterbi MAS (monotonic_align/core.pyx semantics)."""
    neg = -1e30
    q = np.full((t_len, l_len), neg, np.float64)
    q[0, 0] = logp[0, 0]
    for t in range(1, t_len):
        for l in range(l_len):
            stay = q[t - 1, l]
            diag = q[t - 1, l - 1] if l > 0 else neg
            q[t, l] = logp[t, l] + max(stay, diag)
    path = np.zeros((t_len, l_len), np.float32)
    j = l_len - 1
    for t in range(t_len - 1, -1, -1):
        path[t, j] = 1.0
        if t > 0:
            diag = q[t - 1, j - 1] if j > 0 else neg
            if diag >= q[t - 1, j]:
                j -= 1
    return path


def test_mas_matches_python_viterbi():
    rng = np.random.RandomState(0)
    b, t_max, l_max = 3, 17, 7
    t_lens = np.asarray([17, 11, 9])
    l_lens = np.asarray([7, 4, 2])
    logp = rng.randn(b, t_max, l_max).astype(np.float32)
    # mask invalid text columns like the model does
    for i in range(b):
        logp[i, :, l_lens[i]:] = -1e30
    attn = np.asarray(monotonic_alignment_search(
        jnp.asarray(logp), jnp.asarray(t_lens), jnp.asarray(l_lens)))
    for i in range(b):
        ref = _mas_python(logp[i].astype(np.float64), t_lens[i], l_lens[i])
        np.testing.assert_array_equal(attn[i, :t_lens[i], :l_lens[i]], ref)
        assert attn[i, t_lens[i]:].sum() == 0


def test_mas_alignment_is_monotonic_surjective():
    rng = np.random.RandomState(1)
    logp = rng.randn(2, 25, 6).astype(np.float32)
    attn = np.asarray(monotonic_alignment_search(
        jnp.asarray(logp), jnp.asarray([25, 20]), jnp.asarray([6, 5])))
    for i, (tl, ll) in enumerate([(25, 6), (20, 5)]):
        rows = attn[i, :tl, :ll]
        assert (rows.sum(axis=1) == 1).all()       # each frame -> one token
        idx = rows.argmax(axis=1)
        assert (np.diff(idx) >= 0).all()           # monotonic
        assert idx[0] == 0 and idx[-1] == ll - 1   # full coverage
        assert len(np.unique(idx)) == ll           # surjective


def test_gaussian_logp_table_matches_naive():
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(2, 5, 4).astype(np.float32))
    m = jnp.asarray(rng.randn(2, 3, 4).astype(np.float32))
    s = jnp.asarray(0.3 * rng.randn(2, 3, 4).astype(np.float32))
    got = np.asarray(gaussian_logp_table(z, m, s))
    var = np.exp(2 * np.asarray(s))
    naive = np.sum(
        -0.5 * np.log(2 * np.pi) - np.asarray(s)[:, None]
        - 0.5 * (np.asarray(z)[:, :, None] - np.asarray(m)[:, None]) ** 2
        / var[:, None], axis=-1)
    np.testing.assert_allclose(got, naive, rtol=1e-4, atol=1e-4)


def test_rand_slice_in_bounds():
    x = jnp.asarray(np.arange(2 * 20, dtype=np.float32).reshape(2, 20, 1))
    seg, lengths = 4, jnp.asarray([20, 10])
    for seed in range(5):
        sl, starts = rand_slice(jax.random.PRNGKey(seed), x, lengths, seg)
        assert sl.shape == (2, seg, 1)
        s = np.asarray(starts)
        assert (s >= 0).all() and (s[0] <= 16) and (s[1] <= 6)


def _vits_batch(b=2, n=1024, l=7, seed=0):
    rng = np.random.RandomState(seed)
    wav = rng.randn(b, n).astype(np.float32) * 0.1
    return {
        "speech": jnp.asarray(wav),
        "speech_lengths": jnp.asarray([n, n - 256]),
        "text": jnp.asarray(rng.randint(1, 29, size=(b, l))),
        "text_lengths": jnp.asarray([l, l - 3]),
    }


def test_vits_train_step_and_infer():
    gen = VITSGenerator(TINY)
    disc = HiFiGANDiscriminator(TINY_DISC)
    batch = _vits_batch()
    spec, spec_lens = linear_spectrogram(
        batch["speech"], batch["speech_lengths"], TINY)
    assert spec.shape[1] == 1024 // 16 and spec.shape[2] == 33

    gp = gen.init(jax.random.PRNGKey(0), batch["text"],
                  batch["text_lengths"], spec, spec_lens,
                  jax.random.PRNGKey(1))["params"]
    fake, starts, aux = gen.apply(
        {"params": gp}, batch["text"], batch["text_lengths"], spec,
        spec_lens, jax.random.PRNGKey(2))
    assert fake.shape == (2, TINY.segment_size * TINY.hop_length)
    assert np.isfinite(float(aux["kl_loss"]))
    assert np.isfinite(float(aux["dur_loss"]))

    dp = disc.init(jax.random.PRNGKey(3), fake)["params"]
    from espnet_slurp_tpu.train.gan_trainer import GANTrainState
    gen_tx = optax.adam(2e-4)
    disc_tx = optax.adam(2e-4)
    state = GANTrainState.create(gp, dp, gen_tx, disc_tx,
                                 jax.random.PRNGKey(4))
    step = make_vits_train_step(gen, disc, gen_tx, disc_tx, TINY)
    state1, stats = step(state, batch)
    for k in ("gen_loss", "disc_loss", "mel_loss", "kl_loss", "dur_loss"):
        assert np.isfinite(float(stats[k])), k
    # params actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.gen_params, state1.gen_params)
    assert max(jax.tree.leaves(moved)) > 0
    state2, stats2 = step(state1, batch)
    assert int(state2.step) == 2

    wav, wav_lens = gen.apply(
        {"params": state2.gen_params}, batch["text"],
        batch["text_lengths"], jax.random.PRNGKey(5),
        method=lambda m, t, tl, r: m.infer(t, tl, r, max_frames=40))
    assert wav.shape == (2, 40 * TINY.hop_length)
    assert np.isfinite(np.asarray(wav)).all()
    assert (np.asarray(wav_lens) <= 40 * TINY.hop_length).all()


def test_vits_task_e2e(tmp_path):
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.tasks.tts import (TTSTask, Text2Speech,
                                            load_tts_config)
    make_mini_corpus(tmp_path / "data", n_train=4, n_dev=2)
    cfg = load_tts_config(overrides={
        "exp_dir": str(tmp_path / "exp"),
        "arch": "vits",
        "vits": {
            "d_model": 16, "n_head": 2, "d_ff": 32, "text_blocks": 1,
            "posterior_wn_layers": 2, "flow_layers": 2,
            "flow_wn_layers": 1, "dur_channels": 8, "segment_size": 4,
            "n_fft": 64, "hop_length": 16, "win_length": 64,
            "sample_rate": 16000, "n_mels": 8,
            "hifigan": {
                "in_channels": 16, "base_channels": 16,
                "upsample_rates": [4, 4], "upsample_kernels": [8, 8],
                "resblock_kernels": [3], "resblock_dilations": [[1, 3]],
                "periods": [2, 3], "scales": 2},
        },
        "discriminator": {"in_channels": 16, "base_channels": 4,
                          "periods": [2, 3], "scales": 2},
        "data": {"train_dir": str(tmp_path / "data/train"),
                 "valid_dir": str(tmp_path / "data/dev"),
                 "batch_size": 2},
        "max_epoch": 1,
    })
    TTSTask.train(cfg)
    t2s = Text2Speech(cfg.exp_dir)
    mel, wav = t2s("hello world", max_frames=30)
    assert wav is not None and wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()


def test_rq_spline_matches_reference_transform():
    """JAX unconstrained rational-quadratic spline == the reference's
    transform.py (nflows-derived), forward AND inverse, values + logdet."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import ref_compat
    if not ref_compat.ref_available():
        import pytest
        pytest.skip("reference unavailable")
    ref_compat.install_shims()
    import torch
    # Load transform.py standalone (importing the espnet2.gan_tts package
    # pulls a feats_extract chain needing humanfriendly).
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_vits_transform",
        "/root/reference/espnet2/gan_tts/vits/transform.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    piecewise_rational_quadratic_transform = (
        mod.piecewise_rational_quadratic_transform)
    from espnet_slurp_tpu.tts.vits_sdp import (
        unconstrained_rational_quadratic_spline)

    rng = np.random.default_rng(7)
    shape, bins = (3, 17), 10
    x = rng.normal(size=shape).astype(np.float32) * 4.0  # some past tails
    uw = rng.normal(size=shape + (bins,)).astype(np.float32)
    uh = rng.normal(size=shape + (bins,)).astype(np.float32)
    ud = rng.normal(size=shape + (bins - 1,)).astype(np.float32)

    for inverse in (False, True):
        ref_y, ref_ld = piecewise_rational_quadratic_transform(
            torch.from_numpy(x), torch.from_numpy(uw.copy()),
            torch.from_numpy(uh.copy()), torch.from_numpy(ud.copy()),
            inverse=inverse, tails="linear", tail_bound=5.0)
        got_y, got_ld = unconstrained_rational_quadratic_spline(
            jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh),
            jnp.asarray(ud), inverse=inverse, tail_bound=5.0)
        np.testing.assert_allclose(np.asarray(got_y), ref_y.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_ld), ref_ld.numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_rq_spline_round_trip():
    from espnet_slurp_tpu.tts.vits_sdp import (
        unconstrained_rational_quadratic_spline)
    rng = np.random.default_rng(3)
    shape, bins = (4, 9), 6
    x = rng.normal(size=shape).astype(np.float32) * 3.0
    uw = rng.normal(size=shape + (bins,)).astype(np.float32)
    uh = rng.normal(size=shape + (bins,)).astype(np.float32)
    ud = rng.normal(size=shape + (bins - 1,)).astype(np.float32)
    y, ld = unconstrained_rational_quadratic_spline(
        jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud))
    x2, ld2 = unconstrained_rational_quadratic_spline(
        y, jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud), inverse=True)
    np.testing.assert_allclose(np.asarray(x2), x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld2), -np.asarray(ld),
                               rtol=1e-4, atol=1e-5)


def test_vits_sdp_train_and_infer():
    """use_sdp=True: SDP NLL is finite and trainable, inverse sampling
    yields usable durations (duration_predictor.py use_sdp path)."""
    import dataclasses
    cfg = dataclasses.replace(TINY, use_sdp=True, sdp_flows=2,
                              sdp_dds_layers=2)
    gen = VITSGenerator(cfg)
    disc = HiFiGANDiscriminator(TINY_DISC)
    batch = _vits_batch()
    spec, spec_lens = linear_spectrogram(
        batch["speech"], batch["speech_lengths"], cfg)
    gp = gen.init(jax.random.PRNGKey(0), batch["text"],
                  batch["text_lengths"], spec, spec_lens,
                  jax.random.PRNGKey(1))["params"]
    assert "duration_predictor" in gp and "flow_0" in gp["duration_predictor"]
    fake, starts, aux = gen.apply(
        {"params": gp}, batch["text"], batch["text_lengths"], spec,
        spec_lens, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["dur_loss"]))

    dp = disc.init(jax.random.PRNGKey(3), fake)["params"]
    from espnet_slurp_tpu.train.gan_trainer import GANTrainState
    gen_tx = optax.adam(2e-4)
    disc_tx = optax.adam(2e-4)
    state = GANTrainState.create(gp, dp, gen_tx, disc_tx,
                                 jax.random.PRNGKey(4))
    step = make_vits_train_step(gen, disc, gen_tx, disc_tx, cfg)
    state1, stats = step(state, batch)
    assert np.isfinite(float(stats["dur_loss"]))
    # SDP params moved under the GAN update
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.gen_params["duration_predictor"],
        state1.gen_params["duration_predictor"])
    assert max(jax.tree.leaves(moved)) > 0

    wav, wav_lens = gen.apply(
        {"params": state1.gen_params}, batch["text"],
        batch["text_lengths"], jax.random.PRNGKey(5),
        method=lambda m, t, tl, r: m.infer(t, tl, r, max_frames=40))
    assert np.isfinite(np.asarray(wav)).all()
    assert (np.asarray(wav_lens) > 0).all()
