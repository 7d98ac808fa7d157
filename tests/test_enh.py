"""Enhancement tests: SI-SNR properties, PIT, separation model training."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.enh import EnhConfig, EnhModel, pit_wrapper, si_snr_loss


def test_si_snr_perfect_reconstruction():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    # perfect (scaled) estimate -> very high SI-SNR -> very negative loss
    loss = si_snr_loss(2.0 * x, x)
    assert (np.asarray(loss) < -40).all()
    # uncorrelated noise -> low SI-SNR
    noise = jnp.asarray(rng.randn(2, 1000).astype(np.float32))
    loss_n = si_snr_loss(noise, x)
    assert (np.asarray(loss_n) > -5).all()


def test_si_snr_respects_lengths():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 100).astype(np.float32))
    est = x.at[:, 50:].set(999.0)  # garbage past the valid region
    loss = si_snr_loss(est, x, lengths=jnp.array([50]))
    assert float(loss[0]) < -40


def test_pit_picks_best_permutation():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(1, 500).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 500).astype(np.float32))
    ref = jnp.stack([a, b], axis=1)  # [1, 2, N]
    est_swapped = jnp.stack([b, a], axis=1)
    loss, perm = pit_wrapper(lambda e, r: si_snr_loss(e, r), est_swapped, ref)
    assert float(loss[0]) < -40  # swapped order still matches via PIT
    assert int(perm[0]) == 1     # permutation (1, 0) chosen


def test_enh_model_trains():
    cfg = EnhConfig(n_spk=2, n_fft=128, hop_length=64, hidden=32,
                    num_layers=1)
    model = EnhModel(cfg)
    rng = np.random.RandomState(3)
    s1 = rng.randn(2, 2000).astype(np.float32) * 0.3
    s2 = rng.randn(2, 2000).astype(np.float32) * 0.3
    batch = {
        "speech_mix": jnp.asarray(s1 + s2),
        "speech_mix_lengths": jnp.asarray([2000, 1500]),
        "speech_ref": jnp.asarray(np.stack([s1, s2], 1)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "si_snr" in stats
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    est, flens = model.apply({"params": params}, batch["speech_mix"],
                             batch["speech_mix_lengths"],
                             method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape[0] == 2 and est.shape[1] == 2


def test_enh_transformer_separator():
    cfg = EnhConfig(n_spk=2, n_fft=128, hop_length=64, hidden=32,
                    num_layers=1, separator="transformer")
    model = EnhModel(cfg)
    rng = np.random.RandomState(4)
    mix = jnp.asarray(rng.randn(1, 1000).astype(np.float32))
    ref = jnp.asarray(rng.randn(1, 2, 1000).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mix, jnp.array([1000]),
                        ref)["params"]
    loss, _ = model.apply({"params": params}, mix, jnp.array([1000]), ref)
    assert np.isfinite(float(loss))


def test_dprnn_split_merge_roundtrip():
    from espnet_slurp_tpu.enh.separators import (merge_segments,
                                                 split_segments)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 37, 8).astype(np.float32))
    segs, rest = split_segments(x, 10)
    assert segs.shape[2] == 10
    y = merge_segments(segs, rest)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("sep", ["tcn", "dprnn"])
def test_tasnet_separators_train(sep):
    cfg = EnhConfig(n_spk=2, separator=sep, hidden=16, num_layers=1,
                    encoder_channels=32, encoder_kernel=16,
                    encoder_stride=8, bottleneck=16, tcn_blocks=2,
                    tcn_repeats=1, segment_size=10)
    model = EnhModel(cfg)
    rng = np.random.RandomState(6)
    s1 = rng.randn(2, 1600).astype(np.float32) * 0.3
    s2 = rng.randn(2, 1600).astype(np.float32) * 0.3
    batch = {
        "speech_mix": jnp.asarray(s1 + s2),
        "speech_mix_lengths": jnp.asarray([1600, 1200]),
        "speech_ref": jnp.asarray(np.stack([s1, s2], 1)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    est, _ = model.apply({"params": params}, batch["speech_mix"],
                         batch["speech_mix_lengths"],
                         method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape[:2] == (2, 2)


def test_mvdr_recovers_target_in_noise():
    """Oracle-mask MVDR on a synthetic 2-mic scene: the beamformed output
    should correlate far better with the target than the noisy mixture."""
    from espnet_slurp_tpu.enh.beamformer import (apply_beamforming,
                                                 masked_psd,
                                                 mvdr_souden_vector)
    rng = np.random.RandomState(7)
    b, t, c, f = 1, 50, 2, 9
    # target and a point interferer, each rank-1 across mics with distinct
    # steering vectors: with 2 mics MVDR can place a null on the
    # interferer, so the beamformed SDR should improve dramatically.
    steer_s = rng.randn(c, f) + 1j * rng.randn(c, f)
    steer_n = rng.randn(c, f) + 1j * rng.randn(c, f)
    src = rng.randn(b, t, f) + 1j * rng.randn(b, t, f)
    intf = rng.randn(b, t, f) + 1j * rng.randn(b, t, f)
    tgt = src[:, :, None, :] * steer_s[None, None]
    noise = intf[:, :, None, :] * steer_n[None, None] + \
        0.01 * (rng.randn(b, t, c, f) + 1j * rng.randn(b, t, c, f))
    mix = tgt + noise
    sre, sim = jnp.asarray(mix.real, jnp.float32), \
        jnp.asarray(mix.imag, jnp.float32)
    flens = jnp.asarray([t])
    ones = jnp.ones((b, t, f))
    psd_s = masked_psd(jnp.asarray(tgt.real, jnp.float32),
                       jnp.asarray(tgt.imag, jnp.float32), ones, flens)
    psd_n = masked_psd(jnp.asarray(noise.real, jnp.float32),
                       jnp.asarray(noise.imag, jnp.float32), ones, flens)
    w = mvdr_souden_vector(psd_s, psd_n, 0)
    y_re, y_im = apply_beamforming(w, sre, sim)
    y = np.asarray(y_re) + 1j * np.asarray(y_im)
    ref = tgt[:, :, 0, :]  # target at reference mic

    def sdr(est):
        err = est - ref
        return 10 * np.log10(np.sum(np.abs(ref) ** 2) /
                             np.sum(np.abs(err) ** 2))

    assert sdr(y) > sdr(mix[:, :, 0, :]) + 5.0


def test_neural_beamformer_trains():
    cfg = EnhConfig(n_spk=2, separator="beamformer", n_fft=128,
                    hop_length=64, hidden=16, num_layers=1)
    model = EnhModel(cfg)
    rng = np.random.RandomState(8)
    s1 = rng.randn(1, 1600).astype(np.float32) * 0.3
    s2 = rng.randn(1, 1600).astype(np.float32) * 0.3
    mix = np.stack([s1 + s2, 0.9 * s1 + 1.1 * s2], axis=-1)  # [B, N, C]
    batch = {
        "speech_mix": jnp.asarray(mix),
        "speech_mix_lengths": jnp.asarray([1600]),
        "speech_ref": jnp.asarray(np.stack([s1, s2], 1)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


@pytest.mark.parametrize("sep", ["dptnet", "skim"])
def test_dualpath_separators_train(sep):
    cfg = EnhConfig(n_spk=2, separator=sep, hidden=16, num_layers=2,
                    n_head=2, encoder_channels=16, encoder_kernel=16,
                    encoder_stride=8, segment_size=10)
    model = EnhModel(cfg)
    rng = np.random.RandomState(9)
    s1 = rng.randn(2, 1600).astype(np.float32) * 0.3
    s2 = rng.randn(2, 1600).astype(np.float32) * 0.3
    batch = {
        "speech_mix": jnp.asarray(s1 + s2),
        "speech_mix_lengths": jnp.asarray([1600, 1200]),
        "speech_ref": jnp.asarray(np.stack([s1, s2], 1)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    est, _ = model.apply({"params": params}, batch["speech_mix"],
                         batch["speech_mix_lengths"],
                         method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape[:2] == (2, 2)


def test_skim_causal_memory():
    """Causal SkiM: masks for segment s must not depend on later segments."""
    from espnet_slurp_tpu.enh.separators import SkiMSeparator
    rng = np.random.RandomState(10)
    seg, s, n = 8, 4, 12
    x = rng.randn(1, seg * s, n).astype(np.float32)
    sep = SkiMSeparator(n, 1, hidden=8, n_blocks=2, segment_size=seg,
                        causal=True)
    params = sep.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    base = np.asarray(sep.apply({"params": params}, jnp.asarray(x)))
    x2 = x.copy()
    x2[:, 2 * seg:] += 10.0  # perturb segments 2..3 only
    out2 = np.asarray(sep.apply({"params": params}, jnp.asarray(x2)))
    np.testing.assert_allclose(out2[:, :, : 2 * seg], base[:, :, : 2 * seg],
                               atol=1e-5)
    assert np.abs(out2[:, :, 2 * seg:] - base[:, :, 2 * seg:]).max() > 1e-3


def test_dccrn_trains_and_causal():
    cfg = EnhConfig(n_spk=1, separator="dccrn", n_fft=128, hop_length=64,
                    hidden=16, dccrn_kernel_num=(4, 8), dccrn_rnn_layers=1)
    model = EnhModel(cfg)
    rng = np.random.RandomState(11)
    clean = rng.randn(1, 1600).astype(np.float32) * 0.3
    noise = rng.randn(1, 1600).astype(np.float32) * 0.1
    batch = {
        "speech_mix": jnp.asarray(clean + noise),
        "speech_mix_lengths": jnp.asarray([1600]),
        "speech_ref": jnp.asarray(clean[:, None]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    (loss, _), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, **batch), has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    # Frame-level causality of the separator net: masks at frame t are
    # unchanged when only later STFT frames are perturbed.
    from espnet_slurp_tpu.enh.dccrn import DCCRNSeparator
    sep = DCCRNSeparator(1, (4, 8), 16, 1)
    spec = rng.randn(1, 12, 65).astype(np.float32)
    spec_i = rng.randn(1, 12, 65).astype(np.float32)
    sp = sep.init(jax.random.PRNGKey(1), jnp.asarray(spec),
                  jnp.asarray(spec_i))["params"]
    re0, im0 = sep.apply({"params": sp}, jnp.asarray(spec),
                         jnp.asarray(spec_i))
    spec2 = spec.copy()
    spec2[:, 8:] += 5.0
    re1, im1 = sep.apply({"params": sp}, jnp.asarray(spec2),
                         jnp.asarray(spec_i))
    np.testing.assert_allclose(np.asarray(re1)[:, :, :8],
                               np.asarray(re0)[:, :, :8], atol=1e-4)

def test_fasnet_xcorr_matches_bruteforce():
    from espnet_slurp_tpu.enh.fasnet import sliding_sq_norm, xcorr_fft
    rng = np.random.RandomState(10)
    x = rng.randn(3, 48).astype(np.float32)
    y = rng.randn(3, 16).astype(np.float32)
    n_out = 48 - 16 + 1
    got = np.asarray(xcorr_fft(jnp.asarray(x), jnp.asarray(y), n_out))
    want = np.stack([[x[b, j:j + 16] @ y[b] for j in range(n_out)]
                     for b in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    norms = np.asarray(sliding_sq_norm(jnp.asarray(x), 16, n_out))
    want_n = np.stack([[np.linalg.norm(x[b, j:j + 16])
                        for j in range(n_out)] for b in range(3)])
    np.testing.assert_allclose(norms, want_n, rtol=1e-4, atol=1e-4)


def test_fasnet_frame_ola_roundtrip():
    from espnet_slurp_tpu.enh.fasnet import frame_signal, overlap_add
    rng = np.random.RandomState(11)
    t, win, ctx = 317, 16, 8
    x = jnp.asarray(rng.randn(2, t).astype(np.float32))
    chunks, _ = frame_signal(x, win, ctx)
    centers = chunks[..., ctx:ctx + win]
    y = overlap_add(centers, win)
    # 50%-overlap OLA doubles the signal; offset by the front stride pad.
    np.testing.assert_allclose(np.asarray(y[:, win // 2:win // 2 + t]),
                               2.0 * np.asarray(x), rtol=1e-5, atol=1e-5)


def test_fasnet_separator_trains():
    cfg = EnhConfig(n_spk=2, separator="fasnet", hidden=16, num_layers=1,
                    encoder_channels=16, bottleneck=16, segment_size=8,
                    fasnet_window=16, fasnet_context=16)
    model = EnhModel(cfg)
    rng = np.random.RandomState(12)
    s1 = rng.randn(2, 800).astype(np.float32) * 0.3
    s2 = rng.randn(2, 800).astype(np.float32) * 0.3
    mix = np.stack([s1 + s2, 0.8 * (s1 + s2)], axis=2)  # [B, T, C=2]
    batch = {
        "speech_mix": jnp.asarray(mix),
        "speech_mix_lengths": jnp.asarray([800, 600]),
        "speech_ref": jnp.asarray(np.stack([s1, s2], 1)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    est, _ = model.apply({"params": params}, batch["speech_mix"],
                         batch["speech_mix_lengths"],
                         method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape == (2, 2, 800)


def test_fasnet_channel_mask_matches_subarray():
    """Masked ad-hoc array == physically dropping the masked mic."""
    from espnet_slurp_tpu.enh.fasnet import FaSNetTAC
    rng = np.random.RandomState(13)
    wav3 = rng.randn(1, 3, 400).astype(np.float32)
    net = FaSNetTAC(n_spk=2, enc_dim=8, feature_dim=8, hidden=8,
                    n_layers=1, segment_size=8, window=16, context=16)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(wav3))["params"]
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    out_masked = net.apply({"params": params}, jnp.asarray(wav3), mask)
    # same params on the 2-mic subarray (mic contents of channel 2 ignored)
    wav3_zeroed = wav3.copy()
    wav3_zeroed[:, 2] = rng.randn(400)  # garbage in the masked channel
    out_masked2 = net.apply({"params": params}, jnp.asarray(wav3_zeroed),
                            mask)
    np.testing.assert_allclose(np.asarray(out_masked),
                               np.asarray(out_masked2), rtol=1e-4, atol=1e-4)


def test_dpcl_loss_zero_for_perfect_embeddings():
    from espnet_slurp_tpu.enh.losses import dpcl_loss
    rng = np.random.RandomState(20)
    b, t, f = 1, 6, 8
    lab = rng.randint(0, 2, size=(b, t, f))
    ref = np.zeros((b, 2, t, f), np.float32)
    for s in range(2):
        ref[:, s] = np.where(lab == s, 2.0, 0.1)
    emb = np.eye(2, dtype=np.float32)[lab]  # D=2 one-hot == labels
    valid = jnp.ones((b, t), bool)
    loss = dpcl_loss(jnp.asarray(emb), jnp.asarray(ref), valid)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-4)
    # scrambled embeddings -> positive loss
    emb2 = np.eye(2, dtype=np.float32)[rng.randint(0, 2, size=(b, t, f))]
    loss2 = dpcl_loss(jnp.asarray(emb2), jnp.asarray(ref), valid)
    assert float(loss2[0]) > 0.01


def test_dpcl_separator_trains_and_separates():
    cfg = EnhConfig(n_spk=2, separator="dpcl", n_fft=128, hop_length=64,
                    hidden=32, num_layers=1, dpcl_emb_dim=8)
    model = EnhModel(cfg)
    rng = np.random.RandomState(21)
    # speakers in disjoint frequency bands -> clean cluster structure
    t = np.arange(4000) / 16000.0
    s1 = (0.4 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)[None]
    s2 = (0.4 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)[None]
    batch = {"speech_mix": jnp.asarray(s1 + s2),
             "speech_mix_lengths": jnp.asarray([4000]),
             "speech_ref": jnp.asarray(np.stack([s1, s2], 1))}
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    (loss, stats), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, **batch), has_aux=True)(params)
    assert np.isfinite(float(loss)) and "dpcl_loss" in stats
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    # a few SGD steps reduce the affinity loss on this separable mixture
    import optax
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    p = params
    for _ in range(12):
        (l2, _), g = jax.value_and_grad(
            lambda pp: model.apply({"params": pp}, **batch),
            has_aux=True)(p)
        upd, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, upd)
    assert float(l2) < float(loss)
    est, _ = model.apply({"params": p}, batch["speech_mix"],
                         batch["speech_mix_lengths"],
                         method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape[0] == 1 and est.shape[1] == 2
    assert np.isfinite(np.asarray(est)).all()


def test_dan_separator_trains_and_separates():
    """DAN: oracle attractors at train (masked SI-SNR, end-to-end
    differentiable), k-means attractors + soft masks at inference."""
    cfg = EnhConfig(n_spk=2, separator="dan", n_fft=128, hop_length=64,
                    hidden=32, num_layers=1, dpcl_emb_dim=8)
    model = EnhModel(cfg)
    t = np.arange(4000) / 16000.0
    s1 = (0.4 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)[None]
    s2 = (0.4 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)[None]
    batch = {"speech_mix": jnp.asarray(s1 + s2),
             "speech_mix_lengths": jnp.asarray([4000]),
             "speech_ref": jnp.asarray(np.stack([s1, s2], 1))}
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    (loss, stats), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, **batch), has_aux=True)(params)
    assert np.isfinite(float(loss)) and "si_snr" in stats
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    import optax
    tx = optax.adam(2e-3)
    opt = tx.init(params)
    p = params
    for _ in range(10):
        (l2, _), g = jax.value_and_grad(
            lambda pp: model.apply({"params": pp}, **batch),
            has_aux=True)(p)
        upd, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, upd)
    assert float(l2) < float(loss)  # oracle-attractor SI-SNR improves
    est, _ = model.apply({"params": p}, batch["speech_mix"],
                         batch["speech_mix_lengths"],
                         method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape[:2] == (1, 2)
    assert np.isfinite(np.asarray(est)).all()


def test_enh_conformer_separator():
    """conformer_separator.py analogue: TF-masking with conformer blocks."""
    cfg = EnhConfig(n_spk=2, n_fft=128, hop_length=64, hidden=32,
                    num_layers=1, separator="conformer")
    model = EnhModel(cfg)
    rng = np.random.RandomState(6)
    mix = jnp.asarray(rng.randn(1, 1000).astype(np.float32))
    ref = jnp.asarray(rng.randn(1, 2, 1000).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mix, jnp.array([1000]),
                        ref)["params"]

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, mix, jnp.array([1000]),
                                  ref)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    est, _ = model.apply({"params": params}, mix, jnp.array([1000]),
                         method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape[:2] == (1, 2)


@pytest.mark.parametrize("sep", ["svoice", "dpcl_e2e", "dc_crn"])
def test_extra_separators_train(sep):
    """SVoice (multi-scale MulCat), DPCL-E2E (soft-kmeans + enh BLSTM) and
    DC-CRN (dense GLU complex masking) train under PIT SI-SNR
    (svoice_separator.py / dpcl_e2e_separator.py / dc_crn_separator.py)."""
    cfg = EnhConfig(n_spk=2, separator=sep, hidden=16, num_layers=2,
                    encoder_channels=32, encoder_kernel=8,
                    segment_size=10, n_fft=128, hop_length=64,
                    dccrn_kernel_num=(8, 16), dccrn_rnn_layers=1,
                    dpcl_emb_dim=6)
    model = EnhModel(cfg)
    rng = np.random.RandomState(6)
    s1 = rng.randn(2, 1600).astype(np.float32) * 0.3
    s2 = rng.randn(2, 1600).astype(np.float32) * 0.3
    batch = {
        "speech_mix": jnp.asarray(s1 + s2),
        "speech_mix_lengths": jnp.asarray([1600, 1200]),
        "speech_ref": jnp.asarray(np.stack([s1, s2], 1)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    est, _ = model.apply({"params": params}, batch["speech_mix"],
                         batch["speech_mix_lengths"],
                         method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape[:2] == (2, 2)
    assert np.isfinite(np.asarray(est)).all()


def test_svoice_decode_overlap_add():
    """svoice_decode == the reference Decoder (AvgPool over features +
    overlap_and_add) on a hand-checkable case."""
    from espnet_slurp_tpu.enh.extra_separators import svoice_decode
    kernel = 4
    feat = np.zeros((1, 3, 8), np.float32)   # K=3 frames, N=8 -> fl=2
    feat[0, 0] = [4, 4, 4, 4, 8, 8, 8, 8]    # frame 0 -> [4, 8]
    feat[0, 1] = [0, 0, 0, 0, 4, 4, 4, 4]    # frame 1 -> [0, 4]
    feat[0, 2] = [2, 2, 2, 2, 0, 0, 0, 0]    # frame 2 -> [2, 0]
    out = np.asarray(svoice_decode(jnp.asarray(feat), kernel))
    # frames [4,8],[0,4],[2,0] overlap-added at step 2:
    # t0=4, t1=8, t2(+=0)=0, t3=4, t4=2, t5=0 -> [4, 8, 0, 4+2=... ]
    want = np.zeros(2 * 2 + 2, np.float32)
    for i, fr in enumerate([[4, 8], [0, 4], [2, 0]]):
        want[i * 2:i * 2 + 2] += fr
    np.testing.assert_allclose(out[0], want)


@pytest.mark.parametrize("output_from", ["dnn1", "mfmcwf", "dnn2"])
def test_ineube_trains(output_from):
    """iNeuBe (TCNDenseUNet -> mfMCWF -> DNN2) trains under PIT SI-SNR
    from 2-mic input (ineube_separator.py:30-300)."""
    cfg = EnhConfig(n_spk=1, separator="ineube", hidden=64,
                    n_fft=128, hop_length=64,
                    ineube_output_from=output_from,
                    ineube_tcn_repeats=1, ineube_tcn_blocks=2,
                    ineube_tcn_channels=32, ineube_n_chunks=1)
    model = EnhModel(cfg)
    rng = np.random.RandomState(6)
    s1 = rng.randn(2, 1600).astype(np.float32) * 0.3
    noise = rng.randn(2, 1600, 2).astype(np.float32) * 0.1
    mix = s1[..., None] + noise
    batch = {
        "speech_mix": jnp.asarray(mix),
        "speech_mix_lengths": jnp.asarray([1600, 1200]),
        "speech_ref": jnp.asarray(s1[:, None]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    assert "dnn1" in params
    if output_from == "dnn2":
        assert "dnn2" in params

    def loss_fn(p):
        return model.apply({"params": p}, **batch)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    est, _ = model.apply({"params": params}, batch["speech_mix"],
                         batch["speech_mix_lengths"],
                         method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape[:2] == (2, 1)
    assert np.isfinite(np.asarray(est)).all()


def test_mfmcwf_recovers_known_filter():
    """mfMCWF solves the correct normal equations: when the target IS a
    fixed complex filter of the multi-frame mixture taps, the solve must
    recover it (near-)exactly, and the residual must beat the unfiltered
    ref-channel residual (ineube_separator.py:156-200)."""
    from espnet_slurp_tpu.enh.ineube import mfmcwf
    rng = np.random.RandomState(11)
    b, t, c, f, n_chunks = 2, 64, 2, 5, 1
    k = c * (2 * n_chunks + 1)
    mix = (rng.randn(b, t, c, f) + 1j * rng.randn(b, t, c, f)).astype(
        np.complex64)
    # build the true multi-frame taps exactly as mfmcwf does (zero-padded)
    padded = np.pad(mix, ((0, 0), (n_chunks, n_chunks), (0, 0), (0, 0)))
    taps = np.concatenate(
        [padded[:, n_chunks - d: n_chunks - d + t]
         for d in range(-n_chunks, n_chunks + 1)], axis=2)  # [B,T,CK,F]
    w_true = (rng.randn(b, f, k) + 1j * rng.randn(b, f, k)).astype(
        np.complex64)
    target = np.einsum("bftm,bfm->bft",
                       np.moveaxis(taps, (2, 3), (3, 1)), w_true)
    target = np.moveaxis(target, 1, 2)                      # [B, T, F]
    yr, yi = mfmcwf(jnp.asarray(mix.real), jnp.asarray(mix.imag),
                    jnp.asarray(target.real), jnp.asarray(target.imag),
                    n_chunks=n_chunks, tik_eps=1e-10)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    resid = np.abs(y - target).mean()
    resid_unfiltered = np.abs(mix[:, :, 0] - target).mean()
    np.testing.assert_allclose(y, target, rtol=2e-3, atol=2e-3)
    assert resid < 1e-2 * resid_unfiltered


def test_mfmcwf_taps_zero_padded_not_circular():
    """Edge frames must use zero padding, not wrap-around: with n_chunks=1
    and a mixture whose only energy sits in the LAST frame, the output at
    frame 0 must not see it (jnp.roll would leak it in)."""
    from espnet_slurp_tpu.enh.ineube import mfmcwf
    b, t, c, f = 1, 8, 1, 3
    mix = np.zeros((b, t, c, f), np.complex64)
    mix[:, -1] = 1.0 + 0.5j
    # target = the mixture's ref channel (so w ~ identity-ish on tap d=0)
    est = mix[:, :, 0]
    yr, yi = mfmcwf(jnp.asarray(mix.real), jnp.asarray(mix.imag),
                    jnp.asarray(est.real), jnp.asarray(est.imag),
                    n_chunks=1, tik_eps=1e-8)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    # frame 0 taps are [mix[1], mix[0], zero-pad] -> all zero -> output 0.
    # Circular taps would have placed mix[-1] at frame 0 (tap d=+1).
    np.testing.assert_allclose(np.abs(y[:, 0]), 0.0, atol=1e-6)
    assert np.abs(y[:, -1]).max() > 0.1


def test_external_separator_plugin():
    """asteroid_models.py analogue: a dotted-path flax separator plugs into
    EnhModel (train grads + separate), no wrapper class per model."""
    cfg = EnhConfig(
        n_spk=2, separator="external",
        external_path="espnet_slurp_tpu.enh.external_example:"
                      "LearnedGainSeparator",
        external_kwargs=(("taps", 5),))
    model = EnhModel(cfg)
    rng = np.random.RandomState(11)
    s1 = rng.randn(2, 1200).astype(np.float32) * 0.3
    s2 = rng.randn(2, 1200).astype(np.float32) * 0.3
    batch = {
        "speech_mix": jnp.asarray(s1 + s2),
        "speech_mix_lengths": jnp.asarray([1200, 900]),
        "speech_ref": jnp.asarray(np.stack([s1, s2], 1)),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    assert "external" in params, list(params)
    (loss, stats), grads = jax.value_and_grad(
        lambda p: model.apply({"params": p}, **batch), has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))
    est, flens = model.apply({"params": params}, batch["speech_mix"],
                             batch["speech_mix_lengths"],
                             method=lambda m, s, sl: m.separate(s, sl))
    assert est.shape == (2, 2, 1200)
    np.testing.assert_array_equal(np.asarray(flens), [1200, 900])


def test_external_separator_bad_path_raises():
    cfg = EnhConfig(n_spk=2, separator="external", external_path="nocolon")
    model = EnhModel(cfg)
    x = jnp.zeros((1, 400))
    with pytest.raises(ValueError, match="external_path"):
        model.init(jax.random.PRNGKey(0), x, jnp.asarray([400]),
                   jnp.zeros((1, 2, 400)))
