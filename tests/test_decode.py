"""Decoding tests: CTC prefix scorer vs brute force, beam search sanity."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.decode import ctc_prefix


def np_ctc_prefix_score(lp, prefix, blank=0):
    """Brute-force log P_ctc(prefix...) = sum over paths whose collapse
    STARTS WITH prefix... computed via the standard forward recursion in
    plain numpy (log-space)."""
    T, V = lp.shape
    # forward over prefix lattice
    g = list(prefix)
    n = len(g)
    NEG = -1e30

    def lse(a, b):
        m = max(a, b)
        if m <= NEG:
            return NEG
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    # r[t][i][z]: prob prefix g[:i] emitted by time t, z=0 nb (ended with
    # g[i-1]), z=1 blank-extended
    r_nb = np.full((T, n + 1), NEG)
    r_b = np.full((T, n + 1), NEG)
    r_b[0][0] = lp[0, blank]
    if n >= 1:
        r_nb[0][1] = lp[0, g[0]]
    for t in range(1, T):
        r_b[t][0] = r_b[t - 1][0] + lp[t, blank]
        for i in range(1, n + 1):
            c = g[i - 1]
            phi = r_b[t - 1][i - 1]
            if i == 1 or g[i - 2] != c:
                phi = lse(phi, r_nb[t - 1][i - 1])
            r_nb[t][i] = lse(r_nb[t - 1][i], phi) + lp[t, c]
            r_b[t][i] = lse(r_b[t - 1][i], r_nb[t - 1][i]) + lp[t, blank]
    # P(prefix...) = sum_t phi(t-1)*x_t(c_last) i.e. first time last label
    # emitted -- identical to psi recursion; compute via psi directly:
    psi = r_nb[0][n] if n == 1 else NEG
    if n >= 1:
        c = g[-1]
        for t in range(1, T):
            phi = r_b[t - 1][n - 1]
            if n == 1 or g[n - 2] != c:
                phi = lse(phi, r_nb[t - 1][n - 1])
            psi = lse(psi, phi + lp[t, c])
    else:
        psi = 0.0
    return psi


@pytest.mark.parametrize("prefix", [[1], [2], [1, 2], [2, 2], [1, 2, 1]])
def test_ctc_prefix_score_matches_bruteforce(prefix):
    rng = np.random.RandomState(0)
    T, V = 8, 4
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.randn(T, V).astype(np.float32)), -1))

    # Walk the jax scorer along the prefix.
    lpj = jnp.asarray(lp)[None]  # N=1
    lengths = jnp.array([T])
    st = ctc_prefix.init_state(lpj, lengths)
    for i, c in enumerate(prefix):
        cand = jnp.array([[c, 3]])  # score target + a dummy candidate
        psi, r_new = ctc_prefix.score_candidates(
            st, lpj, lengths, cand, jnp.asarray(i))
        st = ctc_prefix.select(r_new, psi, cand, jnp.array([0]), st)
    ref = np_ctc_prefix_score(lp, prefix)
    np.testing.assert_allclose(float(st.psi[0]), ref, rtol=1e-4, atol=1e-4)


def test_ctc_prefix_final_score_is_full_ctc_prob():
    """final_score(prefix) == log P_ctc(exactly prefix) — check vs ctc_loss."""
    from espnet_slurp_tpu.ops.ctc import ctc_loss
    rng = np.random.RandomState(1)
    T, V = 10, 5
    lp = jax.nn.log_softmax(jnp.asarray(rng.randn(T, V), jnp.float32), -1)
    labels = [1, 3, 2]
    lpj = lp[None]
    lengths = jnp.array([T])
    st = ctc_prefix.init_state(lpj, lengths)
    for i, c in enumerate(labels):
        cand = jnp.array([[c, 4]])
        psi, r_new = ctc_prefix.score_candidates(st, lpj, lengths, cand,
                                                 jnp.asarray(i))
        st = ctc_prefix.select(r_new, psi, cand, jnp.array([0]), st)
    fin = float(ctc_prefix.final_score(st, lengths)[0])
    ref = -float(ctc_loss(lpj, lengths, jnp.asarray([labels]),
                          jnp.array([3]))[0])
    np.testing.assert_allclose(fin, ref, rtol=1e-4, atol=1e-4)


def test_ctc_prefix_respects_lengths():
    """Frames past `lengths` must not contribute."""
    rng = np.random.RandomState(2)
    T, V = 12, 4
    lp_full = jax.nn.log_softmax(
        jnp.asarray(rng.randn(1, T, V), jnp.float32), -1)
    st_full = ctc_prefix.init_state(lp_full, jnp.array([6]))
    st_trunc = ctc_prefix.init_state(lp_full[:, :6], jnp.array([6]))
    cand = jnp.array([[1, 2]])
    psi_f, _ = ctc_prefix.score_candidates(
        st_full, lp_full, jnp.array([6]), cand, jnp.asarray(0))
    psi_t, _ = ctc_prefix.score_candidates(
        st_trunc, lp_full[:, :6], jnp.array([6]), cand, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(psi_f), np.asarray(psi_t),
                               rtol=1e-4)


def test_ctc_timesync_beam_matches_serial():
    """Time-sync CTC prefix beam vs a serial python CTC prefix beam
    (Hannun-style; same no-cross-parent-merge semantics)."""
    import jax
    from espnet_slurp_tpu.decode.timesync import (TimeSyncConfig,
                                                  ctc_timesync_beam_search)
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    cfg = ASRConfig(
        vocab_size=8, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.5,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(6)
    batch = {"speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32)),
             "speech_lengths": jnp.asarray([1600]),
             "text": jnp.asarray([[1, 2, 3]]),
             "text_lengths": jnp.asarray([3])}
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    hs, hl, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    toks, lens = ctc_timesync_beam_search(
        model, params, hs, hl, TimeSyncConfig(beam_size=4, pre_beam_size=7,
                                              max_len=8))
    got = list(np.asarray(toks)[0][: int(lens[0])])

    # serial reference
    lp = np.asarray(model.apply({"params": params}, hs,
                                method=lambda m, x: m.ctc_logprobs(x)))[0]
    t_max = int(hl[0])

    def lse(a, b):
        m = max(a, b)
        if m < -1e29:
            return -1e30
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    hyps = [((), 0.0, -1e30)]  # (prefix, p_b, p_nb)
    for t in range(t_max):
        cand = []
        for prefix, p_b, p_nb in hyps:
            tot = lse(p_b, p_nb)
            stay_b = tot + lp[t, 0]
            stay_nb = (p_nb + lp[t, prefix[-1]]) if prefix else -1e30
            cand.append((prefix, stay_b, stay_nb))
            top = np.argsort(-lp[t, 1:])[:7] + 1
            for c in top:
                if len(prefix) >= 8:
                    continue
                base = p_b if (prefix and c == prefix[-1]) else tot
                cand.append((prefix + (int(c),), -1e30, base + lp[t, c]))
        cand.sort(key=lambda x: -lse(x[1], x[2]))
        hyps = cand[:4]
    best = max(hyps, key=lambda x: lse(x[1], x[2]))
    assert got == list(best[0]), (got, best[0])


def test_ctc_viterbi_align():
    """Forced alignment on a constructed posterior: tokens land on their
    high-probability frame spans."""
    from espnet_slurp_tpu.decode.ctc_segmentation import (align_words,
                                                          ctc_viterbi_align)
    t, v = 12, 5
    lp = np.full((t, v), np.log(0.05))
    # blank elsewhere; token 1 strong on frames 2-4; token 2 on 7-9
    lp[:, 0] = np.log(0.8)
    lp[2:5, 1] = np.log(0.9)
    lp[2:5, 0] = np.log(0.02)
    lp[7:10, 2] = np.log(0.9)
    lp[7:10, 0] = np.log(0.02)
    out = ctc_viterbi_align(lp, [1, 2], blank_id=0)
    (s1, e1, c1), (s2, e2, c2) = out
    assert 2 <= s1 <= 3 and 4 <= e1 <= 5
    assert 7 <= s2 <= 8 and 9 <= e2 <= 10
    assert c1 > 0.5 and c2 > 0.5
    words = align_words(out, ["he▁", "yo▁"])
    assert [w for _, _, _, w in words] == ["he", "yo"]


def test_ilm_subtraction_decode():
    """Density-ratio fusion (BeamSearchConfig.ilm_weight): epsilon weight
    reproduces the plain beam exactly; an extreme weight changes it (the
    zero-memory internal-LM pass is live)."""
    import jax
    from espnet_slurp_tpu.decode.beam import (BeamSearchConfig,
                                              batch_beam_search)
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    cfg = ASRConfig(
        vocab_size=12, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.0,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(0)
    batch = {"speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32)),
             "speech_lengths": jnp.asarray([1600]),
             "text": jnp.asarray([[1, 2, 3]]),
             "text_lengths": jnp.asarray([3])}
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    hs, hl, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    base_cfg = BeamSearchConfig(beam_size=3, max_len=6, ctc_weight=0.0)
    t0, l0 = batch_beam_search(model, params, hs, hl, base_cfg)
    t_eps, l_eps = batch_beam_search(
        model, params, hs, hl,
        dataclasses.replace(base_cfg, ilm_weight=1e-8))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t_eps))
    t_big, _ = batch_beam_search(
        model, params, hs, hl,
        dataclasses.replace(base_cfg, ilm_weight=5.0))
    assert not np.array_equal(np.asarray(t0), np.asarray(t_big))
