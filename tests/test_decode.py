"""Decoding tests: CTC prefix scorer vs brute force, beam search sanity."""
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
