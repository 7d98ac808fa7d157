"""Separation / enhancement scoring metrics (numpy, host-side).

Parity target: reference espnet2/bin/enh_scoring.py, which scores with
mir_eval.separation.bss_eval_sources (SDR/SIR/SAR + best permutation),
pystoi (STOI/ESTOI) and the SI-SNR loss. Those are external C/Python deps;
here the same metrics are implemented in-framework:

- ``si_snr``: scale-invariant SNR (identical math to the training loss).
- ``bss_eval_sources``: zero-lag orthogonal-projection BSS-eval decomposition
  (s_target = projection on the matched reference, e_interf = projection on
  the span of all references minus s_target, e_artif = residual). mir_eval
  uses 512-tap distortion filters; the zero-lag variant keeps the same
  target/interference/artifact decomposition semantics without the Toeplitz
  solves — documented difference, scores typically within ~1 dB.
- ``stoi``: short-time objective intelligibility (Taal et al. 2011): 10 kHz
  resample, 512-pt hann STFT (256 hop), silent-frame removal, 15 1/3-octave
  bands from 150 Hz, 30-frame segments, clipped correlation (and the
  extended=True variant: per-segment normalized whole-vector correlation).

Scoring is offline/host-side (stage-13 analogue), so plain numpy is the
right tool — no jit, variable lengths everywhere.
"""
from __future__ import annotations

import itertools
from typing import Dict, Tuple

import numpy as np

EPS = 1e-8


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SNR in dB."""
    est = est - est.mean()
    ref = ref - ref.mean()
    s = np.dot(est, ref) / max(np.dot(ref, ref), EPS) * ref
    e = est - s
    return float(10 * np.log10(max(np.dot(s, s), EPS)
                               / max(np.dot(e, e), EPS)))


def _project(y: np.ndarray, basis: np.ndarray) -> np.ndarray:
    """Least-squares projection of y onto the row span of basis [K, N]."""
    # Solve G c = basis @ y with G = basis basis^T (tiny K x K system).
    g = basis @ basis.T
    rhs = basis @ y
    c = np.linalg.lstsq(g + EPS * np.eye(g.shape[0]), rhs, rcond=None)[0]
    return c @ basis


def bss_eval_sources(ref: np.ndarray, est: np.ndarray,
                     compute_permutation: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                np.ndarray]:
    """(sdr, sir, sar, perm) for ref/est [S, N] (bss_eval, zero-lag).

    perm[i] is the estimate index assigned to reference i, chosen to
    maximize mean SIR over permutations (mir_eval convention).
    """
    s = ref.shape[0]
    n = min(ref.shape[1], est.shape[1])
    ref = ref[:, :n].astype(np.float64)
    est = est[:, :n].astype(np.float64)

    def decompose(e: np.ndarray, i: int):
        r = ref[i]
        s_target = np.dot(e, r) / max(np.dot(r, r), EPS) * r
        p_all = _project(e, ref)
        e_interf = p_all - s_target
        e_artif = e - p_all
        return s_target, e_interf, e_artif

    def db(num: float, den: float) -> float:
        return float(10 * np.log10(max(num, EPS) / max(den, EPS)))

    sdr = np.zeros((s, s))
    sir = np.zeros((s, s))
    sar = np.zeros((s, s))
    for i in range(s):        # reference index
        for j in range(s):    # estimate index
            st, ei, ea = decompose(est[j], i)
            sdr[i, j] = db(np.sum(st**2), np.sum((ei + ea) ** 2))
            sir[i, j] = db(np.sum(st**2), np.sum(ei**2))
            sar[i, j] = db(np.sum((st + ei) ** 2), np.sum(ea**2))
    if compute_permutation and s > 1:
        best, best_perm = -np.inf, tuple(range(s))
        for perm in itertools.permutations(range(s)):
            val = np.mean([sir[i, perm[i]] for i in range(s)])
            if val > best:
                best, best_perm = val, perm
        perm = np.asarray(best_perm)
    else:
        perm = np.arange(s)
    idx = np.arange(s)
    return sdr[idx, perm], sir[idx, perm], sar[idx, perm], perm


# ---------------------------------------------------------------------------
# STOI
# ---------------------------------------------------------------------------

_FS = 10000
_N_FFT = 512
_HOP = 256
_WIN = 512
_N_BANDS = 15
_MIN_FREQ = 150.0
_SEG = 30           # analysis segment length in frames (384 ms)
_BETA = -15.0       # clipping: -15 dB SDR lower bound
_DYN_RANGE = 40.0   # silent-frame energy threshold below max (dB)


def _resample_linear(x: np.ndarray, fs: int, fs_out: int) -> np.ndarray:
    if fs == fs_out:
        return x
    n_out = int(round(len(x) * fs_out / fs))
    t_out = np.arange(n_out) * (fs / fs_out)
    return np.interp(t_out, np.arange(len(x)), x)


def _third_octave_bands() -> np.ndarray:
    """[15, F] boolean-ish band matrix over the 257-bin rfft grid."""
    f = np.linspace(0, _FS / 2, _N_FFT // 2 + 1)
    cfs = _MIN_FREQ * 2.0 ** (np.arange(_N_BANDS) / 3.0)
    lo = cfs * 2 ** (-1 / 6)
    hi = cfs * 2 ** (1 / 6)
    bands = np.zeros((_N_BANDS, len(f)))
    for k in range(_N_BANDS):
        bands[k, (f >= lo[k]) & (f < hi[k])] = 1.0
    return bands


def _stft_mag(x: np.ndarray) -> np.ndarray:
    """[T, F] magnitude STFT with hann window."""
    win = np.hanning(_WIN + 1)[:-1]
    n_frames = max(1 + (len(x) - _WIN) // _HOP, 0)
    if n_frames == 0:
        x = np.pad(x, (0, _WIN - len(x)))
        n_frames = 1
    frames = np.stack([x[i * _HOP:i * _HOP + _WIN] * win
                       for i in range(n_frames)])
    return np.abs(np.fft.rfft(frames, _N_FFT, axis=-1))


def stoi(ref: np.ndarray, est: np.ndarray, fs: int,
         extended: bool = False) -> float:
    """Short-time objective intelligibility in [~0, 1]."""
    n = min(len(ref), len(est))
    ref = _resample_linear(ref[:n].astype(np.float64), fs, _FS)
    est = _resample_linear(est[:n].astype(np.float64), fs, _FS)
    # Remove silent frames (ref-energy based, both signals same frames).
    win = np.hanning(_WIN + 1)[:-1]
    n_frames = max(1 + (len(ref) - _WIN) // _HOP, 1)
    if len(ref) < _WIN:
        ref = np.pad(ref, (0, _WIN - len(ref)))
        est = np.pad(est, (0, _WIN - len(est)))
    energies = np.array([
        20 * np.log10(np.linalg.norm(ref[i * _HOP:i * _HOP + _WIN] * win)
                      + EPS) for i in range(n_frames)])
    keep = energies > energies.max() - _DYN_RANGE
    if keep.sum() == 0:
        return 0.0
    idx = np.where(keep)[0]

    def _ola(x):
        # Overlap-add the KEPT windowed frames at the analysis hop
        # (pystoi remove_silent_frames): retained speech is reconstructed
        # contiguously, not concatenated as duplicated windows.
        n_keep = len(idx)
        out = np.zeros((n_keep - 1) * _HOP + _WIN)
        for j, i in enumerate(idx):
            out[j * _HOP:j * _HOP + _WIN] += x[i * _HOP:i * _HOP + _WIN] \
                * win
        return out

    ref_kept = _ola(ref)
    est_kept = _ola(est)

    bands = _third_octave_bands()
    x = np.sqrt(bands @ (_stft_mag(ref_kept) ** 2).T + EPS)  # [15, T]
    y = np.sqrt(bands @ (_stft_mag(est_kept) ** 2).T + EPS)
    t = x.shape[1]
    if t < _SEG:
        x = np.pad(x, ((0, 0), (0, _SEG - t)), mode="edge")
        y = np.pad(y, ((0, 0), (0, _SEG - t)), mode="edge")
        t = _SEG
    scores = []
    for m in range(_SEG, t + 1):
        xs = x[:, m - _SEG:m]
        ys = y[:, m - _SEG:m]
        if extended:
            # ESTOI: mean/variance normalize rows AND columns, then one
            # whole-segment correlation per segment.
            xs_n = (xs - xs.mean(1, keepdims=True)) / (
                xs.std(1, keepdims=True) + EPS)
            ys_n = (ys - ys.mean(1, keepdims=True)) / (
                ys.std(1, keepdims=True) + EPS)
            xs_n = (xs_n - xs_n.mean(0, keepdims=True)) / (
                np.linalg.norm(xs_n - xs_n.mean(0, keepdims=True), axis=0,
                               keepdims=True) + EPS)
            ys_n = (ys_n - ys_n.mean(0, keepdims=True)) / (
                np.linalg.norm(ys_n - ys_n.mean(0, keepdims=True), axis=0,
                               keepdims=True) + EPS)
            scores.append(float(np.sum(xs_n * ys_n) / _SEG))
        else:
            # STOI: scale + clip y to x, then per-band correlation.
            alpha = np.linalg.norm(xs, axis=1, keepdims=True) / (
                np.linalg.norm(ys, axis=1, keepdims=True) + EPS)
            ys_c = np.minimum(ys * alpha, xs * (1 + 10 ** (-_BETA / 20)))
            xm = xs - xs.mean(1, keepdims=True)
            ym = ys_c - ys_c.mean(1, keepdims=True)
            corr = np.sum(xm * ym, 1) / (
                np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1)
                + EPS)
            scores.append(float(corr.mean()))
    return float(np.mean(scores))


def score_pair(ref: np.ndarray, est: np.ndarray, fs: int
               ) -> Dict[str, float]:
    """All single-pair metrics for one (reference, estimate) signal pair."""
    sdr, sir, sar, _ = bss_eval_sources(ref[None, :], est[None, :],
                                        compute_permutation=False)
    return {
        "si_snr": si_snr(est, ref),
        "sdr": float(sdr[0]),
        "sir": float(sir[0]),
        "sar": float(sar[0]),
        "stoi": stoi(ref, est, fs) * 100.0,
        "estoi": stoi(ref, est, fs, extended=True) * 100.0,
    }
