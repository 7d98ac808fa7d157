"""Tests for enhancement scoring metrics + the enh_scoring CLI."""
import numpy as np

from espnet_slurp_tpu.enh.scoring import bss_eval_sources, si_snr, stoi


def _tone(freq, n=16000, fs=16000, seed=None):
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * freq * t).astype(np.float64)
    if seed is not None:
        x = x + 0.01 * np.random.RandomState(seed).randn(n)
    return x


def test_si_snr_identity_and_scale_invariance():
    x = _tone(440, seed=0)
    assert si_snr(x, x) > 60
    noisy = x + 0.5 * np.random.RandomState(1).randn(len(x))
    # scale invariance holds away from the zero-error EPS floor
    assert abs(si_snr(0.3 * noisy, x) - si_snr(noisy, x)) < 1e-6
    assert si_snr(noisy, x) < 10


def test_bss_eval_permutation_recovery():
    a, b = _tone(300), _tone(700)
    ref = np.stack([a, b])
    est = np.stack([b + 0.05 * a, a + 0.05 * b])  # swapped order
    sdr, sir, sar, perm = bss_eval_sources(ref, est)
    assert list(perm) == [1, 0]
    assert (sdr > 15).all()
    assert (sir > 15).all()


def test_stoi_clean_vs_noisy():
    rng = np.random.RandomState(0)
    # speech-like: amplitude-modulated multi-tone
    t = np.arange(32000) / 16000
    x = (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 800 * t)
         ) * (0.5 + 0.5 * np.sin(2 * np.pi * 4 * t))
    clean = stoi(x, x, 16000)
    noisy = stoi(x, x + 2.0 * rng.randn(len(x)), 16000)
    assert clean > 0.95
    assert noisy < clean - 0.2
    e_clean = stoi(x, x, 16000, extended=True)
    e_noisy = stoi(x, x + 2.0 * rng.randn(len(x)), 16000, extended=True)
    assert e_clean > 0.9
    assert e_noisy < e_clean - 0.2


def test_enh_scoring_cli(tmp_path):
    from espnet_slurp_tpu.bin.enh_scoring import main as cli_main
    from espnet_slurp_tpu.data.fileio import write_wav

    a, b = 0.5 * _tone(300), 0.5 * _tone(700)
    wav_dir = tmp_path / "wav"
    wav_dir.mkdir()
    scps = {}
    for name, sig in (("ref1", a), ("ref2", b),
                      ("inf1", b + 0.02 * a), ("inf2", a + 0.02 * b)):
        write_wav(str(wav_dir / f"{name}.wav"), sig, 16000)
        scp = tmp_path / f"{name}.scp"
        scp.write_text(f"utt1 {wav_dir / (name + '.wav')}\n")
        scps[name] = str(scp)
    out = tmp_path / "score"
    rc = cli_main(["--output_dir", str(out),
                   "--ref_scp", scps["ref1"], "--ref_scp", scps["ref2"],
                   "--inf_scp", scps["inf1"], "--inf_scp", scps["inf2"]])
    assert rc == 0
    assert (out / "SI_SNR_spk1").exists()
    assert (out / "STOI_spk2").exists()
    score = (out / "score.txt").read_text()
    si1 = [float(l.split()[1]) for l in score.splitlines()
           if l.startswith("SI_SNR_spk1")][0]
    assert si1 > 15  # permutation resolved: est2 matches ref1
    # permutation-assigned wav pointers
    assert "inf2" in (out / "wav_spk1").read_text()
