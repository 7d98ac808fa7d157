"""Native IO tests: C++ WAV decoder equivalence with the Python readers,
threaded batch loading, header-only length, graceful fallback."""
import numpy as np
import pytest

from espnet_slurp_tpu import native


def _write_ref_wav(path, x, sr=16000):
    # write via scipy (independent of the code under test)
    from scipy.io import wavfile
    wavfile.write(path, sr, np.clip(x * 32768.0, -32768,
                                    32767).astype(np.int16))


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("no native toolchain in this environment")
    return True


def test_native_matches_python_reader(tmp_path, lib_ok):
    rng = np.random.RandomState(0)
    x = (rng.randn(3001) * 0.2).astype(np.float32)
    p = tmp_path / "a.wav"
    _write_ref_wav(str(p), x)
    got, sr = native.load_wav(str(p))
    from scipy.io import wavfile
    _, ref = wavfile.read(str(p))
    np.testing.assert_allclose(got, ref.astype(np.float32) / 32768.0,
                               atol=1e-7)
    assert sr == 16000
    assert native.num_samples(str(p)) == 3001


def test_native_stereo_channel0(tmp_path, lib_ok):
    from scipy.io import wavfile
    rng = np.random.RandomState(1)
    st = (rng.randn(500, 2) * 8000).astype(np.int16)
    p = tmp_path / "st.wav"
    wavfile.write(str(p), 16000, st)
    got, _ = native.load_wav(str(p))
    np.testing.assert_allclose(got, st[:, 0].astype(np.float32) / 32768.0,
                               atol=1e-7)
    assert native.num_samples(str(p)) == 500


def test_native_float32_wav(tmp_path, lib_ok):
    from scipy.io import wavfile
    rng = np.random.RandomState(2)
    x = rng.randn(400).astype(np.float32) * 0.1
    p = tmp_path / "f32.wav"
    wavfile.write(str(p), 16000, x)  # float32 container (format 3)
    got, _ = native.load_wav(str(p))
    np.testing.assert_allclose(got, x, atol=1e-7)


def test_batch_loader(tmp_path, lib_ok):
    rng = np.random.RandomState(3)
    paths, refs = [], []
    for i, n in enumerate((100, 300, 200)):
        x = (rng.randn(n) * 0.2).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        _write_ref_wav(str(p), x)
        paths.append(str(p))
        refs.append(x)
    buf, lengths = native.load_batch(paths, pad_to=300, n_threads=3)
    assert buf.shape == (3, 300)
    np.testing.assert_array_equal(lengths, [100, 300, 200])
    for i, x in enumerate(refs):
        ref = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
        ref = ref.astype(np.float32) / 32768.0
        np.testing.assert_allclose(buf[i, :len(x)], ref, atol=1e-7)
        assert (buf[i, len(x):] == 0).all()


def test_batch_loader_missing_file_falls_back(tmp_path, lib_ok):
    assert native.load_batch([str(tmp_path / "nope.wav")], 100) is None


def test_fileio_uses_native_and_matches(tmp_path, lib_ok):
    from espnet_slurp_tpu.data.fileio import load_wav, wav_num_samples
    rng = np.random.RandomState(4)
    x = (rng.randn(777) * 0.3).astype(np.float32)
    p = tmp_path / "c.wav"
    _write_ref_wav(str(p), x)
    wav, sr = load_wav(str(p))
    assert sr == 16000 and wav.shape == (777,)
    assert wav_num_samples(str(p)) == 777


def test_native_edit_distance_matches_python():
    """Native batch scorer == python align_stats on random pairs
    (identical tie-breaking, not just equal WER)."""
    import numpy as np
    from espnet_slurp_tpu.native import edit_stats_batch
    from espnet_slurp_tpu.utils.metrics import align_stats

    rng = np.random.RandomState(0)
    refs, hyps = [], []
    for _ in range(50):
        n, m = rng.randint(0, 30), rng.randint(0, 30)
        refs.append(list(rng.randint(0, 8, size=n)))
        hyps.append(list(rng.randint(0, 8, size=m)))
    out = edit_stats_batch(refs, hyps)
    if out is None:  # no g++ in this environment
        import pytest
        pytest.skip("native toolchain unavailable")
    for (r, h, row) in zip(refs, hyps, out):
        want = align_stats(r, h)
        assert (want.hits, want.substitutions, want.deletions,
                want.insertions) == tuple(int(v) for v in row), (r, h)


def test_error_rate_native_path(tmp_path):
    from espnet_slurp_tpu.utils.metrics import error_rate
    refs = {"a": "the cat sat", "b": "hello world"}
    hyps = {"a": "the bat sat down", "b": "hello"}
    wer, stats = error_rate(refs, hyps)
    # 1 sub + 1 ins (a) + 1 del (b) over 5 ref words
    assert stats.substitutions == 1 and stats.insertions == 1 \
        and stats.deletions == 1
    assert wer == 3 / 5
