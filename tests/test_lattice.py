"""Lattice decode (decode/lattice.py — asr_inference_k2.py analogue):
n-best extraction consistency and rescoring behavior."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from espnet_slurp_tpu.decode.lattice import (LatticeConfig,  # noqa: E402
                                             lattice_rescore_decode,
                                             lm_seq_scores,
                                             ngram_seq_scores)
from espnet_slurp_tpu.decode.timesync import (TimeSyncConfig,  # noqa: E402
                                              ctc_prefix_beam_full,
                                              ctc_timesync_beam_search)
from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel  # noqa: E402
from espnet_slurp_tpu.ops.frontend import FrontendConfig  # noqa: E402


def _tiny_model(seed=0, b=2):
    cfg = ASRConfig(
        vocab_size=8, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.5,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(seed)
    batch = {"speech": jnp.asarray(rng.randn(b, 1600).astype(np.float32)),
             "speech_lengths": jnp.full((b,), 1600, jnp.int32),
             "text": jnp.asarray(np.tile([[1, 2, 3]], (b, 1))),
             "text_lengths": jnp.full((b,), 3, jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    hs, hl, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    return model, params, hs, hl


def test_nbest_top1_matches_timesync():
    """With pure CTC scores, the lattice argmax equals the timesync 1-best."""
    model, params, hs, hl = _tiny_model()
    ts = TimeSyncConfig(beam_size=4, pre_beam_size=7, max_len=8)
    t_toks, t_lens = ctc_timesync_beam_search(model, params, hs, hl, ts)
    out, out_len, det = lattice_rescore_decode(
        model, params, hs, hl,
        LatticeConfig(beam_size=4, pre_beam_size=7, max_len=8))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(t_toks))
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(t_lens))
    assert det["total"].shape == (2, 4)


def test_nbest_scores_sorted_and_distinct():
    model, params, hs, hl = _tiny_model(seed=3)
    toks, lens, scores = ctc_prefix_beam_full(
        model, params, hs, hl,
        TimeSyncConfig(beam_size=4, pre_beam_size=7, max_len=8))
    s = np.asarray(scores)
    assert s.shape == (2, 4)
    # beam paths hold finite, non-increasing-ish scores (top-k each frame
    # guarantees slot 0 >= others after the final frame's top_k)
    assert np.all(np.isfinite(s[:, 0]))
    assert np.all(s[:, 0] + 1e-4 >= s.max(axis=1))


def test_length_bonus_changes_selection():
    """A large length bonus must select the longest path in the beam."""
    model, params, hs, hl = _tiny_model(seed=5)
    toks, lens, _ = ctc_prefix_beam_full(
        model, params, hs, hl,
        TimeSyncConfig(beam_size=4, pre_beam_size=7, max_len=8))
    out, out_len, _ = lattice_rescore_decode(
        model, params, hs, hl,
        LatticeConfig(beam_size=4, pre_beam_size=7, max_len=8,
                      length_bonus=1e6))
    np.testing.assert_array_equal(np.asarray(out_len),
                                  np.asarray(lens).max(axis=1))


def test_lm_and_ngram_rescoring_paths():
    """NN-LM and n-gram sequence scorers return finite [B, K] scores and
    shift the composed total."""
    import tempfile
    from espnet_slurp_tpu.models.lm import LMConfig, TransformerLM
    from espnet_slurp_tpu.decode.ngram import ArpaLM, make_ngram_fusion
    from espnet_slurp_tpu.decode.ngram_train import train_arpa

    model, params, hs, hl = _tiny_model(seed=7)
    toks, lens, ctc = ctc_prefix_beam_full(
        model, params, hs, hl,
        TimeSyncConfig(beam_size=4, pre_beam_size=7, max_len=8))

    lm_cfg = LMConfig(arch="transformer", vocab_size=8, d_model=16,
                      n_head=2, d_ff=32, num_blocks=1, dropout_rate=0.0)
    lm = TransformerLM(lm_cfg)
    lm_params = lm.init(jax.random.PRNGKey(1),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.asarray([4]))["params"]
    lm_s = lm_seq_scores(lm, lm_params, toks, lens, sos_id=7, eos_id=7)
    assert lm_s.shape == (2, 4) and np.all(np.isfinite(np.asarray(lm_s)))

    with tempfile.TemporaryDirectory() as td:
        arpa_path = f"{td}/lm.arpa"
        sents = [["a", "b", "c"], ["a", "b"], ["c", "a"]] * 5
        train_arpa(sents, arpa_path, order=2)
        tok2id = {"a": 1, "b": 2, "c": 3, "<s>": 7, "</s>": 7}
        arpa = ArpaLM(arpa_path, tok2id, 8)
        si = make_ngram_fusion(arpa, 7)
        ng = ngram_seq_scores(si, toks, lens, sos_id=7)
        assert ng.shape == (2, 4)
        assert np.all(np.isfinite(np.asarray(ng)))
