"""Transducer tests: RNN-T loss vs numpy DP (and torchaudio if present),
model forward/backward, greedy decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.ops.transducer import rnnt_loss, rnnt_loss_from_logprobs


def np_rnnt_loss(log_probs, labels, T, U, blank=0):
    """Reference alpha recursion in plain numpy (log space)."""
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + log_probs[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1]
                             + log_probs[t, u - 1, labels[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands) if cands else -np.inf
    return -(alpha[T - 1, U] + log_probs[T - 1, U, blank])


@pytest.mark.parametrize("t,u,v", [(4, 2, 5), (7, 3, 6), (3, 3, 4)])
def test_rnnt_loss_vs_numpy(t, u, v):
    rng = np.random.RandomState(0)
    logits = rng.randn(1, t, u + 1, v).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = rng.randint(1, v, size=(1, u))
    loss = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                     jnp.array([t]), jnp.array([u]))
    ref = np_rnnt_loss(lp[0], labels[0], t, u)
    np.testing.assert_allclose(float(loss[0]), ref, rtol=1e-4)


def test_rnnt_loss_batch_lengths():
    """Padded batch must match per-example unpadded losses."""
    rng = np.random.RandomState(1)
    b, t, u, v = 3, 8, 4, 6
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    labels = rng.randint(1, v, size=(b, u))
    tl = np.array([8, 5, 3])
    ul = np.array([4, 2, 1])
    loss = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                     jnp.asarray(tl), jnp.asarray(ul))
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    for i in range(b):
        ref = np_rnnt_loss(lp[i], labels[i], tl[i], ul[i])
        np.testing.assert_allclose(float(loss[i]), ref, rtol=1e-4,
                                   err_msg=f"example {i}")


def test_rnnt_loss_vs_torchaudio():
    ta = pytest.importorskip("torchaudio")
    import torch
    rng = np.random.RandomState(2)
    b, t, u, v = 2, 10, 5, 8
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    labels = rng.randint(1, v, size=(b, u)).astype(np.int32)
    tl = np.array([10, 7], np.int32)
    ul = np.array([5, 3], np.int32)
    ours = rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                     jnp.asarray(tl), jnp.asarray(ul))
    theirs = ta.functional.rnnt_loss(
        torch.from_numpy(logits), torch.from_numpy(labels),
        torch.from_numpy(tl), torch.from_numpy(ul), blank=0,
        reduction="none")
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4)


def test_rnnt_grads_finite():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 6, 4, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, 5, size=(2, 3)))

    def f(lg):
        return rnnt_loss(lg, labels, jnp.array([6, 4]),
                         jnp.array([3, 2])).sum()

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_transducer_model_and_greedy():
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.models.transducer import (TransducerConfig,
                                                    TransducerModel,
                                                    transducer_greedy_decode)
    from espnet_slurp_tpu.ops.frontend import FrontendConfig

    cfg = TransducerConfig(
        asr=ASRConfig(vocab_size=20, d_model=32, n_head=2, d_ff=64,
                      num_encoder_blocks=1, kernel_size=7, dropout_rate=0.0,
                      frontend=FrontendConfig(n_fft=128, hop_length=64,
                                              n_mels=16),
                      specaug=None),
        pred_dim=32, joint_dim=32, aux_ctc_weight=0.3)
    model = TransducerModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 19, size=(2, 5))),
        "text_lengths": jnp.asarray([5, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, **batch)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "loss_transducer" in stats and "loss_ctc" in stats
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))

    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    tokens, n = transducer_greedy_decode(model, params, hs, h_lengths,
                                         max_len=10)
    assert tokens.shape == (2, 10)
    assert (np.asarray(n) <= 10).all()


def test_transducer_beam_search():
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.models.transducer import (TransducerConfig,
                                                    TransducerModel)
    from espnet_slurp_tpu.decode.transducer_beam import (
        TransducerBeamConfig, transducer_beam_search)
    from espnet_slurp_tpu.ops.frontend import FrontendConfig

    cfg = TransducerConfig(
        asr=ASRConfig(vocab_size=20, d_model=32, n_head=2, d_ff=64,
                      num_encoder_blocks=1, kernel_size=7, dropout_rate=0.0,
                      frontend=FrontendConfig(n_fft=128, hop_length=64,
                                              n_mels=16),
                      specaug=None),
        pred_dim=32, joint_dim=32)
    model = TransducerModel(cfg)
    rng = np.random.RandomState(0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(rng.randint(1, 19, size=(2, 5))),
        "text_lengths": jnp.asarray([5, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    tokens, lengths = transducer_beam_search(
        model, params, hs, h_lengths,
        TransducerBeamConfig(beam_size=3, pre_beam_size=4, max_len=8))
    assert tokens.shape == (2, 8)
    assert (np.asarray(lengths) <= 8).all()
    assert np.isfinite(np.asarray(lengths)).all()


def test_transducer_task_e2e(tmp_path):
    """Train the transducer task on the mini corpus, then decode."""
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.data.fileio import load_wav, read_2column_text
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.models.transducer import TransducerConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.asr import DataConfig
    from espnet_slurp_tpu.tasks.asr_transducer import (
        ASRTransducerTask, Speech2TextTransducer, TransducerTaskConfig)
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=8, n_dev=2)
    cfg = TransducerTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=TransducerConfig(
            asr=ASRConfig(d_model=32, n_head=2, d_ff=64,
                          num_encoder_blocks=1, kernel_size=7,
                          dropout_rate=0.0,
                          frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                  n_mels=16),
                          specaug=None),
            pred_dim=32, joint_dim=32),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted", batch_size=4,
                        speech_bucket_multiple=2048, text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    state = ASRTransducerTask.train(cfg)
    assert int(state.step) > 0
    s2t = Speech2TextTransducer(cfg.exp_dir, beam_size=2, max_len=8)
    wavs = read_2column_text(dev_dir / "wav.scp")
    wav, _ = load_wav(next(iter(wavs.values())))
    out = s2t(wav)
    assert isinstance(out, str)


def test_kb_aware_transducer():
    """TCPGen mixed inside the RNN-T loss (KB-aware transducer)."""
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.models.transducer import (TransducerConfig,
                                                    TransducerModel)
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.slu.kb import build_trie, walk_trie

    cfg = TransducerConfig(
        asr=ASRConfig(vocab_size=20, d_model=32, n_head=2, d_ff=64,
                      num_encoder_blocks=1, kernel_size=7, dropout_rate=0.0,
                      frontend=FrontendConfig(n_fft=128, hop_length=64,
                                              n_mels=16),
                      specaug=None),
        pred_dim=32, joint_dim=32, use_tcpgen=True)
    model = TransducerModel(cfg)
    t = build_trie([[3, 4], [5]], pad_nodes_multiple=8)
    rng = np.random.RandomState(0)
    text = np.array([[3, 4, 5, 2], [5, 1, 1, 1]], np.int32)
    pred_in = np.concatenate([np.zeros((2, 1), np.int32), text], 1)
    node, mask = walk_trie(t, pred_in, set(), 0)
    batch = {
        "speech": jnp.asarray(rng.randn(2, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(text), "text_lengths": jnp.asarray([4, 3]),
        "trie_token": jnp.asarray(t.token),
        "trie_children_tok": jnp.asarray(t.children_tok),
        "trie_children_node": jnp.asarray(t.children_node),
        "trie_n_children": jnp.asarray(t.n_children),
        "node": jnp.asarray(node), "p_gen_mask": jnp.asarray(mask),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    assert "tcpgen" in params

    def loss_fn(p):
        loss, stats = model.apply({"params": p}, **batch)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree.leaves(grads["tcpgen"]))


def _toy_transducer():
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.models.transducer import (TransducerConfig,
                                                    TransducerModel)
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    cfg = TransducerConfig(
        asr=ASRConfig(vocab_size=12, d_model=32, n_head=2, d_ff=64,
                      num_encoder_blocks=1, kernel_size=7, dropout_rate=0.0,
                      frontend=FrontendConfig(n_fft=128, hop_length=64,
                                              n_mels=16),
                      specaug=None),
        pred_dim=32, joint_dim=32)
    model = TransducerModel(cfg)
    rng = np.random.RandomState(4)
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32) * 0.3),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray(rng.randint(1, 11, size=(1, 4))),
        "text_lengths": jnp.asarray([4]),
    }
    params = model.init(jax.random.PRNGKey(1), **batch)["params"]
    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    return model, params, hs, h_lengths


def test_maes_matches_serial_reference():
    """Batched mAES == a serial python port of the reference algorithm
    (beam_search_transducer.py:720-877, without prefix merge/dedup —
    the same documented deviations as the batched kernel)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from espnet_slurp_tpu.decode.transducer_beam import (MAESConfig,
                                                         maes_search)

    model, params, hs, h_lengths = _toy_transducer()
    cfg = MAESConfig(beam_size=3, nstep=2, max_candidates=3,
                     expansion_gamma=2.3, max_len=8)
    got_t, got_l = maes_search(model, params, hs, h_lengths, cfg)

    # serial reference
    a = model.cfg.asr
    blank = a.blank_id
    n_frames = int(h_lengths[0])

    def pred(y, carry):
        g, c = model.apply({"params": params},
                           jnp.asarray([y], jnp.int32), carry,
                           method=lambda m, yy, cc: m.prediction.step(yy, cc))
        return g, c

    def joint(t, g):
        h_t = hs[0:1, t]
        logits = model.apply({"params": params}, h_t, g,
                             method=lambda m, h, gg: m.joint(h, gg))
        return np.asarray(jax.nn.log_softmax(
            logits.astype(jnp.float32), -1))[0]

    carry0 = model.apply({"params": params},
                         method=lambda m: m.prediction.init_carry(1))
    g0, carry0 = pred(blank, carry0)
    hyps = [([], 0.0, g0, carry0)]  # (tokens, score, g, carry)
    for t in range(n_frames):
        settled = []
        active = hyps
        for r in range(cfg.nstep):
            cand_settled = []
            cand_active = []
            for toks, score, g, carry in active:
                lp = joint(t, g)
                nb = lp.copy()
                nb[blank] = -1e30
                top = np.argsort(-nb)[:cfg.max_candidates]
                best = max(nb[top[0]], lp[blank])
                if lp[blank] >= best - cfg.expansion_gamma:
                    cand_settled.append((toks, score + lp[blank], g, carry))
                for v in top:
                    if nb[v] >= best - cfg.expansion_gamma \
                            and len(toks) < cfg.max_len:
                        g2, c2 = pred(int(v), carry)
                        cand_active.append((toks + [int(v)],
                                            score + nb[v], g2, c2))
            # joint top-K over settled-carry + new candidates
            pool = [(s, "s") for s in settled] + \
                   [(s, "s") for s in cand_settled] + \
                   [(x, "a") for x in cand_active]
            pool.sort(key=lambda x: -x[0][1])
            pool = pool[:cfg.beam_size]
            settled = [h for h, kind in pool if kind == "s"]
            active = [h for h, kind in pool if kind == "a"]
            if not active:
                break
        # force-settle remaining actives with blank
        for toks, score, g, carry in active:
            lp = joint(t, g)
            settled.append((toks, score + lp[blank], g, carry))
        settled.sort(key=lambda x: -x[1])
        hyps = settled[:cfg.beam_size]
    want = max(hyps, key=lambda x: x[1])[0]
    got = list(np.asarray(got_t)[0][: int(got_l[0])])
    assert got == want, (got, want)


@pytest.mark.parametrize("search,nstep,mc", [("tsd", 2, 3), ("nsc", 2, 2)])
def test_tsd_nsc_match_serial_reference(search, nstep, mc):
    """Batched TSD/NSC == a serial python port of the reference frame-sync
    loop (beam_search_transducer.py:356-451 / :557-719, without prefix
    merge/dedup — the same documented deviations as the batched kernel).
    TSD/NSC are the gamma=None members of the shared machinery."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from espnet_slurp_tpu.decode.transducer_beam import (NSCConfig,
                                                         TSDConfig,
                                                         nsc_search,
                                                         tsd_search)

    model, params, hs, h_lengths = _toy_transducer()
    if search == "tsd":
        cfg = TSDConfig(beam_size=3, max_sym_exp=nstep, max_len=8)
        got_t, got_l = tsd_search(model, params, hs, h_lengths, cfg)
        max_candidates = cfg.beam_size
    else:
        cfg = NSCConfig(beam_size=3, nstep=nstep, max_candidates=mc,
                        max_len=8)
        got_t, got_l = nsc_search(model, params, hs, h_lengths, cfg)
        max_candidates = cfg.max_candidates

    a = model.cfg.asr
    blank = a.blank_id
    n_frames = int(h_lengths[0])

    def pred(y, carry):
        g, c = model.apply({"params": params},
                           jnp.asarray([y], jnp.int32), carry,
                           method=lambda m, yy, cc: m.prediction.step(yy, cc))
        return g, c

    def joint(t, g):
        h_t = hs[0:1, t]
        logits = model.apply({"params": params}, h_t, g,
                             method=lambda m, h, gg: m.joint(h, gg))
        return np.asarray(jax.nn.log_softmax(
            logits.astype(jnp.float32), -1))[0]

    carry0 = model.apply({"params": params},
                         method=lambda m: m.prediction.init_carry(1))
    g0, carry0 = pred(blank, carry0)
    hyps = [([], 0.0, g0, carry0)]
    for t in range(n_frames):
        settled = []
        active = hyps
        for r in range(nstep):
            cand_settled = []
            cand_active = []
            for toks, score, g, carry in active:
                lp = joint(t, g)
                nb = lp.copy()
                nb[blank] = -1e30
                top = np.argsort(-nb)[:max_candidates]
                cand_settled.append((toks, score + lp[blank], g, carry))
                for v in top:
                    if len(toks) < cfg.max_len:
                        g2, c2 = pred(int(v), carry)
                        cand_active.append((toks + [int(v)],
                                            score + nb[v], g2, c2))
            pool = [(s, "s") for s in settled] + \
                   [(s, "s") for s in cand_settled] + \
                   [(x, "a") for x in cand_active]
            pool.sort(key=lambda x: -x[0][1])
            pool = pool[:cfg.beam_size]
            settled = [h for h, kind in pool if kind == "s"]
            active = [h for h, kind in pool if kind == "a"]
            if not active:
                break
        for toks, score, g, carry in active:
            lp = joint(t, g)
            settled.append((toks, score + lp[blank], g, carry))
        settled.sort(key=lambda x: -x[1])
        hyps = settled[:cfg.beam_size]
    want = max(hyps, key=lambda x: x[1])[0]
    got = list(np.asarray(got_t)[0][: int(got_l[0])])
    assert got == want, (got, want)


def test_transducer_streaming_e2e(tmp_path):
    """Streaming transducer: chunk-attention train -> incremental decode
    matches the full-utterance greedy result (exact streaming semantics),
    driven through the CLI --streaming path too."""
    from espnet_slurp_tpu.data.mini_corpus import make_mini_corpus
    from espnet_slurp_tpu.data.fileio import load_wav, read_2column_text
    from espnet_slurp_tpu.decode.streaming import (
        StreamingTransducerRecognizer)
    from espnet_slurp_tpu.models.asr_model import ASRConfig
    from espnet_slurp_tpu.models.transducer import TransducerConfig
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.tasks.asr import DataConfig
    from espnet_slurp_tpu.tasks.asr_transducer import (
        ASRTransducerTask, Speech2TextTransducer, TransducerTaskConfig)
    from espnet_slurp_tpu.train.optim import OptimConfig

    train_dir, dev_dir = make_mini_corpus(tmp_path / "c", n_train=8,
                                          n_dev=2)
    cfg = TransducerTaskConfig(
        exp_dir=str(tmp_path / "exp"),
        model=TransducerConfig(
            asr=ASRConfig(d_model=32, n_head=2, d_ff=64,
                          num_encoder_blocks=1, kernel_size=7,
                          dropout_rate=0.0, chunk_size=4, left_chunks=1,
                          frontend=FrontendConfig(n_fft=128, hop_length=64,
                                                  n_mels=16),
                          specaug=None),
            pred_dim=32, joint_dim=32),
        optim=OptimConfig(lr=1e-3, scheduler="constant"),
        data=DataConfig(train_dir=str(train_dir), valid_dir=str(dev_dir),
                        token_type="word", batch_type="sorted",
                        batch_size=4, speech_bucket_multiple=2048,
                        text_bucket_multiple=4),
        max_epoch=1, keep_nbest=1, nbest_average=1)
    ASRTransducerTask.train(cfg)

    s2t = Speech2TextTransducer(cfg.exp_dir, beam_size=1, max_len=8,
                                search="greedy")
    wavs = read_2column_text(dev_dir / "wav.scp")
    wav, _ = load_wav(next(iter(wavs.values())))
    full = s2t(wav)

    rec = StreamingTransducerRecognizer(
        s2t.model, s2t.params, tokenizer=s2t.tokenizer,
        converter=s2t.converter, chunk_samples=800, max_len=8,
        beam_size=1, search="greedy")
    ids = []
    n = 800
    for off in range(0, len(wav), n):
        ids, done = rec(wav[off:off + n], is_final=off + n >= len(wav))
    assert rec.text(ids) == full

    from espnet_slurp_tpu.bin.asr_transducer_inference import (
        main as cli_main)
    rc = cli_main(["--exp_dir", cfg.exp_dir, "--data_dir", str(dev_dir),
                   "--output_dir", str(tmp_path / "dec"), "--beam_size",
                   "2", "--streaming", "--sim_chunk_length", "800"])
    assert rc == 0
    assert (tmp_path / "dec" / "text").exists()


def test_default_beam_matches_serial_reference():
    """Batched `default` beam search == a serial python port of the
    reference Graves-2012 loop (beam_search_transducer.py:255-355), with
    the same documented deviations as the batched kernel: expansion cap E
    per frame, kept pool truncated to top-K, no prefix merge."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from espnet_slurp_tpu.decode.transducer_beam import (DefaultBeamConfig,
                                                         default_beam_search)

    model, params, hs, h_lengths = _toy_transducer()
    cfg = DefaultBeamConfig(beam_size=3, max_len=8, max_expansions=10)
    got_t, got_l = default_beam_search(model, params, hs, h_lengths, cfg)

    a = model.cfg.asr
    blank = a.blank_id
    k, l, e = cfg.beam_size, cfg.max_len, cfg.max_expansions
    bk = min(k, a.vocab_size - 1)
    n_frames = int(h_lengths[0])

    def pred(y, carry):
        g, c = model.apply({"params": params},
                           jnp.asarray([y], jnp.int32), carry,
                           method=lambda m, yy, cc: m.prediction.step(yy, cc))
        return g, c

    def joint(t, g):
        h_t = hs[0:1, t]
        logits = model.apply({"params": params}, h_t, g,
                             method=lambda m, h, gg: m.joint(h, gg))
        return np.asarray(jax.nn.log_softmax(
            logits.astype(jnp.float32), -1))[0]

    carry0 = model.apply({"params": params},
                         method=lambda m: m.prediction.init_carry(1))
    g0, carry0 = pred(blank, carry0)
    hyps = [([], 0.0, g0, carry0)]  # kept across frames
    for t in range(n_frames):
        act = list(hyps)
        kept = []
        for _ in range(e):
            i = int(np.argmax([h[1] for h in act]))
            toks, score, g, carry = act.pop(i)
            lp = joint(t, g)
            kept.append((toks, score + lp[blank], g, carry))
            kept = sorted(kept, key=lambda x: -x[1])[:k]
            nb = lp.copy()
            nb[blank] = -1e30
            for v in np.argsort(-nb)[:bk]:
                if len(toks) < l:
                    g2, c2 = pred(int(v), carry)
                    act.append((toks + [int(v)], score + nb[v], g2, c2))
            hyps_max = max(h[1] for h in act)
            if len([x for x in kept if x[1] > hyps_max]) >= k:
                break
        hyps = sorted(kept, key=lambda x: -x[1])[:k]
    want = max(hyps, key=lambda x: x[1])[0]
    got = list(np.asarray(got_t)[0][: int(got_l[0])])
    assert got == want, (got, want)
