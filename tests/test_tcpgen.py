"""TCPGen tests: trie build/walk, device walk parity, GCN, pointer mixing,
full-model training with biasing, and a learnability check."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.models.tcpgen import (TCPGen, tcpgen_final_logprobs,
                                            trie_step)
from espnet_slurp_tpu.slu.kb import (BiasingListSampler, build_trie,
                                     walk_trie)


def small_trie():
    # words over subword ids: [3,4], [3,5], [6]
    return build_trie([[3, 4], [3, 5], [6]], pad_nodes_multiple=8)


def test_build_trie():
    t = small_trie()
    assert t.n_nodes == 6  # root + {3,34,35,6} + dead
    root_children = t.children_tok[0, :t.n_children[0]]
    np.testing.assert_array_equal(sorted(root_children), [3, 6])
    # node for token 3 has children 4 and 5
    n3 = t.children_node[0, list(root_children).index(3)]
    np.testing.assert_array_equal(
        sorted(t.children_tok[n3, :t.n_children[n3]]), [4, 5])
    assert t.word_end[t.children_node[n3, 0]]
    assert t.n_children[t.dead] == 0


def test_walk_trie():
    t = small_trie()
    eos = 9
    # prev tokens: eos(->root) 3(->n3) 4(->leaf34, in-tree) 7(out->dead)
    prev = np.array([[eos, 3, 4, 7]])
    node, mask = walk_trie(t, prev, boundary_ids=set(), eos_id=eos)
    assert node[0, 0] == 0 and mask[0, 0] == 0
    assert node[0, 1] != 0 and mask[0, 1] == 0
    assert mask[0, 2] == 0
    assert node[0, 3] == t.dead and mask[0, 3] == 1


def test_trie_step_matches_walk():
    t = small_trie()
    eos = 9
    trie = {"trie_token": jnp.asarray(t.token),
            "trie_children_tok": jnp.asarray(t.children_tok),
            "trie_children_node": jnp.asarray(t.children_node),
            "trie_n_children": jnp.asarray(t.n_children)}
    boundary = jnp.zeros((11,), bool)
    seqs = np.array([[eos, 3, 4, 7, 6], [3, 5, eos, 6, 2]])
    node_ref, mask_ref = walk_trie(t, seqs, set(), eos)
    node = jnp.zeros((2,), jnp.int32)
    for j in range(seqs.shape[1]):
        node, mask = trie_step(trie, node, jnp.asarray(seqs[:, j]),
                               boundary, eos, t.dead)
        np.testing.assert_array_equal(np.asarray(node), node_ref[:, j])
        np.testing.assert_array_equal(np.asarray(mask), mask_ref[:, j])


def test_tcpgen_ptr_dist_is_distribution():
    t = small_trie()
    vocab = 10
    model = TCPGen(d_model=16, vocab_size=vocab, gcn_layers=2)
    trie = {"trie_token": jnp.asarray(t.token),
            "trie_children_tok": jnp.asarray(t.children_tok),
            "trie_children_node": jnp.asarray(t.children_node),
            "trie_n_children": jnp.asarray(t.n_children)}
    token_embs = jnp.asarray(
        np.random.RandomState(0).randn(len(t.token), 16), jnp.float32)
    queries = jnp.asarray(np.random.RandomState(1).randn(2, 3, 16),
                          jnp.float32)
    node_ids = jnp.asarray([[0, 1, 0], [0, 0, int(t.dead)]])
    def full(m, q, n, tr, embs):
        encs = m.encode_tree(embs, tr)
        return m(q, n, tr, encs)

    params = model.init(jax.random.PRNGKey(0), queries, node_ids, trie,
                        token_embs, method=full)["params"]
    ptr, kb = model.apply({"params": params}, queries, node_ids, trie,
                          token_embs, method=full)
    ptr = np.asarray(ptr)
    np.testing.assert_allclose(ptr.sum(-1), 1.0, rtol=1e-5)
    assert (ptr >= 0).all()
    # root node: only children tokens {3, 6} and OOKB get mass
    mass = ptr[0, 0]
    assert mass[[3, 6]].sum() + mass[vocab] > 0.999
    assert abs(mass[[0, 1, 2, 4, 5, 7, 8, 9]].sum()) < 1e-6


def test_tcpgen_final_logprobs_is_distribution():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 5, 10), jnp.float32)
    ptr = jax.nn.softmax(jnp.asarray(rng.randn(2, 5, 11)), -1)
    p_gen = jnp.asarray(rng.uniform(0, 1, (2, 5)), jnp.float32)
    logp = tcpgen_final_logprobs(logits, ptr, p_gen)
    total = np.exp(np.asarray(logp)).sum(-1)
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)
    # p_gen = 0 -> plain model distribution
    logp0 = tcpgen_final_logprobs(logits, ptr, jnp.zeros((2, 5)))
    np.testing.assert_allclose(
        np.asarray(logp0), np.asarray(jax.nn.log_softmax(logits, -1)),
        atol=2e-5)


def test_asr_model_with_tcpgen_trains():
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig

    cfg = ASRConfig(
        vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3, use_tcpgen=True,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    t = build_trie([[3, 4], [5]], pad_nodes_multiple=8)
    rng = np.random.RandomState(0)
    b, u = 2, 4
    text = np.array([[3, 4, 5, 2], [5, 1, 1, 1]], np.int32)
    text_lengths = np.array([4, 3], np.int32)
    ys_in = np.concatenate(
        [np.full((b, 1), cfg.sos_id, np.int32), text], axis=1)
    node, mask = walk_trie(t, ys_in, set(), cfg.eos_id)
    batch = {
        "speech": jnp.asarray(rng.randn(b, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600, 800]),
        "text": jnp.asarray(text), "text_lengths": jnp.asarray(text_lengths),
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
    assert "p_gen" in stats and 0.0 <= float(stats["p_gen"]) <= 1.0
    g = jax.tree.leaves(grads["tcpgen"])
    assert any(float(jnp.abs(x).max()) > 0 for x in g)


def test_biasing_sampler():
    full = [[3, 4], [5], [6, 7], [8]]
    s = BiasingListSampler(full, n_distractors=2, drop_prob=0.0, seed=0)
    out = s.sample([[3, 4], [9, 9]])
    assert (3, 4) in out
    assert len(out) >= 2


def test_beam_search_with_biasing_runs():
    """Beam search with a TCPGen model + biasing trie produces valid hyps."""
    from espnet_slurp_tpu.decode.beam import (BeamSearchConfig,
                                              batch_beam_search)
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig

    cfg = ASRConfig(
        vocab_size=20, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.3, use_tcpgen=True,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    t = build_trie([[3, 4], [5]], pad_nodes_multiple=8)
    rng = np.random.RandomState(0)
    text = np.array([[3, 4, 5, 2]], np.int32)
    ys_in = np.concatenate([np.full((1, 1), cfg.sos_id, np.int32), text], 1)
    node, mask = walk_trie(t, ys_in, set(), cfg.eos_id)
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32) * 0.1),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray(text), "text_lengths": jnp.asarray([4]),
        "trie_token": jnp.asarray(t.token),
        "trie_children_tok": jnp.asarray(t.children_tok),
        "trie_children_node": jnp.asarray(t.children_node),
        "trie_n_children": jnp.asarray(t.n_children),
        "node": jnp.asarray(node), "p_gen_mask": jnp.asarray(mask),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    hs, h_lengths, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    biasing = {
        "trie": {k: batch[k] for k in
                 ("trie_token", "trie_children_tok", "trie_children_node",
                  "trie_n_children")},
        "boundary_mask": jnp.zeros((21,), bool),
        "dead": t.dead, "smoothprob": 1.0,
    }
    tokens, lengths = batch_beam_search(
        model, params, hs, h_lengths,
        BeamSearchConfig(beam_size=3, pre_beam_size=8, max_len=6,
                         ctc_weight=0.3), biasing=biasing)
    assert tokens.shape == (1, 6)
    assert 0 <= int(lengths[0]) <= 6

    # Diagnostic override: forcing p_gen ~ 1 must steer the first emitted
    # token into the trie's root children (pointer mass concentrates on
    # {3, 5} + OOKB; the untrained model distribution is ~uniform/20 and
    # scaled by (1 - p_gen + p_gen * w_ookb) << ptr mass).
    tokens_f, lengths_f = batch_beam_search(
        model, params, hs, h_lengths,
        BeamSearchConfig(beam_size=3, pre_beam_size=8, max_len=6,
                         ctc_weight=0.0),
        biasing={**biasing, "force_p_gen": 0.95})
    assert int(lengths_f[0]) >= 1
    assert int(tokens_f[0, 0]) in (3, 5)


def test_tree_encoder_family():
    """GAT/GraphSAGE/TreeLSTM tree encoders: config-switchable, finite,
    distinct; TreeLSTM matches a recursive python child-sum reference."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from espnet_slurp_tpu.models.tcpgen import (TREE_ENCODERS, TCPGen,
                                                TreeLSTMEncoder)
    from espnet_slurp_tpu.slu.kb import build_trie
    trie = build_trie([[3, 4], [3, 5, 6], [7, 8]])
    cn = jnp.asarray(trie.children_node)
    nc = jnp.asarray(trie.n_children)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(trie.token.shape[0], 16).astype(np.float32))

    outs = {}
    for name, cls in TREE_ENCODERS.items():
        enc = cls(16) if name == "treelstm" else cls(16, 1)
        p = enc.init(jax.random.PRNGKey(1), feats, cn, nc)["params"]
        out = enc.apply({"params": p}, feats, cn, nc)
        assert out.shape == (feats.shape[0], 16)
        assert np.isfinite(np.asarray(out)).all(), name
        outs[name] = np.asarray(out)
    assert not np.allclose(outs["gcn"], outs["gat"])
    assert not np.allclose(outs["sage"], outs["treelstm"])

    # TreeLSTM: message-passing sweeps == recursive bottom-up child-sum
    enc = TreeLSTMEncoder(16, n_iters=8)
    p = enc.init(jax.random.PRNGKey(2), feats, cn, nc)["params"]
    got = np.asarray(enc.apply({"params": p}, feats, cn, nc))

    iou_k = np.asarray(p["iou_gate"]["kernel"])
    iou_b = np.asarray(p["iou_gate"]["bias"])
    f_k = np.asarray(p["forget_gate"]["kernel"])
    f_b = np.asarray(p["forget_gate"]["bias"])
    x_np = np.asarray(feats)
    sig = lambda v: 1 / (1 + np.exp(-v))

    def rec(node):
        kids = [int(trie.children_node[node, j])
                for j in range(int(trie.n_children[node]))]
        hs, cs = zip(*[rec(k) for k in kids]) if kids else ((), ())
        h_sum = np.sum(hs, axis=0) if kids else np.zeros(16)
        g = np.concatenate([h_sum, x_np[node]]) @ iou_k + iou_b
        i, o, u = sig(g[:16]), sig(g[16:32]), np.tanh(g[32:])
        c = i * u
        for hk, ck in zip(hs, cs):
            f = sig(np.concatenate([hk, x_np[node]]) @ f_k + f_b)
            c = c + f * ck
        h = o * np.tanh(c)
        return h, c

    want, _ = rec(0)
    assert np.max(np.abs(got[0] - want)) < 1e-5

    # config-switchable through TCPGen
    tg = TCPGen(16, 10, 1, tree_encoder="gat")
    td = {"trie_token": jnp.asarray(trie.token),
          "trie_children_tok": jnp.asarray(trie.children_tok),
          "trie_children_node": jnp.asarray(trie.children_node),
          "trie_n_children": jnp.asarray(trie.n_children)}
    q = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    node = jnp.asarray([0, 1])

    def full(m, q, node, t, f):
        encs = m.encode_tree(f, t)
        return m(q, node, t, encs)

    params = tg.init(jax.random.PRNGKey(3), q, node, td, feats,
                     method=full)["params"]
    encs = tg.apply({"params": params}, feats, td,
                    method=lambda m, f, t: m.encode_tree(f, t))
    ptr, kb = tg.apply({"params": params}, q, node, td, encs)
    assert np.isfinite(np.asarray(ptr)).all()


def test_walk_trie_prefix_boundary():
    """Prefix-'▁' convention (HF Metaspace BPE): word-initial tokens restart
    the walk from root THROUGH themselves; completing a word resets to root
    so the pointer stays live for the next word's first piece."""
    t = small_trie()  # words [3,4], [3,5], [6]; 3 and 6 are word-initial
    eos = 9
    bset = {3, 6}
    # 3(root->n3) 4(word done -> ROOT, ptr live) 6(word-initial found,
    # leaf -> ROOT) 7(not boundary, not under root -> ROOT, ptr stays LIVE
    # so the next step can start a biased word) 3(restart) 5(done)
    prev = np.array([[3, 4, 6, 7, 3, 5]])
    node, mask = walk_trie(t, prev, bset, eos, prefix_boundary=True)
    assert node[0, 0] != 0 and mask[0, 0] == 0        # descended into n3
    assert node[0, 1] == 0 and mask[0, 1] == 0        # word done -> root
    assert node[0, 2] == 0 and mask[0, 2] == 0        # [6] done -> root
    assert node[0, 3] == 0 and mask[0, 3] == 0        # out-of-tree -> root
    assert node[0, 4] != 0 and mask[0, 4] == 0        # restart via boundary
    assert node[0, 5] == 0 and mask[0, 5] == 0        # [3,5] done -> root


def test_trie_step_matches_walk_prefix():
    """Decode-time walk must track the training walk in PREFIX mode too —
    otherwise pointer state diverges between teacher forcing and search."""
    t = small_trie()
    eos = 9
    trie = {"trie_token": jnp.asarray(t.token),
            "trie_children_tok": jnp.asarray(t.children_tok),
            "trie_children_node": jnp.asarray(t.children_node),
            "trie_n_children": jnp.asarray(t.n_children)}
    bset = {3, 6}
    boundary = np.zeros((11,), bool)
    for i in bset:
        boundary[i] = True
    boundary = jnp.asarray(boundary)
    seqs = np.array([[3, 4, 6, 7, 3, 5], [eos, 6, 3, 5, 7, 3]])
    node_ref, mask_ref = walk_trie(t, seqs, bset, eos, prefix_boundary=True)
    node = jnp.zeros((2,), jnp.int32)
    for j in range(seqs.shape[1]):
        node, mask = trie_step(trie, node, jnp.asarray(seqs[:, j]),
                               boundary, eos, t.dead, prefix_boundary=True)
        np.testing.assert_array_equal(np.asarray(node), node_ref[:, j],
                                      err_msg=f"step {j}")
        np.testing.assert_array_equal(np.asarray(mask), mask_ref[:, j],
                                      err_msg=f"step {j}")


def test_boundary_token_ids_detection():
    from espnet_slurp_tpu.slu.kb import boundary_token_ids
    ids, prefix = boundary_token_ids(["<blank>", "▁wo", "rd", "▁x"])
    assert prefix and ids == {1, 3}
    ids, prefix = boundary_token_ids(["<blank>", "wo▁", "rd", "x▁"])
    assert not prefix and ids == {1, 3}
    # ADVICE r4 (medium): a bare '▁' token inside an otherwise
    # prefix-marker vocab must not flip detection to suffix (it would run
    # the suffix walk on a prefix trie and silently neutralize biasing).
    ids, prefix = boundary_token_ids(["<blank>", "▁wo", "rd", "▁", "▁x"])
    assert prefix and ids == {1, 3, 4}


def test_suffix_bpe_marking(tmp_path):
    """marker='suffix' re-marks Metaspace pieces so the word-FINAL piece
    carries the ▁ (the fork's bpe_dict_unigram600suffix convention) and
    detokenization round-trips."""
    from espnet_slurp_tpu.data.tokenizer import BpeTokenizer
    texts = ["hello world", "hello there world", "worldly matters hello"]
    path = tmp_path / "bpe.json"
    BpeTokenizer.train(texts, 60, str(path))
    pre = BpeTokenizer(str(path), marker="prefix")
    suf = BpeTokenizer(str(path), marker="suffix")
    for line in texts + ["hello worldly there"]:
        pt = pre.text2tokens(line)
        st = suf.text2tokens(line)
        # same piece count, same round trip
        assert len(pt) == len(st)
        assert pre.tokens2text(pt) == line
        assert suf.tokens2text(st) == line
        # suffix: exactly the word-final pieces end with ▁, none start
        assert not any(t.startswith("▁") for t in st)
        assert sum(t.endswith("▁") for t in st) == len(line.split())
        assert st[-1].endswith("▁")


def test_tcpgen_batch_augmenter_labels():
    """Per-batch sampling + oracle pointer labels + PtrSche ramp."""
    from espnet_slurp_tpu.slu.kb import TCPGenBatchAugmenter
    # biasing words over subword ids; suffix convention: last piece is
    # boundary-marked (represent boundary ids as the set {4, 5, 6, 9}).
    words = [[3, 4], [3, 5], [6]]
    bset = {4, 5, 6, 9}  # word-final pieces + eos-ish
    aug = TCPGenBatchAugmenter(words, bset, sos_id=8, eos_id=7,
                               prefix_boundary=False, kb_len=3,
                               db_drop=0.0, sched_epochs=2, start_epoch=1,
                               seed=0)
    # one utterance: [3, 4] (biased word) then [2, 9] (unbiased word)
    batch = {"text": np.array([[3, 4, 2, 9]], np.int32)}
    out = aug.augment(batch, epoch=1)   # epoch == start -> scale 0
    assert float(out["smoothprob_scale"]) == 0.0
    out3 = aug.augment(batch, epoch=3)  # (3-1)/2 -> 1.0
    assert float(out3["smoothprob_scale"]) == 1.0
    node = np.asarray(out["node"])[0]
    mask = np.asarray(out["p_gen_mask"])[0]
    lab = np.asarray(out["ptr_label_mask"])[0]
    # step 0: consumed sos -> at root, live; target 3 IS a child -> label 1
    assert mask[0] == 0 and lab[0] == 1
    # step 1: consumed 3 -> at node(3), live; target 4 is a child -> 1
    assert mask[1] == 0 and lab[1] == 1
    # step 2: consumed 4 (boundary, word done) -> root, live;
    # target 2 not a child -> OOKB label 2
    assert mask[2] == 0 and lab[2] == 2
    # step 3: consumed 2 (out of tree, not boundary) -> DEAD, masked
    assert mask[3] == 1 and lab[3] == 0
    # step 4: consumed 9 (boundary, resets to root) -> live; target eos
    # not a child -> OOKB
    assert mask[4] == 0 and lab[4] == 2
    # trie shapes are fixed across batches (compile-once contract)
    out2 = aug.augment({"text": np.array([[6, 2, 9]], np.int32)}, epoch=2)
    assert (np.asarray(out2["trie_children_tok"]).shape
            == np.asarray(out["trie_children_tok"]).shape)
    assert np.asarray(out["trie_children_tok"]).shape[0] == aug.pad_nodes
