"""Word-level LM fusion tests: batched LookAhead/MultiLevel hooks vs serial
python ports of the reference semantics (espnet/lm/pytorch_backend/
extlm.py:18-210 with make_lexical_tree's dict tree)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.decode.word_lm import (build_word_trie,
                                             make_lookahead_fusion,
                                             make_multilevel_fusion,
                                             select_class_roots)

V = 10          # subword vocab
SPACE = 8       # boundary token
EOS = 9
W = 6           # word vocab: 0 pad, 1 unk, 2..4 real words, 5 word-eos
W_UNK, W_EOS = 1, 5
# words: id 2 = [3,4]; id 3 = [3,5]; id 4 = [6]
WORDS = [[3, 4], [3, 5], [6]]
WIDS = [2, 3, 4]


def _dict_tree():
    """make_lexical_tree port (lm_utils.py:274-293)."""
    root = [{}, -1, None]
    for seq, wid in zip(WORDS, WIDS):
        succ = root[0]
        for i, c in enumerate(seq):
            if c not in succ:
                succ[c] = [{}, -1, (wid - 1, wid)]
            else:
                prev = succ[c][2]
                succ[c][2] = (min(prev[0], wid - 1), max(prev[1], wid))
            if i == len(seq) - 1:
                succ[c][1] = wid
            succ = succ[c][0]
    return root


def _wordlm_table(rng):
    """Stateless word LM: logits depend only on the last word."""
    table = jnp.asarray(rng.randn(W, W).astype(np.float32))

    def step(w, state):
        return table[w], state

    def init(n):
        return jnp.zeros((n,), jnp.int32)
    return step, init, np.asarray(table)


def _subwordlm_table(rng):
    table = jnp.asarray(rng.randn(V, V).astype(np.float32))

    def step(y, state):
        return table[y], state

    def init(n):
        return jnp.zeros((n,), jnp.int32)
    return step, init, np.asarray(table)


def _softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def py_lookahead_run(tokens, table, oov_penalty=1e-4):
    """Serial LookAheadWordLM (extlm.py:139-210) over one token stream."""
    zero = 1e-10
    logzero = -1e10
    root = _dict_tree()
    cumsum = np.cumsum(_softmax(table[W_EOS]))
    node = root
    outs = []
    for x in tokens:
        if x == SPACE:
            w = node[1] if (node is not None and node[1] >= 0) else W_UNK
            cumsum = np.cumsum(_softmax(table[w]))
            node = root
        elif node is not None and x in node[0]:
            node = node[0][x]
        else:
            node = None
        if node is not None:
            wids = node[2] if node is not root else None
            sum_prob = (cumsum[wids[1]] - cumsum[wids[0]]) \
                if wids is not None else 1.0
            if sum_prob < zero:
                outs.append(np.full((V,), logzero))
                continue
            unk_prob = cumsum[W_UNK] - cumsum[W_UNK - 1]
            y = np.full((V,), unk_prob * oov_penalty)
            for cid, nd in node[0].items():
                y[cid] = (cumsum[nd[2][1]] - cumsum[nd[2][0]]) / sum_prob
            if node[1] >= 0:
                p = (cumsum[node[1]] - cumsum[node[1] - 1]) / sum_prob
                y[SPACE] = p
                y[EOS] = p
            elif x == SPACE:
                y[SPACE] = zero
                y[EOS] = zero
            outs.append(np.log(np.maximum(y, zero)))
        else:
            outs.append(np.zeros((V,)))
    return np.stack(outs)


def py_multilevel_run(tokens, wtable, stable, weight=0.8, oov_penalty=1.0):
    """Serial MultiLevelLM (extlm.py:47-104)."""
    logzero = -1e10
    root = _dict_tree()
    wlp = np.log(_softmax(wtable[W_EOS]))
    node = root
    acc = 0.0
    outs = []
    for x in tokens:
        if x == SPACE:
            w = node[1] if (node is not None and node[1] >= 0) else W_UNK
            wlp = np.log(_softmax(wtable[w]))
            node = root
            acc = 0.0
        elif node is not None and x in node[0]:
            node = node[0][x]
        else:
            node = None
        log_y = np.log(_softmax(stable[x])) * weight
        if x != SPACE:
            acc += log_y[x] * 0  # acc accumulated from PREVIOUS dist; see below
        outs.append((node, wlp.copy(), log_y))
    # Second pass to accumulate clm_logprob exactly as the reference: the
    # log-prob of token x under the PREVIOUS step's subword distribution.
    final = []
    prev_log_y = None
    node = root
    acc = 0.0
    for x, (nd, wlp, log_y) in zip(tokens, outs):
        if x == SPACE:
            acc = 0.0
        else:
            if prev_log_y is not None:
                acc += prev_log_y[x]
        out = log_y.copy()
        if nd is not None and nd[1] >= 0:
            w_lp = wlp[nd[1]] - acc
        else:
            w_lp = wlp[W_UNK] + np.log(oov_penalty)
        if x == SPACE:
            out[SPACE] = logzero
            out[EOS] = logzero
        else:
            out[SPACE] = w_lp
            out[EOS] = w_lp
        final.append(out)
        prev_log_y = log_y
    return np.stack(final)


@pytest.fixture()
def boundary():
    b = np.zeros((V,), bool)
    b[SPACE] = True
    return b


def test_lookahead_matches_serial(boundary):
    rng = np.random.RandomState(0)
    wstep, winit, table = _wordlm_table(rng)
    trie = build_word_trie(WORDS, WIDS)
    lm_step, lm_init = make_lookahead_fusion(
        wstep, winit, trie=trie, vocab_size=V, space_id=SPACE, eos_id=EOS,
        boundary_mask=boundary, word_eos=W_EOS, word_unk=W_UNK)
    # two hypotheses stepping different streams, incl. open-vocab (7)
    streams = [[SPACE, 3, 4, SPACE, 6, SPACE], [SPACE, 3, 5, SPACE, 7, 3]]
    state = lm_init(2)
    got = []
    for t in range(len(streams[0])):
        y = jnp.asarray([streams[0][t], streams[1][t]])
        logp, state = lm_step(y, state)
        got.append(np.asarray(logp))
    got = np.stack(got, axis=1)  # [N, T, V]
    for i, s in enumerate(streams):
        want = py_lookahead_run(s, table)
        assert np.max(np.abs(got[i] - want)) < 1e-4, (i, got[i] - want)


def test_multilevel_matches_serial(boundary):
    rng = np.random.RandomState(1)
    wstep, winit, wtable = _wordlm_table(rng)
    sstep, sinit, stable = _subwordlm_table(rng)
    trie = build_word_trie(WORDS, WIDS)
    lm_step, lm_init = make_multilevel_fusion(
        wstep, winit, sstep, sinit, trie=trie, vocab_size=V, space_id=SPACE,
        eos_id=EOS, boundary_mask=boundary, word_eos=W_EOS, word_unk=W_UNK)
    streams = [[SPACE, 3, 4, SPACE, 6, SPACE], [SPACE, 3, 5, SPACE, 7, 3]]
    state = lm_init(2)
    got = []
    for t in range(len(streams[0])):
        y = jnp.asarray([streams[0][t], streams[1][t]])
        logp, state = lm_step(y, state)
        got.append(np.asarray(logp))
    got = np.stack(got, axis=1)
    for i, s in enumerate(streams):
        want = py_multilevel_run(s, wtable, stable)
        assert np.max(np.abs(got[i] - want)) < 1e-4, (i,
                                                      np.abs(got[i] - want))


def test_select_class_roots():
    logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 0.0]])
    roots = jnp.asarray([10, 20, 30])
    got = select_class_roots(logits, roots)
    assert list(np.asarray(got)) == [20, 10]
    mask = jnp.asarray([True, False, False])
    got = select_class_roots(logits, roots, mask)
    assert list(np.asarray(got)) == [20, 20]


def test_selection_biased_beam_runs():
    """Selection-LM KB choice inside the batched beam: with class_roots all
    = global root and any sel LM, results must equal plain TCPGen biasing;
    the wiring (word-trie walk + per-boundary class switch) is exercised."""
    from espnet_slurp_tpu.decode.beam import (BeamSearchConfig,
                                              batch_beam_search)
    from espnet_slurp_tpu.models.asr_model import ASRConfig, ASRModel
    from espnet_slurp_tpu.ops.frontend import FrontendConfig
    from espnet_slurp_tpu.slu.kb import build_trie
    cfg = ASRConfig(
        vocab_size=12, d_model=32, n_head=2, d_ff=64, num_encoder_blocks=1,
        num_decoder_blocks=1, decoder_d_ff=64, kernel_size=7,
        dropout_rate=0.0, ctc_weight=0.0, use_tcpgen=True,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=16),
        specaug=None)
    model = ASRModel(cfg)
    rng = np.random.RandomState(5)
    trie = build_trie([[3, 4], [5, 6]])
    trie_jnp = {"trie_token": jnp.asarray(trie.token),
                "trie_children_tok": jnp.asarray(trie.children_tok),
                "trie_children_node": jnp.asarray(trie.children_node),
                "trie_n_children": jnp.asarray(trie.n_children)}
    bmask = np.zeros((13,), bool)
    bmask[4] = bmask[6] = True
    batch = {
        "speech": jnp.asarray(rng.randn(1, 1600).astype(np.float32) * 0.3),
        "speech_lengths": jnp.asarray([1600]),
        "text": jnp.asarray([[3, 4, 5]]), "text_lengths": jnp.asarray([3]),
        "trie_token": trie_jnp["trie_token"],
        "trie_children_tok": trie_jnp["trie_children_tok"],
        "trie_children_node": trie_jnp["trie_children_node"],
        "trie_n_children": trie_jnp["trie_n_children"],
        "node": jnp.zeros((1, 4), jnp.int32),
        "p_gen_mask": jnp.zeros((1, 4), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    hs, hl, _ = model.apply(
        {"params": params}, batch["speech"], batch["speech_lengths"],
        method=lambda m, s, sl: m.encode(s, sl))
    base_bias = {"trie": trie_jnp, "boundary_mask": jnp.asarray(bmask),
                 "dead": trie.dead, "smoothprob": 1.0}
    bcfg = BeamSearchConfig(beam_size=3, pre_beam_size=12, max_len=5,
                            ctc_weight=0.0)
    t0, l0 = batch_beam_search(model, params, hs, hl, bcfg,
                               biasing=base_bias)

    wtrie = build_word_trie([[3, 4], [5, 6]], [2, 3])
    cls_table = jnp.asarray(np.random.RandomState(2).randn(6, 2),
                            jnp.float32)
    sel = {
        "word_trie": wtrie, "word_unk": 1,
        "sel_step": lambda w, st: (cls_table[w], st),
        "sel_init": lambda nn_: jnp.zeros((nn_,), jnp.int32),
        "class_roots": np.zeros((2,), np.int32),  # both classes -> root 0
    }
    t1, l1 = batch_beam_search(model, params, hs, hl, bcfg,
                               biasing={**base_bias, "selection": sel})
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    assert np.array_equal(np.asarray(l0), np.asarray(l1))
