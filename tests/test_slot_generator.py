"""KA2G slot-value generator tests: ontology forest, training, generation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.slu.generator import (SlotGenConfig, SlotGenerator,
                                            build_ontology_forest,
                                            walk_forest)

CFG = SlotGenConfig(n_slots=3, value_vocab_size=20, d_model=32, n_head=2,
                    d_ff=64, num_blocks=1, max_value_len=4)

ONTOLOGY = [
    [[3, 4], [3, 5]],      # slot 0 values
    [[6]],                 # slot 1
    [[7, 8, 9]],           # slot 2
]


def test_build_ontology_forest():
    trie, roots = build_ontology_forest(ONTOLOGY, pad_nodes_multiple=16)
    assert len(roots) == 3
    # slot 0 root has one child (token 3)
    r0 = roots[0]
    assert trie.n_children[r0] == 1
    assert trie.children_tok[r0, 0] == 3
    # slot roots are distinct
    assert len(set(int(r) for r in roots)) == 3


def test_walk_forest():
    trie, roots = build_ontology_forest(ONTOLOGY, pad_nodes_multiple=16)
    # prev tokens for slot 0: [start, 3, 4] -> nodes [root0, n3, leaf]
    prev = np.array([[0, 3, 4], [0, 9, 9]])
    node, mask = walk_forest(trie, roots, prev, np.array([0, 1]))
    assert node[0, 0] == roots[0] and mask[0, 0] == 0
    assert mask[0, 1] == 0 and mask[0, 2] == 0
    # slot 1: token 9 not in slot-1 ontology -> dead
    assert node[1, 1] == trie.dead and mask[1, 1] == 1


def _batch(b=2):
    rng = np.random.RandomState(0)
    memory = jnp.asarray(rng.randn(b, 6, 32).astype(np.float32))
    mask = jnp.asarray(np.ones((b, 6), bool))
    slot_present = jnp.asarray([[1, 0, 1], [0, 1, 0]])
    values = jnp.asarray([
        [[3, 4, -1, -1], [-1] * 4, [7, 8, 9, -1]],
        [[-1] * 4, [6, -1, -1, -1], [-1] * 4]])
    value_lengths = jnp.asarray([[2, 0, 3], [0, 1, 0]])
    return memory, mask, slot_present, values, value_lengths


def test_slot_generator_train_and_generate():
    trie, roots = build_ontology_forest(ONTOLOGY, pad_nodes_multiple=16)
    memory, mask, present, values, vlens = _batch()
    b, n_slots, l = values.shape
    # walk from slot roots over teacher-forcing inputs [0, v0, v1...]
    ys_in = np.asarray(jnp.pad(jnp.maximum(values, 0).reshape(-1, l),
                               ((0, 0), (1, 0)))[:, :l])
    slot_idx = np.tile(np.arange(n_slots), b)
    node, pmask = walk_forest(trie, roots, ys_in, slot_idx)

    trie_d = {"trie_token": jnp.asarray(trie.token),
              "trie_children_tok": jnp.asarray(trie.children_tok),
              "trie_children_node": jnp.asarray(trie.children_node),
              "trie_n_children": jnp.asarray(trie.n_children)}
    model = SlotGenerator(CFG)
    kwargs = dict(trie=trie_d, node=jnp.asarray(node),
                  p_gen_mask=jnp.asarray(pmask))
    params = model.init(jax.random.PRNGKey(0), memory, mask, present,
                        values, vlens, **kwargs)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, memory, mask, present, values,
                           vlens, **kwargs)

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"loss_slot_cls", "loss_slot_gen", "slot_acc"} <= set(stats)
    assert any(float(jnp.abs(g).max()) > 0
               for g in jax.tree.leaves(grads["tcpgen"]))

    boundary = jnp.zeros((CFG.value_vocab_size + 1,), bool)
    slot_logits, gen = model.apply(
        {"params": params}, memory, mask,
        trie=trie_d, roots=roots, boundary_mask=boundary, dead=trie.dead,
        method=lambda m, mem, msk, **kw: m.generate(mem, msk, **kw))
    assert slot_logits.shape == (2, 3)
    assert gen.shape == (2, 3, CFG.max_value_len)


def test_slot_generator_without_tcpgen():
    cfg = SlotGenConfig(n_slots=3, value_vocab_size=20, d_model=32,
                        n_head=2, d_ff=64, num_blocks=1, max_value_len=4,
                        use_tcpgen=False)
    memory, mask, present, values, vlens = _batch()
    model = SlotGenerator(cfg)
    params = model.init(jax.random.PRNGKey(0), memory, mask, present,
                        values, vlens)["params"]
    loss, stats = model.apply({"params": params}, memory, mask, present,
                              values, vlens)
    assert np.isfinite(float(loss))
