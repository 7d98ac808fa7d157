"""Fused rel-pos flash attention kernel tests (interpret mode on CPU).

Validates ops/pallas/flash_attention.py against the plain-XLA rel-pos
attention math (models/attention.py legacy path / reference
espnet/nets/pytorch_backend/transformer/attention.py:212-308): forward and
all five gradients, with padding and streaming chunk masks, plus the
module-level equivalence of RelPosMultiHeadAttention(use_flash=True).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from espnet_slurp_tpu.ops.pallas.flash_attention import rel_flash_attention

B, H, T, DH = 2, 2, 256, 32
SCALE = 1.0 / np.sqrt(DH)


def ref_attn(qu, qv, k, v, p, lengths, scale, chunk_size=0, left_chunks=-1):
    t = qu.shape[2]
    ac = jnp.einsum("bhid,bhjd->bhij", qu, k)
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    pg = p[:, (t - 1) - i + j, :]           # [H, T, T, Dh]
    bd = jnp.einsum("bhid,hijd->bhij", qv, pg)
    s = (ac + bd) * scale
    allow = jnp.broadcast_to(
        (jnp.arange(t)[None, :] < lengths[:, None])[:, None, None, :],
        s.shape)
    if chunk_size > 0:
        cm = (j // chunk_size) <= (i // chunk_size)
        if left_chunks >= 0:
            cm = cm & ((j // chunk_size) >= (i // chunk_size) - left_chunks)
        allow = allow & cm[None, None]
    s = jnp.where(allow, s, -1e30)
    return jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, -1), v)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.3
    qu, qv, k, v = (f(B, H, T, DH) for _ in range(4))
    p = f(H, 2 * T, DH).at[:, -1].set(0.0)
    lengths = jnp.asarray([T, 190], jnp.int32)
    return qu, qv, k, v, p, lengths


@pytest.mark.parametrize("chunk", [(0, -1), (64, -1), (64, 1)])
def test_forward_matches_reference(data, chunk):
    qu, qv, k, v, p, lengths = data
    cs, lc = chunk
    out = rel_flash_attention(qu, qv, k, v, p, lengths, scale=SCALE,
                              chunk_size=cs, left_chunks=lc, interpret=True)
    ref = ref_attn(qu, qv, k, v, p, lengths, SCALE, cs, lc)
    m = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, :, None]
    err = float(jnp.max(jnp.abs(jnp.where(m, out - ref, 0.0))))
    assert err < 2e-5, err


def test_gradients_match_reference(data):
    qu, qv, k, v, p, lengths = data
    m = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, :, None]
    w = jnp.asarray(np.random.RandomState(1).randn(B, H, T, DH),
                    jnp.float32)

    def loss(fn, args):
        o = fn(*args, lengths)
        return jnp.sum(jnp.where(m, o, 0.0) * w)

    flash = lambda *a: rel_flash_attention(*a[:5], a[5], scale=SCALE,
                                           interpret=True)
    ref = lambda *a: ref_attn(*a[:5], a[5], SCALE)
    g1 = jax.grad(lambda args: loss(flash, args))((qu, qv, k, v, p))
    g2 = jax.grad(lambda args: loss(ref, args))((qu, qv, k, v, p))
    for name, a, b in zip(["dqu", "dqv", "dk", "dv", "dp"], g1, g2):
        rel = float(jnp.max(jnp.abs(a - b))) / (
            float(jnp.max(jnp.abs(b))) + 1e-9)
        assert rel < 1e-4, (name, rel)


def test_module_flash_equals_legacy():
    """RelPosMultiHeadAttention(use_flash) == the legacy XLA path."""
    from espnet_slurp_tpu.models.attention import RelPosMultiHeadAttention
    from espnet_slurp_tpu.models.embedding import rel_positional_embedding
    from espnet_slurp_tpu.ops.masks import attention_bias, length_mask
    d = H * DH
    t = 128
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, t, d).astype(np.float32)) * 0.3
    lengths = jnp.asarray([t, 70], jnp.int32)
    pos = rel_positional_embedding(t, d, jnp.float32)
    legacy = RelPosMultiHeadAttention(H, d, 0.0, use_flash=False)
    flash = RelPosMultiHeadAttention(H, d, 0.0, use_flash=True)
    params = legacy.init(jax.random.PRNGKey(0), x, pos)["params"]
    bias = attention_bias(length_mask(lengths, t)[:, None, None, :])
    y0 = legacy.apply({"params": params}, x, pos, bias)
    y1 = flash.apply({"params": params}, x, pos, None, True, lengths)
    m = length_mask(lengths, t)[..., None]
    err = float(jnp.max(jnp.abs(jnp.where(m, y0 - y1, 0.0))))
    assert err < 2e-4, err


def test_encoder_flash_equals_legacy():
    """ConformerEncoder(flash='on') == flash='off' on CPU (interpret)."""
    from espnet_slurp_tpu.models.conformer import ConformerEncoder
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 80, 16).astype(np.float32))
    flens = jnp.asarray([80, 50], jnp.int32)
    enc_off = ConformerEncoder(d_model=64, n_head=2, d_ff=128, num_blocks=2,
                               kernel_size=7, dropout_rate=0.0, flash="off")
    enc_on = ConformerEncoder(d_model=64, n_head=2, d_ff=128, num_blocks=2,
                              kernel_size=7, dropout_rate=0.0, flash="on")
    params = enc_off.init(jax.random.PRNGKey(0), feats, flens)["params"]
    y0, ol0, _ = enc_off.apply({"params": params}, feats, flens)
    y1, ol1, _ = enc_on.apply({"params": params}, feats, flens)
    assert (np.asarray(ol0) == np.asarray(ol1)).all()
    # flash pads T' to 128; compare the common (valid) prefix
    tmin = min(y0.shape[1], y1.shape[1])
    from espnet_slurp_tpu.ops.masks import length_mask
    m = length_mask(ol0, tmin)[..., None]
    err = float(jnp.max(jnp.abs(
        jnp.where(m, y0[:, :tmin] - y1[:, :tmin], 0.0))))
    assert err < 5e-4, err
