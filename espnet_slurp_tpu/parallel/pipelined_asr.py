"""Pipeline-parallel training of the REAL ASR model.

The flagship hybrid CTC/attention train step (frontend + conformer encoder
+ transformer decoder + both losses + optimizer) with the encoder's
conformer blocks run as GPipe stages over the mesh's ``pipe`` axis
(parallel/pipeline.py), optionally crossed with ``data``-axis batch
sharding. New capability beyond the reference (SURVEY.md §2.10: it has no
pipeline parallelism); reachable from ASRTaskConfig via
``pipeline_stages`` (tasks/asr.py).

Layout: the L homogeneous encoder blocks' parameters are restacked from
the regular flax tree into a [P, L/P, ...] tree sharded P('pipe'); every
other parameter (subsampling embed, after_norm, decoder, CTC head)
replicates. `to_pipelined` / `from_pipelined` convert, so checkpoints stay
in the regular single-program format and inference is unchanged.

Constraints (asserted): conformer encoder, no interCTC/MoE/stochastic
depth (they read mid-pipe). Regularization is FULL-FIDELITY: SpecAug runs
on the features before the pipeline, encoder-block dropout applies inside
the wavefront with per-(block, microbatch) rng keys
(``fold_in(fold_in(enc_key, block_idx), microbatch_idx)``, plumbed through
the pipeline scan via ``pass_index``), and the decoder/CTC head run in
train mode with their own dropout stream. Flash attention inside stages
follows cfg.flash_attention exactly like the serial encoder (time padded
to a 256 multiple, pad frames masked by lengths).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.asr_model import ASRModel, add_sos_eos, label_smoothing_loss
from ..models.conformer import ConformerBlock, rel_positional_embedding
from ..models.embedding import Conv2dSubsampling
from ..ops import ctc as ctc_ops
from ..ops.frontend import default_frontend
from ..ops.masks import attention_bias, length_mask
from ..ops.normalize import global_mvn, utterance_mvn
from .pipeline import PIPE_AXIS, pipeline


def to_pipelined(params: Dict, n_stages: int) -> Dict:
    """Regular ASRModel params -> {"blocks": [P, L/P, ...], "rest": ...}."""
    enc = dict(params["encoder"])
    block_names = sorted((k for k in enc if k.startswith("block_")),
                         key=lambda k: int(k.split("_")[1]))
    l = len(block_names)
    assert l % n_stages == 0, f"{l} blocks not divisible by {n_stages}"
    bps = l // n_stages
    trees = [enc.pop(k) for k in block_names]
    # [P, bps, ...]: stage s holds blocks s*bps .. s*bps+bps-1
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape((n_stages, bps)
                                          + xs[0].shape), *trees)
    rest = dict(params)
    rest["encoder"] = enc
    return {"blocks": stacked, "rest": rest}


def from_pipelined(pp: Dict) -> Dict:
    """Inverse of to_pipelined -> regular ASRModel params."""
    stacked = pp["blocks"]
    shape = jax.tree.leaves(stacked)[0].shape
    n_stages, bps = shape[0], shape[1]
    params = dict(pp["rest"])
    enc = dict(params["encoder"])
    for s in range(n_stages):
        for j in range(bps):
            enc[f"block_{s * bps + j}"] = jax.tree.map(
                lambda a: a[s, j], stacked)
    params["encoder"] = enc
    return params


def _is_pp_tree(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"blocks", "rest"}


def opt_state_from_pipelined(opt_state):
    """Convert every param-mirrored subtree of an optax state from the
    pipelined {blocks, rest} layout to the regular flat layout, so
    checkpoints saved by the pipelined loop restore against a flat-state
    template (CheckpointManager.restore)."""
    return jax.tree.map(
        lambda sub: from_pipelined(sub) if _is_pp_tree(sub) else sub,
        opt_state, is_leaf=_is_pp_tree)


def opt_state_to_pipelined(opt_state, n_stages: int):
    """Inverse of opt_state_from_pipelined (for resume)."""
    def _looks_flat(x):
        return (isinstance(x, dict) and "encoder" in x
                and isinstance(x["encoder"], dict)
                and any(k.startswith("block_") for k in x["encoder"]))
    return jax.tree.map(
        lambda sub: to_pipelined(sub, n_stages) if _looks_flat(sub) else sub,
        opt_state, is_leaf=_looks_flat)


def pipelined_shardings(pp: Dict, mesh: Mesh) -> Dict:
    """blocks sharded P('pipe') on the stacked axis; rest replicated."""
    return {
        "blocks": jax.tree.map(
            lambda _: NamedSharding(mesh, P(PIPE_AXIS)), pp["blocks"]),
        "rest": jax.tree.map(lambda _: NamedSharding(mesh, P()),
                             pp["rest"]),
    }


def make_pipelined_asr_train_step(model: ASRModel, tx, mesh: Mesh,
                                  n_micro: int = 4,
                                  data_axis: str | None = None,
                                  mvn_stats=None):
    """Jitted (state, batch) -> (state, stats) with the encoder pipelined.

    ``state.params`` must be the pipelined layout (to_pipelined). The loss
    is exactly the serial model's hybrid CTC/attention loss — pinned by
    tests/test_pipeline_parallel.py::test_pipelined_full_asr_matches_serial.
    """
    import optax
    from ..ops.specaug import specaug
    c = model.cfg
    assert c.encoder == "conformer", "pipelined path: conformer encoder"
    assert not c.interctc_layers and c.moe_experts == 0, \
        "pipelined path v1: no interCTC/MoE taps (they read mid-pipe)"
    assert c.stochastic_depth_rate == 0.0, \
        "pipelined path: stochastic depth draws whole-batch rng per block"
    n_stages = mesh.shape[PIPE_AXIS]
    # Flash attention follows the serial encoder's policy exactly
    # (models/conformer.py:227-249): auto = on for TPU backends.
    use_flash = c.flash_attention == "on" or (
        c.flash_attention == "auto" and jax.default_backend() == "tpu")
    if c.d_model % 128 != 0:
        use_flash = False  # flash tiles need lane-aligned head dims

    block = ConformerBlock(
        c.d_model, c.n_head, c.d_ff, c.kernel_size, c.dropout_rate,
        c.jax_dtype, use_flash=use_flash)
    subsample = Conv2dSubsampling(c.d_model, c.jax_dtype,
                                  factor=c.subsampling_factor)
    after_norm = nn.LayerNorm(dtype=c.jax_dtype)

    def encode(pp, speech, speech_lengths, train, sa_rng, enc_rng):
        feats, flens = default_frontend(speech, speech_lengths, c.frontend)
        if train and c.specaug is not None and sa_rng is not None:
            feats = specaug(sa_rng, feats, flens, c.specaug)
        if c.use_mvn == "global" and mvn_stats is not None:
            feats = global_mvn(feats, flens, *mvn_stats)
        elif c.use_mvn == "utterance":
            feats = utterance_mvn(feats, flens)
        feats = feats.astype(c.jax_dtype)
        x = subsample.apply({"params": pp["rest"]["encoder"]["embed"]},
                            feats)
        olens = Conv2dSubsampling.out_length(flens, c.subsampling_factor)
        t = x.shape[1]
        if use_flash and t % 256 != 0:
            t_pad = ((t + 255) // 256) * 256
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
            t = t_pad
        x = x * jnp.sqrt(jnp.asarray(c.d_model, x.dtype))
        pos_emb = rel_positional_embedding(t, c.d_model, c.jax_dtype)
        pad = length_mask(olens, t)
        bias = None if use_flash else attention_bias(pad[:, None, None, :])
        dropout_on = train and c.dropout_rate > 0.0 and enc_rng is not None

        def stage_fn(sp, h, bc, sc, midx):
            pos = sc["pos"]
            bps = jax.tree.leaves(sp)[0].shape[0]
            stage_i = jax.lax.axis_index(PIPE_AXIS)
            for j in range(bps):
                bp = jax.tree.map(lambda a: a[j], sp)
                kwargs = dict(lengths=bc["olens"])
                if dropout_on:
                    # per-(global block, microbatch) dropout key — the
                    # serial comparator in tests reproduces this exactly.
                    key = jax.random.fold_in(
                        jax.random.fold_in(sc["rng"], stage_i * bps + j),
                        midx)
                    h = block.apply({"params": bp}, h, pos,
                                    bc.get("bias"), bc["pad"], False,
                                    rngs={"dropout": key}, **kwargs)
                else:
                    h = block.apply({"params": bp}, h, pos,
                                    bc.get("bias"), bc["pad"], True,
                                    **kwargs)
            return h

        # Microbatch count must divide the LOCAL batch (the last bucketed
        # batch of an epoch can be smaller); degrade toward fewer, larger
        # microbatches rather than fail.
        local_b = x.shape[0] // (mesh.shape[data_axis] if data_axis else 1)
        nm = max(1, min(n_micro, local_b))
        while local_b % nm != 0:
            nm -= 1
        consts = {"pad": pad, "olens": olens}
        if bias is not None:
            consts["bias"] = bias
        shared = {"pos": pos_emb,
                  "rng": (enc_rng if dropout_on
                          else jax.random.PRNGKey(0))}
        x = pipeline(mesh, stage_fn, pp["blocks"], x, nm,
                     data_axis=data_axis,
                     batched_consts=consts, shared_consts=shared,
                     pass_index=True)
        x = after_norm.apply(
            {"params": pp["rest"]["encoder"]["after_norm"]}, x)
        x = jnp.where(pad[..., None], x, 0.0)
        return x, olens

    def loss_fn(pp, batch, rngs=None):
        """rngs = None -> fully deterministic (dryrun / exactness tests);
        rngs = {"specaug": k, "encoder": k, "decoder": k} -> train mode
        with the full regularization stack."""
        rngs = rngs or {}
        train = bool(rngs)
        speech, slens = batch["speech"], batch["speech_lengths"]
        text, tlens = batch["text"], batch["text_lengths"]
        hs, h_lens = encode(pp, speech, slens, train,
                            rngs.get("specaug"), rngs.get("encoder"))
        stats = {}
        loss = 0.0
        rest = pp["rest"]
        if c.ctc_weight > 0.0:
            logits = model.apply({"params": rest}, hs,
                                 method=lambda m, h: m.ctc_proj(h))
            loss_ctc = ctc_ops.ctc_loss_mean_logits(
                logits, h_lens, jnp.maximum(text, 0), tlens, c.blank_id)
            stats["loss_ctc"] = loss_ctc
            loss = loss + c.ctc_weight * loss_ctc
        if c.ctc_weight < 1.0:
            ys_in, ys_out = add_sos_eos(jnp.maximum(text, 0), tlens,
                                        c.sos_id, c.eos_id)
            dec_rng = rngs.get("decoder")
            dec_kw = ({"rngs": {"dropout": dec_rng}}
                      if train and dec_rng is not None else {})
            dec_logits = model.apply(
                {"params": rest}, ys_in, tlens + 1, hs, h_lens,
                method=lambda m, yi, yl, h, hl: m.decoder_logits(
                    yi, yl, h, hl, train=train and dec_rng is not None),
                **dec_kw)
            loss_att, acc = label_smoothing_loss(dec_logits, ys_out,
                                                 c.lsm_weight)
            stats["loss_att"] = loss_att
            stats["acc"] = acc
            loss = loss + (1.0 - c.ctc_weight) * loss_att
        stats["loss"] = loss
        return loss, stats

    def step(state, batch):
        new_rng, sa, enc, dec = jax.random.split(state.rng, 4)
        # fold in step so every step draws fresh masks even though
        # state.rng is split once per call (mirrors train/state.py:72-77)
        rngs = {"specaug": jax.random.fold_in(sa, state.step),
                "encoder": jax.random.fold_in(enc, state.step),
                "decoder": jax.random.fold_in(dec, state.step)}
        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rngs)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, rng=new_rng), stats

    return jax.jit(step), loss_fn
