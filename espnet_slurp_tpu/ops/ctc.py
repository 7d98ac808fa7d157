"""CTC loss and helpers, TPU-native.

Parity target: reference espnet2/asr/ctc.py:6-127 (projection +
torch.nn.CTCLoss with zero_infinity, softmax/log_softmax/argmax helpers).
The loss itself is the standard log-space forward recursion over the
blank-interleaved label sequence, implemented as a lax.scan over time so the
whole thing lives inside the jitted train step (the reference calls an
external cuDNN kernel; SURVEY.md §2.9 maps it to an in-framework kernel).

The scan body is pure VPU work on a [B, 2U+1] lattice — small compared to the
encoder matmuls — so a lax.scan is already near the roofline; a Pallas
forward-backward kernel with custom vjp is layered on in ``ops/pallas/ctc.py``
for the large-vocab case.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -1e30


def _interleave_blanks(labels: jnp.ndarray, blank_id: int) -> jnp.ndarray:
    """[B, U] -> [B, 2U+1] blank-interleaved extended label sequence."""
    b, u = labels.shape
    ext = jnp.full((b, 2 * u + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _ctc_transitions(labels, label_lengths, blank_id):
    """Shared setup: (ext [B,S], allow_skip [B,S])."""
    s = 2 * labels.shape[1] + 1
    ext = _interleave_blanks(labels, blank_id)  # (B, S)
    # Transition mask: alpha[s] may come from s, s-1, and s-2 when
    # ext[s] != blank and ext[s] != ext[s-2].
    ext_prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank_id)[:, :s]
    allow_skip = (ext != blank_id) & (ext != ext_prev2)  # (B, S)
    return ext, allow_skip


def _fused_emit(logits: jnp.ndarray, ext: jnp.ndarray) -> jnp.ndarray:
    """emit[b,t,s] = log_softmax(logits)[b,t,ext[b,s]] WITHOUT materializing
    the f32 [B,T,V] log-probs (PERF_NOTES.md round-2 item 3).

    Forward: per-frame logZ reduction (fused by XLA, no [B,T,V] f32 temp) +
    an S-wide gather. Backward (custom): scatter of the cotangent at the
    gathered positions minus softmax·rowsum, recomputed from the SAVED
    native-dtype logits — the only [B,T,V] residual is the bf16 logits that
    exist anyway.
    """
    b, t, v = logits.shape

    @jax.custom_vjp
    def emit_fn(lg):
        return _emit_fwd(lg)[0]

    def _emit_fwd(lg):
        z = jax.nn.logsumexp(lg.astype(jnp.float32), axis=-1)  # [B, T]
        g = jnp.take_along_axis(lg, ext[:, None, :].astype(jnp.int32),
                                axis=2).astype(jnp.float32)
        return g - z[..., None], (lg, z)

    def _emit_bwd(res, de):
        lg, z = res
        soft = jnp.exp(lg.astype(jnp.float32) - z[..., None])  # recomputed
        dsum = jnp.sum(de, axis=-1)  # [B, T]
        dlg = -soft * dsum[..., None]
        dlg = dlg.at[jnp.arange(b)[:, None, None],
                     jnp.arange(t)[None, :, None],
                     ext[:, None, :]].add(de)
        return (dlg.astype(lg.dtype),)

    emit_fn.defvjp(_emit_fwd, _emit_bwd)
    return emit_fn(logits)


def ctc_loss(
    log_probs: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-example negative log likelihood.

    Args:
      log_probs: [B, T, V] log-softmax outputs.
      logit_lengths: [B] valid frame counts.
      labels: [B, U] padded label ids (padding value irrelevant).
      label_lengths: [B] valid label counts.
    Returns: [B] loss (0 for examples where U > T, mirroring zero_infinity).
    """
    ext, allow_skip = _ctc_transitions(labels, label_lengths, blank_id)
    emit = jnp.take_along_axis(
        log_probs, ext[:, None, :].astype(jnp.int32), axis=2
    )  # (B, T, S) — gathered once, outside the scan
    return _ctc_from_emit(emit, logit_lengths, label_lengths, allow_skip)


def ctc_loss_logits(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """CTC loss straight from projection logits with the fused
    gather+logsumexp emit (never materializes f32 [B,T,V] log-probs)."""
    ext, allow_skip = _ctc_transitions(labels, label_lengths, blank_id)
    emit = _fused_emit(logits, ext)
    return _ctc_from_emit(emit, logit_lengths, label_lengths, allow_skip)


def _ctc_from_emit(emit, logit_lengths, label_lengths, allow_skip):
    """Forward recursion over the blank-interleaved lattice.

    emit: [B, T, S] per-frame log-probs of the extended label sequence.
    """
    b, t, s = emit.shape
    emit = jnp.swapaxes(emit, 0, 1)  # (T, B, S)

    alpha0 = jnp.full((b, s), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0, emit[0, :, 1], NEG_INF))

    def step(alpha, inp):
        emit_t, tpos = inp
        a1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :s]
        a2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :s]
        a2 = jnp.where(allow_skip, a2, NEG_INF)
        m = jnp.maximum(alpha, jnp.maximum(a1, a2))
        new = m + jnp.log(
            jnp.exp(alpha - m) + jnp.exp(a1 - m) + jnp.exp(a2 - m)
        ) + emit_t
        new = jnp.maximum(new, NEG_INF)  # keep -inf finite
        # Frozen past each example's last frame: carry alpha unchanged.
        new = jnp.where((tpos < logit_lengths)[:, None], new, alpha)
        return new, None

    alpha, _ = lax.scan(step, alpha0, (emit[1:], jnp.arange(1, t)))
    # Final states: S-1 (trailing blank) and S-2 (last label), per example.
    last = 2 * label_lengths  # index of trailing blank in ext
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    loss = -ll
    # zero_infinity semantics (ctc.py:41 zero_infinity=True): any infeasible
    # alignment contributes 0. U > T is one case, but T < U + n_repeats is
    # also infeasible (adjacent repeats need a blank between them); rather
    # than enumerating cases, detect the saturated NEG_INF likelihood itself.
    feasible = (label_lengths <= logit_lengths) & (ll > NEG_INF / 2)
    return jnp.where(feasible, loss, 0.0)


def ctc_loss_auto(log_probs, logit_lengths, labels, label_lengths,
                  blank_id: int = 0, impl: str = "auto") -> jnp.ndarray:
    """CTC dispatch. On TPU the Pallas forward-backward kernel wins (the
    whole (T,S) recursion is one Mosaic kernel in VMEM vs a T-step XLA
    while-loop: 14.9 ms vs 53.2 ms fwd+bwd at B=64/T=468/V=5000 on v5e);
    elsewhere the lax.scan recursion is used."""
    if impl in ("auto", "pallas") and jax.default_backend() == "tpu":
        from .pallas.ctc import ctc_loss_pallas
        return ctc_loss_pallas(log_probs, logit_lengths, labels,
                               label_lengths, blank_id)
    return ctc_loss(log_probs, logit_lengths, labels, label_lengths, blank_id)


def ctc_loss_mean_logits(logits, logit_lengths, labels, label_lengths,
                         blank_id: int = 0) -> jnp.ndarray:
    """Batch-size-normalized fused-emit CTC loss (training hot path).

    On TPU: fused gather+logsumexp emit feeding the Pallas lattice kernel
    (no f32 [B,T,V] materialization, single-Mosaic-kernel recursion);
    elsewhere the fused-emit lax.scan."""
    if jax.default_backend() == "tpu":
        from .pallas.ctc import ctc_loss_pallas_logits
        per = ctc_loss_pallas_logits(logits, logit_lengths, labels,
                                     label_lengths, blank_id)
    else:
        per = ctc_loss_logits(logits, logit_lengths, labels, label_lengths,
                              blank_id)
    return jnp.sum(per) / per.shape[0]


def ctc_loss_mean(log_probs, logit_lengths, labels, label_lengths,
                  blank_id: int = 0) -> jnp.ndarray:
    """Batch-size-normalized CTC loss (reduction='sum' / B, ctc.py:95-99)."""
    per = ctc_loss_auto(log_probs, logit_lengths, labels, label_lengths,
                        blank_id)
    return jnp.sum(per) / per.shape[0]


def greedy_decode(log_probs: jnp.ndarray, logit_lengths: jnp.ndarray,
                  blank_id: int = 0) -> jnp.ndarray:
    """Best-path decode: argmax, returned as [B, T] ids with repeats/blanks
    still present; use ``collapse_repeats`` host-side to get label sequences.
    """
    ids = jnp.argmax(log_probs, axis=-1)
    from .masks import length_mask
    return jnp.where(length_mask(logit_lengths, ids.shape[1]), ids, blank_id)


def collapse_repeats(ids, blank_id: int = 0):
    """Host-side best-path collapse (numpy/python; not jitted)."""
    out = []
    prev = None
    for i in ids:
        i = int(i)
        if i != blank_id and i != prev:
            out.append(i)
        prev = i
    return out
