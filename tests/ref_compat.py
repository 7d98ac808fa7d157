"""Import shims + weight converters for numerical parity tests against the
reference PyTorch code at /root/reference.

The reference (BriansIDP/espnet_slurp) imports cleanly under the installed
torch once three small third-party gaps are stubbed:
  * pkg_resources (setuptools>=81 removed it) — version lookups only.
  * librosa — only ``librosa.filters.mel`` is exercised on the paths under
    test (espnet2/layers/log_mel.py:50); we delegate to our own numpy
    Slaney filterbank (ops/mel.py), so the LogMel parity test validates the
    clamp/log/masking pipeline around a shared matrix.
  * torch_complex — type-only import on the Stft path
    (espnet2/layers/stft.py:7); torch.stft itself never touches it.

Additionally the fork's own espnet2/asr/encoder/conformer_encoder.py imports
Conv2dSubsampling2 from the v1 subsampling module, which this fork predates —
we alias it so the module imports (the x2 variant is never instantiated).

Everything here is test-support only; the framework itself has zero torch or
reference dependencies.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"

_installed = False


def install_shims() -> None:
    global _installed
    if _installed:
        return
    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            m = types.ModuleType("pkg_resources")
            m.get_distribution = lambda name: types.SimpleNamespace(
                version="0.0.0")
            m.DistributionNotFound = Exception
            sys.modules["pkg_resources"] = m
    try:
        import librosa  # noqa: F401
    except ImportError:
        from espnet_slurp_tpu.ops.mel import mel_filterbank

        lib = types.ModuleType("librosa")
        filters = types.ModuleType("librosa.filters")

        def mel(*, sr, n_fft, n_mels, fmin=0.0, fmax=None, htk=False, **kw):
            return mel_filterbank(fs=sr, n_fft=n_fft, n_mels=n_mels,
                                  fmin=fmin, fmax=fmax, htk=htk).T

        filters.mel = mel
        lib.filters = filters
        sys.modules["librosa"] = lib
        sys.modules["librosa.filters"] = filters
    try:
        import torch_complex  # noqa: F401
    except ImportError:
        tc = types.ModuleType("torch_complex")
        tct = types.ModuleType("torch_complex.tensor")

        class ComplexTensor:  # minimal: (real, imag) carrier
            def __init__(self, real, imag):
                self.real, self.imag = real, imag

        tct.ComplexTensor = ComplexTensor
        tcf = types.ModuleType("torch_complex.functional")

        def _nope(*a, **k):
            raise NotImplementedError("torch_complex stub")

        tcf.einsum = _nope
        tcf.stack = _nope
        tc.tensor = tct
        tc.functional = tcf
        sys.modules["torch_complex"] = tc
        sys.modules["torch_complex.tensor"] = tct
        sys.modules["torch_complex.functional"] = tcf
    if REF not in sys.path:
        sys.path.append(REF)
    # Fork bug: espnet2 conformer_encoder imports Conv2dSubsampling2 which
    # the fork's v1 subsampling module predates. Alias so the import works.
    import espnet.nets.pytorch_backend.transformer.subsampling as _sub
    if not hasattr(_sub, "Conv2dSubsampling2"):
        _sub.Conv2dSubsampling2 = _sub.Conv2dSubsampling
    # Fork bug #2: espnet2 conformer_encoder passes layer_drop_rate to the
    # fork's older 2-arg repeat(); accept and ignore a zero rate.
    import espnet.nets.pytorch_backend.transformer.repeat as _rep
    import inspect
    if len(inspect.signature(_rep.repeat).parameters) == 2:
        _orig_repeat = _rep.repeat

        def repeat(n, fn, layer_drop_rate=0.0):
            assert layer_drop_rate == 0.0, "fork repeat() predates layer drop"
            return _orig_repeat(n, fn)

        _rep.repeat = repeat
    # Fork bug #3: espnet2 conformer_encoder passes stochastic_depth_rate to
    # the fork's older EncoderLayer; accept and ignore a zero rate.
    import espnet.nets.pytorch_backend.conformer.encoder_layer as _el
    if "stochastic_depth_rate" not in inspect.signature(
            _el.EncoderLayer.__init__).parameters:
        _OrigLayer = _el.EncoderLayer

        # NB: a subclass breaks the original's old-style super(EncoderLayer,
        # self) lookup, so wrap with a factory that strips the extra arg.
        def _encoder_layer(*args, **kw):
            if len(args) == 9:  # trailing stochastic_depth_rate
                assert args[-1] == 0.0
                args = args[:-1]
            kw.pop("stochastic_depth_rate", None)
            return _OrigLayer(*args, **kw)

        import espnet2.asr.encoder.conformer_encoder as _ce
        _ce.EncoderLayer = _encoder_layer
    # Fork bug #4: espnet2 transformer_decoder passes maxlen= to the fork's
    # older make_pad_mask.
    import espnet.nets.pytorch_backend.nets_utils as _nu
    if "maxlen" not in inspect.signature(_nu.make_pad_mask).parameters:
        _orig_mpm = _nu.make_pad_mask

        def make_pad_mask(lengths, xs=None, length_dim=-1, maxlen=None):
            if maxlen is not None:
                import torch
                ls = torch.as_tensor(lengths)
                return torch.arange(maxlen)[None, :] >= ls[:, None]
            return _orig_mpm(lengths, xs, length_dim)

        _nu.make_pad_mask = make_pad_mask
    # Fork bug #5: espnet2 asr/transducer/beam_search_transducer.py imports
    # select_k_expansions/subtract which the fork's older v1 transducer
    # utils predate (they exist in upstream espnet; only NSC/mAES/ALSD use
    # them). Provide functional equivalents so the module imports.
    import espnet.nets.pytorch_backend.transducer.utils as _tu
    if not hasattr(_tu, "select_k_expansions"):
        def select_k_expansions(hyps, topk_idxs, topk_logps, gamma, beta):
            k_expansions = []
            for i, hyp in enumerate(hyps):
                hyp_i = [(int(k), hyp.score + float(v))
                         for k, v in zip(topk_idxs[i], topk_logps[i])]
                k_best = max(hyp_i, key=lambda x: x[1])[1]
                k_expansions.append(sorted(
                    [(k, v) for k, v in hyp_i if v >= (k_best - gamma)],
                    key=lambda x: x[1], reverse=True))
            return k_expansions

        _tu.select_k_expansions = select_k_expansions
    if not hasattr(_tu, "subtract"):
        def subtract(x, subset):
            final = [h for h in x
                     if all(h.yseq != s.yseq for s in subset)]
            return final

        _tu.subtract = subtract
    try:
        import editdistance  # noqa: F401
    except ImportError:
        # rnn/decoders.py pulls e2e_asr_common which imports editdistance at
        # module level; only CER reporting uses it (not the pointer math).
        ed = types.ModuleType("editdistance")

        def eval(a, b):  # plain DP levenshtein
            m, n = len(a), len(b)
            prev = list(range(n + 1))
            for i in range(1, m + 1):
                cur = [i] + [0] * n
                for j in range(1, n + 1):
                    cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                                 prev[j - 1] + (a[i - 1] != b[j - 1]))
                prev = cur
            return prev[n]

        ed.eval = eval
        sys.modules["editdistance"] = ed
    _installed = True


def ref_available() -> bool:
    if not os.path.isdir(REF):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


# ---- torch -> flax weight converters ---------------------------------------

def t2n(x) -> np.ndarray:
    return x.detach().cpu().numpy()


def linear(mod) -> dict:
    """torch.nn.Linear -> flax Dense params."""
    p = {"kernel": t2n(mod.weight).T}
    if mod.bias is not None:
        p["bias"] = t2n(mod.bias)
    return p


def layernorm(mod) -> dict:
    return {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}


def batchnorm_params(mod) -> dict:
    return {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}


def batchnorm_stats(mod) -> dict:
    return {"mean": t2n(mod.running_mean), "var": t2n(mod.running_var)}


def conv2d(mod) -> dict:
    """torch.nn.Conv2d (O,I,kh,kw) -> flax Conv HWIO (kh,kw,I,O)."""
    p = {"kernel": t2n(mod.weight).transpose(2, 3, 1, 0)}
    if mod.bias is not None:
        p["bias"] = t2n(mod.bias)
    return p


def conv1d_depthwise(mod) -> dict:
    """torch depthwise Conv1d (C,1,K) groups=C -> flax Conv (K,1,C)."""
    p = {"kernel": t2n(mod.weight).transpose(2, 1, 0)}
    if mod.bias is not None:
        p["bias"] = t2n(mod.bias)
    return p


def conv1d_pointwise(mod) -> dict:
    """torch 1x1 Conv1d (O,I,1) -> flax Dense (I,O)."""
    p = {"kernel": t2n(mod.weight)[:, :, 0].T}
    if mod.bias is not None:
        p["bias"] = t2n(mod.bias)
    return p


def embedding(mod) -> dict:
    return {"embedding": t2n(mod.weight)}


def relpos_attention(mod) -> dict:
    """Reference RelPositionMultiHeadedAttention -> my RelPosMultiHeadAttention."""
    h, dh = mod.h, mod.d_k
    return {
        "linear_q": linear(mod.linear_q),
        "linear_k": linear(mod.linear_k),
        "linear_v": linear(mod.linear_v),
        "linear_out": linear(mod.linear_out),
        "linear_pos": {"kernel": t2n(mod.linear_pos.weight).T},
        "pos_bias_u": t2n(mod.pos_bias_u),
        "pos_bias_v": t2n(mod.pos_bias_v),
    }


def mha(mod) -> dict:
    """Reference MultiHeadedAttention -> my MultiHeadAttention/CachedAttention."""
    return {
        "linear_q": linear(mod.linear_q),
        "linear_k": linear(mod.linear_k),
        "linear_v": linear(mod.linear_v),
        "linear_out": linear(mod.linear_out),
    }


def feed_forward(mod) -> dict:
    """Reference PositionwiseFeedForward -> my FeedForward (w1/w2)."""
    return {"w1": linear(mod.w_1), "w2": linear(mod.w_2)}


def conv_module(mod) -> tuple[dict, dict]:
    """Reference ConvolutionModule -> (params, batch_stats) for my ConvModule
    with norm_type='batch'."""
    params = {
        "pointwise1": conv1d_pointwise(mod.pointwise_conv1),
        "depthwise": conv1d_depthwise(mod.depthwise_conv),
        "norm": batchnorm_params(mod.norm),
        "pointwise2": conv1d_pointwise(mod.pointwise_conv2),
    }
    stats = {"norm": batchnorm_stats(mod.norm)}
    return params, stats


def conformer_encoder_layer(mod) -> tuple[dict, dict]:
    """Reference conformer EncoderLayer -> (params, batch_stats) for my
    ConformerBlock(conv_norm='batch')."""
    conv_p, conv_s = conv_module(mod.conv_module)
    params = {
        "norm_ff1": layernorm(mod.norm_ff_macaron),
        "ff1": feed_forward(mod.feed_forward_macaron),
        "norm_mha": layernorm(mod.norm_mha),
        "self_attn": relpos_attention(mod.self_attn),
        "norm_conv": layernorm(mod.norm_conv),
        "conv": conv_p,
        "norm_ff2": layernorm(mod.norm_ff),
        "ff2": feed_forward(mod.feed_forward),
        "norm_final": layernorm(mod.norm_final),
    }
    return params, {"conv": conv_s}


def conv2d_subsampling(mod, idim: int, odim: int) -> dict:
    """Reference Conv2dSubsampling (x4) -> my Conv2dSubsampling params.

    The reference's output Linear over the flattened (C, F) axis (C outer)
    maps onto my (1, F)-VALID conv with kernel[0, f, c, o] = W[o, c*F + f].
    """
    f_out = ((idim - 1) // 2 - 1) // 2
    lin = mod.out[0] if hasattr(mod.out, "__getitem__") else mod.out
    w = t2n(lin.weight)  # (odim, odim*f_out), (c, f) flatten with c outer
    kern = np.zeros((1, f_out, odim, odim), np.float32)
    for c in range(odim):
        kern[0, :, c, :] = w[:, c * f_out:(c + 1) * f_out].T
    return {
        "conv1": conv2d(mod.conv[0]),
        "conv2": conv2d(mod.conv[2]),
        "out": {"kernel": kern, "bias": t2n(lin.bias)},
    }


def conformer_encoder(mod, idim: int, odim: int) -> tuple[dict, dict]:
    """Reference espnet2 ConformerEncoder (input_layer=conv2d, rel_pos,
    macaron, cnn) -> (params, batch_stats) for my ConformerEncoder with
    conv_norm='batch'."""
    params = {"embed": conv2d_subsampling(mod.embed, idim, odim),
              "after_norm": layernorm(mod.after_norm)}
    stats = {}
    for i, layer in enumerate(mod.encoders):
        p, s = conformer_encoder_layer(layer)
        params[f"block_{i}"] = p
        stats[f"block_{i}"] = s
    return params, stats


def transformer_decoder(mod) -> dict:
    """Reference espnet2 TransformerDecoder -> my TransformerDecoder params."""
    params = {
        "embed": embedding(mod.embed[0]),
        "after_norm": layernorm(mod.after_norm),
        "output": linear(mod.output_layer),
    }
    for i, layer in enumerate(mod.decoders):
        params[f"layer_{i}"] = {
            "norm1": layernorm(layer.norm1),
            "self_attn": mha(layer.self_attn),
            "norm2": layernorm(layer.norm2),
            "src_attn": mha(layer.src_attn),
            "norm3": layernorm(layer.norm3),
            "ff": feed_forward(layer.feed_forward),
        }
    return params


def lstm_cell(torch_lstm, layer: int = 0) -> dict:
    """torch.nn.LSTM layer -> flax OptimizedLSTMCell params.

    torch packs gates (i, f, g, o) row-blocks in weight_ih/hh; flax splits
    them into per-gate Dense kernels `i{g}` (no bias) and `h{g}` (bias =
    bias_ih + bias_hh)."""
    wi = t2n(getattr(torch_lstm, f"weight_ih_l{layer}"))  # [4H, In]
    wh = t2n(getattr(torch_lstm, f"weight_hh_l{layer}"))  # [4H, H]
    bi = t2n(getattr(torch_lstm, f"bias_ih_l{layer}"))
    bh = t2n(getattr(torch_lstm, f"bias_hh_l{layer}"))
    h = wh.shape[1]
    out = {}
    for gi, g in enumerate(("i", "f", "g", "o")):
        sl = slice(gi * h, (gi + 1) * h)
        out[f"i{g}"] = {"kernel": wi[sl].T}
        out[f"h{g}"] = {"kernel": wh[sl].T, "bias": bi[sl] + bh[sl]}
    return out


def transducer_prediction(dec) -> dict:
    """espnet2/asr/decoder/transducer_decoder.py TransducerDecoder ->
    repo models/transducer.py PredictionNetwork params."""
    out = {"embed": {"embedding": t2n(dec.embed.weight)}}
    for i, lstm in enumerate(dec.decoder):
        out[f"rnn_{i}"] = {"cell": lstm_cell(lstm)}
    return out


def transducer_joint(j) -> dict:
    """espnet2/asr_transducer/joint_network.py JointNetwork -> repo
    JointNetwork params (reference lin_dec has no bias -> zero bias)."""
    return {
        "lin_enc": linear(j.lin_enc),
        "lin_pred": {"kernel": t2n(j.lin_dec.weight).T,
                     "bias": np.zeros(j.lin_dec.weight.shape[0],
                                      np.float32)},
        "lin_out": linear(j.lin_out),
    }
