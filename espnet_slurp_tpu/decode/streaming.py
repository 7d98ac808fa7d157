"""Streaming (block-online) inference.

Parity target: reference espnet2/bin/asr_inference_streaming.py
(Speech2TextStreaming: chunked apply_frontend at :203, incremental
__call__(speech, is_final) at :293) over the contextual-block encoders.

Design: the encoder is trained with chunked attention + causal convs
(models/conformer.py chunk_size/left_chunks), so encoder outputs for past
chunks are IDENTICAL whether computed incrementally or over the full prefix.
This wrapper therefore re-encodes the accumulated audio each call (exact
streaming semantics; per-chunk O(1)-state caching is a later optimization),
emits partial CTC-greedy hypotheses per chunk, and runs the full joint beam
search at is_final.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.asr_model import ASRModel
from ..ops.ctc import collapse_repeats


class StreamingRecognizer:
    """Incremental speech -> text over a chunk-attention ASR model."""

    def __init__(self, model: ASRModel, params, tokenizer=None,
                 converter=None, chunk_samples: int = 8192,
                 max_len: int = 128, beam_size: int = 1,
                 ctc_weight: float = 0.3, mvn_stats=None):
        assert model.cfg.chunk_size > 0, \
            "streaming requires a chunk-attention model (cfg.chunk_size > 0)"
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.converter = converter
        self.chunk_samples = chunk_samples
        self.max_len = max_len
        self.beam_size = beam_size
        # 0.0 for models whose CTC head is untrained/absent (e.g. the ST
        # inner ASR model — final beam is attention-only there).
        self.ctc_weight = ctc_weight
        # Global-MVN stats: a use_mvn=global model decodes on normalized
        # features — without them the encoder sees a different input
        # distribution than training.
        self.mvn_stats = mvn_stats
        self.reset()
        self._encode_jit = jax.jit(self._encode, static_argnums=(2,))

    def reset(self):
        self._buffer = np.zeros((0,), np.float32)

    def _encode(self, speech, length, pad_to):
        buf = jnp.zeros((1, pad_to), jnp.float32)
        buf = jax.lax.dynamic_update_slice(buf, speech[None], (0, 0))
        mvn = self.mvn_stats
        return self.model.apply(
            {"params": self.params}, buf, jnp.asarray([length]),
            method=lambda m, s, sl: m.encode(s, sl, mvn_stats=mvn))

    def _ctc_partial(self, hs, h_lengths) -> List[int]:
        lp = self.model.apply({"params": self.params}, hs,
                              method=lambda m, x: m.ctc_logprobs(x))
        ids = np.asarray(jnp.argmax(lp, -1))[0][: int(h_lengths[0])]
        return collapse_repeats(ids, self.model.cfg.blank_id)

    def __call__(self, speech_chunk: np.ndarray, is_final: bool = False
                 ) -> Tuple[List[int], bool]:
        """Feed a chunk; returns (token ids so far, final_flag).

        Partial results come from CTC greedy (label-sync beam rescoring runs
        once at is_final, matching the reference's blockwise flow).
        """
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(speech_chunk, np.float32)])
        n = len(self._buffer)
        if n < self.chunk_samples and not is_final:
            return [], False
        from ..data.sampler import bucket_length
        pad_to = bucket_length(max(n, self.chunk_samples),
                               self.chunk_samples)
        speech = np.zeros((pad_to,), np.float32)
        speech[:n] = self._buffer
        hs, h_lengths, _ = self._encode_jit(jnp.asarray(speech), n, pad_to)
        if not is_final:
            # Partial hypotheses need a trained CTC head; models without
            # one (e.g. the ST inner ASR: attention-only over tgt vocab)
            # emit no partials and only the final beam result.
            if "ctc" not in self.params:
                return [], False
            return self._ctc_partial(hs, h_lengths), False
        if self.beam_size > 1:
            from .beam import BeamSearchConfig, batch_beam_search
            tokens, lengths = batch_beam_search(
                self.model, self.params, hs, h_lengths,
                BeamSearchConfig(beam_size=self.beam_size,
                                 max_len=self.max_len,
                                 ctc_weight=self.ctc_weight))
        else:
            from .greedy import attention_greedy_decode
            tokens, lengths = attention_greedy_decode(
                self.model, self.params, hs, h_lengths, self.max_len)
        ids = list(np.asarray(tokens)[0][: int(lengths[0])])
        self.reset()
        return ids, True

    def text(self, ids: List[int]) -> str:
        if self.tokenizer is None or self.converter is None:
            return " ".join(map(str, ids))
        return self.tokenizer.tokens2text(self.converter.ids2tokens(ids))


class StreamingTransducerRecognizer:
    """Incremental transducer decode over a chunk-attention encoder.

    Parity target: reference espnet2/bin/asr_transducer_inference.py
    --streaming/--chunk_size simulation over the standalone transducer's
    chunk_forward encoder (espnet2/asr_transducer/encoder/encoder.py:147).
    Same exactness argument as StreamingRecognizer: a chunk-attention +
    causal-conv encoder produces identical states for past frames whether
    run incrementally or over the full prefix, so each call re-encodes the
    accumulated audio; partials are frame-synchronous greedy (the natural
    streaming decoder for RNN-T), the final pass runs the configured beam.
    """

    def __init__(self, model, params, tokenizer=None, converter=None,
                 chunk_samples: int = 8192, max_len: int = 128,
                 beam_size: int = 1, search: str = "alsa",
                 mvn_stats=None):
        assert model.cfg.asr.chunk_size > 0, \
            "streaming transducer needs cfg.asr.chunk_size > 0"
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.converter = converter
        self.chunk_samples = chunk_samples
        self.max_len = max_len
        self.beam_size = beam_size
        self.search = search
        self.mvn_stats = mvn_stats
        self.reset()
        self._encode_jit = jax.jit(self._encode, static_argnums=(2,))

    def reset(self):
        self._buffer = np.zeros((0,), np.float32)

    def _encode(self, speech, length, pad_to):
        buf = jnp.zeros((1, pad_to), jnp.float32)
        buf = jax.lax.dynamic_update_slice(buf, speech[None], (0, 0))
        mvn = self.mvn_stats
        return self.model.apply(
            {"params": self.params}, buf, jnp.asarray([length]),
            method=lambda m, s, sl: m.encode(s, sl, mvn_stats=mvn))

    def _final_search(self, hs, h_lengths):
        from .transducer_beam import (MAESConfig, NSCConfig, TSDConfig,
                                      TransducerBeamConfig, maes_search,
                                      nsc_search, transducer_beam_search,
                                      tsd_search)
        from ..models.transducer import transducer_greedy_decode
        if self.beam_size <= 1 or self.search == "greedy":
            return transducer_greedy_decode(self.model, self.params, hs,
                                            h_lengths, max_len=self.max_len)
        if self.search == "maes":
            return maes_search(self.model, self.params, hs, h_lengths,
                               MAESConfig(beam_size=self.beam_size,
                                          max_len=self.max_len))
        if self.search == "tsd":
            return tsd_search(self.model, self.params, hs, h_lengths,
                              TSDConfig(beam_size=self.beam_size,
                                        max_len=self.max_len))
        if self.search == "nsc":
            return nsc_search(self.model, self.params, hs, h_lengths,
                              NSCConfig(beam_size=self.beam_size,
                                        max_len=self.max_len))
        return transducer_beam_search(
            self.model, self.params, hs, h_lengths,
            TransducerBeamConfig(beam_size=self.beam_size,
                                 max_len=self.max_len))

    def __call__(self, speech_chunk: np.ndarray, is_final: bool = False
                 ) -> Tuple[List[int], bool]:
        from ..data.sampler import bucket_length
        from ..models.transducer import transducer_greedy_decode
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(speech_chunk, np.float32)])
        n = len(self._buffer)
        if n < self.chunk_samples and not is_final:
            return [], False
        pad_to = bucket_length(max(n, self.chunk_samples),
                               self.chunk_samples)
        speech = np.zeros((pad_to,), np.float32)
        speech[:n] = self._buffer
        hs, h_lengths, _ = self._encode_jit(jnp.asarray(speech), n, pad_to)
        if not is_final:
            tokens, lengths = transducer_greedy_decode(
                self.model, self.params, hs, h_lengths,
                max_len=self.max_len)
            ids = list(np.asarray(tokens)[0][: int(lengths[0])])
            return ids, False
        tokens, lengths = self._final_search(hs, h_lengths)
        ids = list(np.asarray(tokens)[0][: int(lengths[0])])
        self.reset()
        return ids, True

    def text(self, ids: List[int]) -> str:
        if self.tokenizer is None or self.converter is None:
            return " ".join(map(str, ids))
        return self.tokenizer.tokens2text(self.converter.ids2tokens(ids))
