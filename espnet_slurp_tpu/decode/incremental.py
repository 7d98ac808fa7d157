"""O(1)-state incremental streaming encoder (exact, per-layer caches).

The plain StreamingRecognizer (decode/streaming.py) re-encodes the full
audio prefix each chunk — exact but O(T^2) over a stream. This module is
the promised "per-chunk O(1)-state caching" optimization: per-step cost is
constant in stream length, and outputs are EXACT — bit-comparable (up to
float reassociation) with the full-utterance chunk-attention encode.

Design (TPU-native, reuses the trained ConformerEncoder parameters):
- Chunked attention (chunk_size=S frames, left_chunks=L) composes across
  depth: chunk c at layer n depends on chunks c-nL..c at the input — so a
  sliding AUDIO window cannot be exact. Instead each layer caches its own
  INPUT activations for the last C = (L + ceil((k-1)/S)) * S frames
  (attention left context + causal-conv halo), appending only exact new
  frames. Each step runs the standard ConformerBlock over
  [cache | new-chunk] with the chunk mask and a key-validity mask
  (invalid/warmup cache frames mask out exactly like the full
  computation's zero history), and emits the last S output frames.
- The frontend is streamed sample-exactly: the reflect center-padding of
  the full STFT is materialized host-side once enough samples arrive, and
  each step consumes a fixed ((4S+2)*hop + n_fft)-sample slice producing
  4S+3 mel frames = exactly S subsampled frames (Conv2dSubsampling is
  VALID: output j reads mel [4j, 4j+6], no lookahead beyond the slice).
- One jitted step function (fixed shapes) is reused for every chunk of the
  stream: samples -> STFT -> log-mel -> (global MVN) -> subsample ->
  N cached conformer blocks -> S encoder frames.

Constraints: model.chunk_size > 0, left_chunks >= 0 (bounded context is
what makes O(1) state possible), use_mvn in ("none", "global") (utterance
MVN is inherently non-streaming).
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import flax.linen as nn
import numpy as np
import jax
import jax.numpy as jnp

from ..models.asr_model import ASRModel
from ..models.conformer import ConformerBlock
from ..models.embedding import Conv2dSubsampling, rel_positional_embedding
from ..ops.masks import attention_bias, chunk_mask
from ..ops.mel import logmel
from ..ops.normalize import global_mvn
from ..ops.stft import stft


class _IncrementalStep(nn.Module):
    """One streaming step; parameter names mirror ConformerEncoder."""
    d_model: int
    n_head: int
    d_ff: int
    num_blocks: int
    kernel_size: int
    chunk: int           # S, post-subsample frames per attention chunk
    left_chunks: int     # L
    cache_len: int       # C
    n_fft: int
    win_length: Optional[int]
    hop: int
    window: str
    fs: int
    n_mels: int
    fmin: float
    fmax: Optional[float]
    htk: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, samples, caches, n_valid, n_new, mvn_stats=None):
        s, c = self.chunk, self.cache_len
        # Frontend on the fixed-size padded-sample slice (center handled
        # by the host-side reflect pad).
        spec = stft(samples, n_fft=self.n_fft, win_length=self.win_length,
                    hop_length=self.hop, window=self.window, center=False)
        power = spec[..., 0] ** 2 + spec[..., 1] ** 2
        mel = logmel(power, None, fs=self.fs, n_fft=self.n_fft,
                     n_mels=self.n_mels, fmin=self.fmin, fmax=self.fmax,
                     htk=self.htk)
        if mvn_stats is not None:
            t_mel = mel.shape[1]
            mel = global_mvn(mel, jnp.full((1,), t_mel, jnp.int32),
                             *mvn_stats)
        mel = mel.astype(self.dtype)
        x_new = Conv2dSubsampling(self.d_model, self.dtype,
                                  name="embed")(mel)        # [1, S, D]
        x_new = x_new * jnp.sqrt(jnp.asarray(self.d_model, x_new.dtype))

        w = c + s
        pos_emb = rel_positional_embedding(w, self.d_model, self.dtype)
        idx = jnp.arange(w)
        key_valid = (idx >= c - n_valid) & (idx < c + n_new)  # [W]
        att = chunk_mask(w, s, self.left_chunks)[None, None] \
            & key_valid[None, None, None, :]
        bias = attention_bias(att)
        pad_mask = key_valid[None, :]                       # [1, W]

        new_caches = []
        for i in range(self.num_blocks):
            win = jnp.concatenate([caches[i], x_new], axis=1)  # [1, W, D]
            out = ConformerBlock(
                self.d_model, self.n_head, self.d_ff, self.kernel_size,
                0.0, self.dtype, causal_conv=True, use_flash=False,
                chunk_size=self.chunk, left_chunks=self.left_chunks,
                name=f"block_{i}")(win, pos_emb, bias, pad_mask, True)
            new_caches.append(win[:, s:])
            x_new = out[:, -s:]
        return x_new, new_caches


class IncrementalConformerEncoder:
    """Stateful exact streaming encoder over a chunk-attention ASR model.

    feed(samples, is_final) -> [n_new, D] newly finalized encoder frames.
    """

    def __init__(self, model: ASRModel, params):
        cfg = model.cfg
        assert cfg.chunk_size > 0 and cfg.left_chunks >= 0, \
            "incremental streaming needs chunk_size > 0 and left_chunks >= 0"
        assert cfg.use_mvn in ("none", "global"), \
            "utterance MVN is not streamable; train with none/global"
        assert cfg.encoder == "conformer"
        assert cfg.frontend.delta_order == 0, \
            "incremental streaming does not support delta features yet"
        assert cfg.moe_experts == 0 and not cfg.preencoder \
            and not cfg.postencoder, \
            "incremental streaming supports the plain conformer stack only"
        fc = cfg.frontend
        self.cfg = cfg
        self.s = cfg.chunk_size
        halo_chunks = -(-(cfg.kernel_size - 1) // self.s)
        self.cache_len = (cfg.left_chunks + halo_chunks) * self.s
        self.hop = fc.hop_length
        self.n_fft = fc.n_fft
        self.pad = fc.n_fft // 2
        # samples consumed per step: (4S+3) mel frames at center=False
        self.mel_per_step = 4 * self.s + 3
        self.win_samples = (self.mel_per_step - 1) * self.hop + self.n_fft
        self.enc_params = params["encoder"]
        step_mod = _IncrementalStep(
            d_model=cfg.d_model, n_head=cfg.n_head, d_ff=cfg.d_ff,
            num_blocks=cfg.num_encoder_blocks, kernel_size=cfg.kernel_size,
            chunk=self.s, left_chunks=cfg.left_chunks,
            cache_len=self.cache_len, n_fft=fc.n_fft,
            win_length=fc.win_length, hop=fc.hop_length, window=fc.window,
            fs=fc.fs, n_mels=fc.n_mels, fmin=fc.fmin, fmax=fc.fmax,
            htk=fc.htk, dtype=cfg.jax_dtype)
        self._mvn = None  # set externally via set_mvn for global MVN

        def run(samples, caches, n_valid, n_new, mvn):
            return step_mod.apply({"params": self.enc_params}, samples,
                                  caches, n_valid, n_new, mvn_stats=mvn)

        self._step = jax.jit(run)
        self.reset()

    def set_mvn(self, mvn_stats):
        self._mvn = mvn_stats

    def reset(self):
        self._n_raw = 0                          # total raw samples seen
        self._head = np.zeros((0,), np.float32)  # pre-pad accumulation
        self._raw_tail = np.zeros((0,), np.float32)  # for the end reflect
        # reflect-padded stream, trimmed to the unconsumed suffix:
        # _padded[i] is padded-stream sample (_pad_offset + i).
        self._padded = None
        self._pad_offset = 0
        self._mel_done = 0                       # mel frames consumed
        self._caches = [
            jnp.zeros((1, self.cache_len, self.cfg.d_model),
                      self.cfg.jax_dtype)
            for _ in range(self.cfg.num_encoder_blocks)]
        self._n_valid = 0

    def feed(self, samples: np.ndarray, is_final: bool = False
             ) -> np.ndarray:
        """Returns newly finalized encoder frames [n, D] (may be empty).

        Host state is O(1) in stream length: the consumed prefix of the
        reflect-padded stream is dropped after each step, and only a
        (pad+2)-sample raw tail is kept for the final end reflect-pad.
        """
        samples = np.asarray(samples, np.float32)
        self._n_raw += len(samples)
        if self._padded is None:
            # Accumulate until the start reflect-pad is materializable.
            self._head = np.concatenate([self._head, samples])
            if self._n_raw > self.pad:
                head = self._head[self.pad:0:-1]
                self._padded = np.concatenate([head, self._head])
                self._raw_tail = self._head[-(self.pad + 2):]
                self._head = np.zeros((0,), np.float32)
        else:
            if len(samples):
                self._padded = np.concatenate([self._padded, samples])
                self._raw_tail = np.concatenate(
                    [self._raw_tail, samples])[-(self.pad + 2):]
        if self._padded is None:
            return np.zeros((0, self.cfg.d_model), np.float32)
        if is_final and self.pad > 0:
            # End reflect-pad; total mel frames = 1 + N//hop (center=True).
            tail = self._raw_tail[-2:-self.pad - 2:-1]
            padded = np.concatenate([self._padded, tail])
        else:
            padded = self._padded
        pad_len = self._pad_offset + len(padded)

        outs = []
        total_mel = 1 + (pad_len - self.n_fft) // self.hop \
            if pad_len >= self.n_fft else 0
        if is_final:
            total_mel = min(total_mel, 1 + self._n_raw // self.hop)
            total_sub = max((((total_mel - 1) // 2) - 1) // 2, 0)
        while True:
            start_mel = self._mel_done
            need_mel = start_mel + self.mel_per_step
            have_full = need_mel <= total_mel
            if not have_full and not is_final:
                break
            if is_final and not have_full:
                done_sub = start_mel // 4
                n_new = total_sub - done_sub
                if n_new <= 0:
                    break
                n_new = min(n_new, self.s)
            else:
                n_new = self.s
            s0 = start_mel * self.hop - self._pad_offset
            s1 = s0 + self.win_samples
            buf = np.zeros((1, self.win_samples), np.float32)
            seg = padded[s0:min(s1, len(padded))]
            buf[0, :len(seg)] = seg
            out, self._caches = self._step(
                jnp.asarray(buf), self._caches,
                jnp.asarray(self._n_valid, jnp.int32),
                jnp.asarray(n_new, jnp.int32), self._mvn)
            self._n_valid = min(self._n_valid + n_new, self.cache_len)
            self._mel_done += 4 * self.s
            outs.append(np.asarray(out[0, :n_new], np.float32))
            if is_final and n_new < self.s:
                break
            if is_final and start_mel // 4 + n_new >= total_sub:
                break
        # Drop the consumed padded prefix (everything before the next
        # step's window start).
        next_s0 = self._mel_done * self.hop
        drop = next_s0 - self._pad_offset
        if drop > 0:
            self._padded = self._padded[drop:]
            self._pad_offset = next_s0
        if outs:
            return np.concatenate(outs, axis=0)
        return np.zeros((0, self.cfg.d_model), np.float32)


class IncrementalRecognizer:
    """Speech -> text with O(1) per-chunk cost.

    Same interface as StreamingRecognizer (__call__(chunk, is_final) ->
    (token ids, done)) but built on IncrementalConformerEncoder: encoder
    states accumulate exactly, CTC-greedy partials are computed only on the
    NEW frames each step, and the final label-synchronous beam runs over
    the assembled states.
    """

    def __init__(self, model: ASRModel, params, tokenizer=None,
                 converter=None, chunk_samples: int = 8192,
                 max_len: int = 128, beam_size: int = 1,
                 ctc_weight: float = 0.3, mvn_stats=None):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.converter = converter
        self.chunk_samples = chunk_samples
        self.max_len = max_len
        self.beam_size = beam_size
        self.ctc_weight = ctc_weight
        self.enc = IncrementalConformerEncoder(model, params)
        if mvn_stats is not None:
            self.enc.set_mvn(mvn_stats)

        def ctc_argmax(hs):
            lp = model.apply({"params": params}, hs,
                             method=lambda m, x: m.ctc_logprobs(x))
            return jnp.argmax(lp, -1)

        self._ctc_jit = jax.jit(ctc_argmax)
        self.reset()

    def reset(self):
        self.enc.reset()
        self._hs: List[np.ndarray] = []
        self._raw_ids: List[int] = []
        self._pending = np.zeros((0,), np.float32)

    def _greedy_ids(self) -> List[int]:
        from ..ops.ctc import collapse_repeats
        return collapse_repeats(np.asarray(self._raw_ids, np.int64),
                                self.model.cfg.blank_id)

    def __call__(self, speech_chunk: np.ndarray, is_final: bool = False
                 ) -> Tuple[List[int], bool]:
        self._pending = np.concatenate(
            [self._pending, np.asarray(speech_chunk, np.float32)])
        if len(self._pending) >= self.chunk_samples or is_final:
            new = self.enc.feed(self._pending, is_final=is_final)
            self._pending = np.zeros((0,), np.float32)
            if len(new):
                self._hs.append(new)
                # Partials need a trained CTC head (absent when
                # ctc_weight=0 — attention-only models emit no partials).
                if "ctc" in self.params:
                    ids = self._ctc_jit(jnp.asarray(new[None]))
                    self._raw_ids.extend(int(i) for i in np.asarray(ids[0]))
        if not is_final:
            return self._greedy_ids(), False
        hs_np = np.concatenate(self._hs, axis=0) if self._hs else \
            np.zeros((0, self.model.cfg.d_model), np.float32)
        hs = jnp.asarray(hs_np[None])
        h_lengths = jnp.asarray([hs_np.shape[0]], jnp.int32)
        if self.beam_size > 1 and hs_np.shape[0] > 0:
            from .beam import BeamSearchConfig, batch_beam_search
            tokens, lengths = batch_beam_search(
                self.model, self.params, hs, h_lengths,
                BeamSearchConfig(beam_size=self.beam_size,
                                 max_len=self.max_len,
                                 ctc_weight=self.ctc_weight))
            ids = list(np.asarray(tokens)[0][: int(lengths[0])])
        elif hs_np.shape[0] > 0:
            from .greedy import attention_greedy_decode
            tokens, lengths = attention_greedy_decode(
                self.model, self.params, hs, h_lengths, self.max_len)
            ids = list(np.asarray(tokens)[0][: int(lengths[0])])
        else:
            ids = []
        self.reset()
        return ids, True

    def text(self, ids: List[int]) -> str:
        if self.tokenizer is None or self.converter is None:
            return " ".join(map(str, ids))
        return self.tokenizer.tokens2text(self.converter.ids2tokens(ids))
