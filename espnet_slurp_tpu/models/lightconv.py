"""Lightweight and dynamic convolution layers (Pay Less Attention, Wu et al.).

Parity targets: reference espnet/nets/pytorch_backend/transformer/
{lightconv.py,lightconv2d.py,dynamic_conv.py,dynamic_conv2d.py} — the
self-attention replacements used by the LightweightConvolution*/
DynamicConvolution* transformer decoders
(espnet2/asr/decoder/transformer_decoder.py:283-528).

TPU-first shape discipline: instead of the reference's strided-view trick
building a [B, H, T, T+k-1] band matrix, the input is unfolded once into
static [B, T, k, ...] windows and combined with an einsum — k is a small
static constant, so XLA fuses the unfold+reduce and nothing quadratic in T
is ever materialized. Incremental decoding keeps a [B, Lmax+k-1, D] ring of
GLU outputs (analogous to the KV cache) so each step is one k-window gather.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _unfold_time(x: jnp.ndarray, k: int, causal: bool) -> jnp.ndarray:
    """[B, T, C] -> [B, T, k, C] sliding windows.

    causal=True pads only the past (window i=k-1 is position t itself);
    causal=False centers the window (pad k//2 both sides, matching the
    reference's conv1d padding=k//2 with an odd k).
    """
    t = x.shape[1]
    pad = (k - 1, 0) if causal else (k // 2, (k - 1) // 2)
    xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
    return jnp.stack([xp[:, i:i + t] for i in range(k)], axis=2)


class LightweightConvolution(nn.Module):
    """linear -> GLU -> softmax-normalized shared-kernel depthwise conv ->
    linear. ``wshare`` kernel groups over the feature axis (lightconv.py).

    ``use_kernel_mask`` makes the kernel causal (decoder use). ``two_dim``
    adds the lightconv2d.py frequency-axis conv branch (concat -> linear2).
    """
    wshare: int
    n_feat: int
    kernel_size: int = 11
    dropout_rate: float = 0.0
    use_kernel_mask: bool = True
    use_bias: bool = False
    two_dim: bool = False
    dynamic: bool = False  # dynamic_conv.py: per-position predicted kernels
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.n_feat % self.wshare == 0
        d, k = self.n_feat, self.kernel_size
        self.linear1 = nn.Dense(2 * d, dtype=self.dtype, name="linear1")
        self.linear2 = nn.Dense(d, dtype=self.dtype, name="linear2")
        if self.dynamic:
            self.linear_weight = nn.Dense(self.wshare * k, dtype=self.dtype,
                                          name="linear_weight")
        else:
            self.weight = self.param(
                "weight", nn.initializers.uniform(1.0), (self.wshare, k))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros, (d,))
        if self.two_dim:
            # frequency-axis kernel, one shared [k] filter (lightconv2d.py
            # weight_f) — the dynamic 2D variant also predicts it per
            # position (dynamic_conv2d.py linear_weight_f).
            if self.dynamic:
                self.linear_weight_f = nn.Dense(k, dtype=self.dtype,
                                                name="linear_weight_f")
            else:
                self.weight_f = self.param(
                    "weight_f", nn.initializers.uniform(1.0), (k,))

    def _glu(self, x):
        a, b = jnp.split(self.linear1(x), 2, axis=-1)
        return a * nn.sigmoid(b)

    def _kernels(self, xg, window: int):
        """Softmax kernels over the last ``window`` taps.

        Returns [H, window] (static) or [B, T, H, window] (dynamic)."""
        k = self.kernel_size
        if self.dynamic:
            w = self.linear_weight(xg)  # [B, T, H*k]
            w = w.reshape(*xg.shape[:-1], self.wshare, k)
        else:
            w = self.weight  # [H, k]
        if window != k:
            # Causal truncation keeps the FIRST k//2+1 taps (oldest ->
            # current), matching the reference kernel_mask convention
            # (lightconv.py:61-64: ones(k//2+1) then zeros(k//2)).
            w = w[..., :window]
        return jax.nn.softmax(w.astype(jnp.float32), axis=-1)

    def _freq_branch(self, xg):
        """lightconv2d.py frequency-axis conv: shared [k] kernel slid over
        the channel axis (same window for every position)."""
        k = self.kernel_size
        if self.dynamic:
            wf = jax.nn.softmax(
                self.linear_weight_f(xg).astype(jnp.float32), -1)  # [B,T,k]
        else:
            wf = jax.nn.softmax(self.weight_f.astype(jnp.float32), -1)  # [k]
        c = xg.shape[-1]
        xp = jnp.pad(xg, ((0, 0),) * (xg.ndim - 1) + ((k // 2, (k - 1) // 2),))
        win = jnp.stack([xp[..., i:i + c] for i in range(k)], axis=-2)
        # win: [..., k, C]
        eq = "...kc,...k->...c" if self.dynamic else "...kc,k->...c"
        return jnp.einsum(eq, win.astype(jnp.float32), wf).astype(self.dtype)

    def __call__(self, x, pad_mask=None):
        """x: [B, T, D] -> [B, T, D].

        With use_kernel_mask the conv is causal (each position sees only
        itself and k-1 past taps — the decoder's self-attention mask
        analogue); otherwise windows are centered and ``pad_mask`` ([B, T]
        True=valid) zeroes padded outputs as in the reference.
        """
        h, d = self.wshare, self.n_feat
        xg = self._glu(x)
        window = self.kernel_size if not self.use_kernel_mask \
            else self.kernel_size // 2 + 1
        win = _unfold_time(xg, window, causal=self.use_kernel_mask)
        b, t = win.shape[0], win.shape[1]
        win = win.reshape(b, t, window, h, d // h)
        w = self._kernels(xg, window)
        if self.dynamic:
            out = jnp.einsum("btkhd,bthk->bthd", win.astype(jnp.float32), w)
        else:
            out = jnp.einsum("btkhd,hk->bthd", win.astype(jnp.float32), w)
        out = out.reshape(b, t, d).astype(self.dtype)
        if self.use_bias:
            out = out + self.bias
        if self.two_dim:
            out = jnp.concatenate([out, self._freq_branch(xg)], axis=-1)
        if pad_mask is not None and not self.use_kernel_mask:
            out = jnp.where(pad_mask[..., None], out, 0.0)
        return self.linear2(out)

    # ---- incremental decoding -------------------------------------------

    @property
    def cache_len_pad(self) -> int:
        """Extra past slots the GLU ring buffer needs before position 0."""
        return (self.kernel_size // 2 + 1) - 1

    def init_cache(self, batch: int, max_len: int) -> jnp.ndarray:
        return jnp.zeros((batch, max_len + self.cache_len_pad, self.n_feat),
                         self.dtype)

    def step(self, x_t, cache, step_idx):
        """One decode step. x_t: [B, 1, D]; cache: GLU-output ring buffer.

        Returns (y_t [B, 1, D], new_cache). Causal (use_kernel_mask) only.
        """
        window = self.kernel_size // 2 + 1
        xg = self._glu(x_t)  # [B, 1, D]
        cache = lax.dynamic_update_slice_in_dim(
            cache, xg, step_idx + self.cache_len_pad, 1)
        win = lax.dynamic_slice_in_dim(cache, step_idx, window, 1)
        b = x_t.shape[0]
        h, d = self.wshare, self.n_feat
        w = self._kernels(xg, window)  # [H,w] or [B,1,H,w]
        winh = win.reshape(b, window, h, d // h).astype(jnp.float32)
        if self.dynamic:
            out = jnp.einsum("bkhd,bhk->bhd", winh, w[:, 0])
        else:
            out = jnp.einsum("bkhd,hk->bhd", winh, w)
        out = out.reshape(b, 1, d).astype(self.dtype)
        if self.use_bias:
            out = out + self.bias
        if self.two_dim:
            out = jnp.concatenate([out, self._freq_branch(xg)], axis=-1)
        return self.linear2(out), cache
