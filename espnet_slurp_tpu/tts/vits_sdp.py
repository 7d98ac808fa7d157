"""VITS stochastic duration predictor (flow-based).

Parity target: reference espnet2/gan_tts/vits/duration_predictor.py:25-192
(StochasticDurationPredictor), flow.py:1-310 (LogFlow/ElementwiseAffineFlow/
ConvFlow/FlipFlow/DilatedDepthSeparableConv) and transform.py (piecewise
rational-quadratic spline, derived from nflows). TPU redesign notes:

- Layout is [B, T, C] (channel-last) like the rest of this framework; the
  reference is [B, C, T].
- The unconstrained rational-quadratic spline is computed densely with the
  input clamped into the tail bound and the outside-tails identity selected
  by jnp.where — no boolean advanced indexing (the reference's
  outputs[outside_interval_mask] = ... pattern doesn't trace under jit).
- searchsorted becomes a comparison-sum over the bin edges (bins is small,
  10 by default, so the [.., bins] broadcast is cheaper than a sorted
  search and fuses into the gather that follows).
- Flip flows are jnp.flip on the 2-channel axis; the flow stack is unrolled
  in Python (static, 4 ConvFlows) exactly like the reference ModuleList.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted(cum, x):
    """Index of the bin containing x: cum[idx] <= x < cum[idx+1].

    cum: [..., bins+1] monotone edges, x: [...]. Returns int32 [...] in
    [0, bins-1].
    """
    bins = cum.shape[-1] - 1
    idx = jnp.sum((x[..., None] >= cum[..., :-1]).astype(jnp.int32),
                  axis=-1) - 1
    return jnp.clip(idx, 0, bins - 1)


def rational_quadratic_spline(
    x, unnorm_widths, unnorm_heights, unnorm_derivatives, *, inverse=False,
    left=0.0, right=1.0, bottom=0.0, top=1.0,
    min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
):
    """Monotone rational-quadratic spline (Durkan et al. 2019).

    reference transform.py:rational_quadratic_spline. x: [...];
    unnorm_widths/heights: [..., bins]; unnorm_derivatives: [..., bins+1].
    Returns (outputs, logabsdet) with forward-direction logabsdet sign
    conventions matching the reference (negated when inverse).
    """
    bins = unnorm_widths.shape[-1]

    widths = jax.nn.softmax(unnorm_widths, axis=-1)
    widths = min_bin_width + (1.0 - min_bin_width * bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths,
                        [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left)
    cumwidths = cumwidths.at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnorm_derivatives)

    heights = jax.nn.softmax(unnorm_heights, axis=-1)
    heights = min_bin_height + (1.0 - min_bin_height * bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights,
                         [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom)
    cumheights = cumheights.at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    idx = _searchsorted(cumheights if inverse else cumwidths, x)[..., None]

    def g(a):
        return jnp.take_along_axis(a, idx, axis=-1)[..., 0]

    in_cumwidths = g(cumwidths[..., :-1])
    in_widths = g(widths)
    in_cumheights = g(cumheights[..., :-1])
    in_heights = g(heights)
    delta = heights / widths
    in_delta = g(delta)
    in_deriv = g(derivatives[..., :-1])
    in_deriv_p1 = g(derivatives[..., 1:])

    if inverse:
        dd = in_deriv + in_deriv_p1 - 2.0 * in_delta
        a = (x - in_cumheights) * dd + in_heights * (in_delta - in_deriv)
        b = in_heights * in_deriv - (x - in_cumheights) * dd
        c = -in_delta * (x - in_cumheights)
        disc = b ** 2 - 4.0 * a * c
        disc = jnp.maximum(disc, 0.0)
        root = (2.0 * c) / (-b - jnp.sqrt(disc))
        outputs = root * in_widths + in_cumwidths
        tom = root * (1.0 - root)
        denom = in_delta + dd * tom
        dnum = in_delta ** 2 * (in_deriv_p1 * root ** 2
                                + 2.0 * in_delta * tom
                                + in_deriv * (1.0 - root) ** 2)
        logabsdet = -(jnp.log(dnum) - 2.0 * jnp.log(denom))
        return outputs, logabsdet
    theta = (x - in_cumwidths) / in_widths
    tom = theta * (1.0 - theta)
    numer = in_heights * (in_delta * theta ** 2 + in_deriv * tom)
    denom = in_delta + (in_deriv + in_deriv_p1 - 2.0 * in_delta) * tom
    outputs = in_cumheights + numer / denom
    dnum = in_delta ** 2 * (in_deriv_p1 * theta ** 2
                            + 2.0 * in_delta * tom
                            + in_deriv * (1.0 - theta) ** 2)
    logabsdet = jnp.log(dnum) - 2.0 * jnp.log(denom)
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
    x, unnorm_widths, unnorm_heights, unnorm_derivatives, *, inverse=False,
    tail_bound=5.0, min_bin_width=DEFAULT_MIN_BIN_WIDTH,
    min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
    min_derivative=DEFAULT_MIN_DERIVATIVE,
):
    """Linear-tails spline (reference transform.py:
    unconstrained_rational_quadratic_spline). Identity outside
    [-tail_bound, tail_bound]; spline inside, with boundary derivatives
    pinned so the junction is C1."""
    inside = (x >= -tail_bound) & (x <= tail_bound)
    constant = float(np.log(np.expm1(1.0 - min_derivative)))
    ud = jnp.pad(unnorm_derivatives,
                 [(0, 0)] * (unnorm_derivatives.ndim - 1) + [(1, 1)])
    ud = ud.at[..., 0].set(constant)
    ud = ud.at[..., -1].set(constant)
    xc = jnp.clip(x, -tail_bound, tail_bound)
    out_in, ld_in = rational_quadratic_spline(
        xc, unnorm_widths, unnorm_heights, ud, inverse=inverse,
        left=-tail_bound, right=tail_bound, bottom=-tail_bound,
        top=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative)
    return jnp.where(inside, out_in, x), jnp.where(inside, ld_in, 0.0)


class DilatedDepthSeparableConv(nn.Module):
    """flow.py:DilatedDepthSeparableConv — per layer: depthwise dilated
    conv -> LN -> GELU -> 1x1 conv -> LN -> GELU -> dropout, residual."""
    channels: int
    kernel: int
    layers: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, g=None, deterministic=True):
        m = pad_mask[..., None].astype(x.dtype)
        if g is not None:
            x = x + g
        for i in range(self.layers):
            dil = self.kernel ** i
            y = nn.Conv(self.channels, (self.kernel,),
                        kernel_dilation=(dil,), padding="SAME",
                        feature_group_count=self.channels,
                        dtype=self.dtype, name=f"dw_{i}")(x * m)
            y = nn.LayerNorm(dtype=self.dtype, name=f"norm1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Conv(self.channels, (1,), dtype=self.dtype,
                        name=f"pw_{i}")(y)
            y = nn.LayerNorm(dtype=self.dtype, name=f"norm2_{i}")(y)
            y = nn.gelu(y, approximate=False)
            if self.dropout_rate > 0 and not deterministic:
                y = nn.Dropout(self.dropout_rate)(y, deterministic=False)
            x = x + y
        return x * m


class ConvFlow(nn.Module):
    """flow.py:ConvFlow — spline coupling over 2 channels ([.., 0] passes
    through and conditions the spline applied to [.., 1])."""
    hidden_channels: int
    kernel: int
    layers: int
    bins: int = 10
    tail_bound: float = 5.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, g=None, inverse=False,
                 deterministic=True):
        xa, xb = x[..., :1], x[..., 1:]
        h = nn.Conv(self.hidden_channels, (1,), dtype=self.dtype,
                    name="input_conv")(xa)
        h = DilatedDepthSeparableConv(
            self.hidden_channels, self.kernel, self.layers,
            dtype=self.dtype, name="dds")(h, pad_mask, g=g,
                                          deterministic=deterministic)
        h = nn.Conv(self.bins * 3 - 1, (1,), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="proj")(h)
        h = h * pad_mask[..., None].astype(h.dtype)  # [B, T, 3*bins-1]
        denom = math.sqrt(self.hidden_channels)
        uw = h[..., :self.bins] / denom
        uh = h[..., self.bins:2 * self.bins] / denom
        ud = h[..., 2 * self.bins:]
        yb, ld = unconstrained_rational_quadratic_spline(
            xb[..., 0], uw, uh, ud, inverse=inverse,
            tail_bound=self.tail_bound)
        y = jnp.concatenate([xa, yb[..., None]], axis=-1)
        y = y * pad_mask[..., None].astype(y.dtype)
        logdet = jnp.sum(ld * pad_mask.astype(ld.dtype), axis=-1)
        if inverse:
            return y
        return y, logdet


class ElementwiseAffineFlow(nn.Module):
    """flow.py:ElementwiseAffineFlow."""
    channels: int

    @nn.compact
    def __call__(self, x, pad_mask, inverse=False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        mask = pad_mask[..., None].astype(x.dtype)
        if inverse:
            return (x - m) * jnp.exp(-logs) * mask
        y = (m + jnp.exp(logs) * x) * mask
        logdet = jnp.sum(logs * mask, axis=(-2, -1))
        return y, logdet


def log_flow(x, pad_mask, eps=1e-5):
    """flow.py:LogFlow forward."""
    mask = pad_mask[..., None].astype(x.dtype)
    y = jnp.log(jnp.maximum(x, eps)) * mask
    return y, jnp.sum(-y, axis=(-2, -1))


class StochasticDurationPredictor(nn.Module):
    """duration_predictor.py:StochasticDurationPredictor.

    Call with w (durations [B, T, 1]) and rng for the training NLL [B];
    call with inverse=True and rng for sampled log-durations [B, T].
    """
    channels: int = 192
    kernel: int = 3
    dropout_rate: float = 0.5
    flows: int = 4
    dds_layers: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        c = self.channels
        self.pre = nn.Conv(c, (1,), dtype=self.dtype, name="pre")
        self.dds = DilatedDepthSeparableConv(
            c, self.kernel, self.dds_layers, self.dropout_rate,
            self.dtype, name="dds")
        self.proj = nn.Conv(c, (1,), dtype=self.dtype, name="proj")
        self.aff = ElementwiseAffineFlow(2, name="aff")
        self.conv_flows = [
            ConvFlow(c, self.kernel, self.dds_layers, dtype=self.dtype,
                     name=f"flow_{i}") for i in range(self.flows)]
        self.post_pre = nn.Conv(c, (1,), dtype=self.dtype, name="post_pre")
        self.post_dds = DilatedDepthSeparableConv(
            c, self.kernel, self.dds_layers, self.dropout_rate,
            self.dtype, name="post_dds")
        self.post_proj = nn.Conv(c, (1,), dtype=self.dtype,
                                 name="post_proj")
        self.post_aff = ElementwiseAffineFlow(2, name="post_aff")
        self.post_conv_flows = [
            ConvFlow(c, self.kernel, self.dds_layers, dtype=self.dtype,
                     name=f"post_flow_{i}") for i in range(self.flows)]

    def __call__(self, h, pad_mask, w=None, rng=None, inverse=False,
                 noise_scale=1.0, deterministic=True):
        mask = pad_mask[..., None].astype(h.dtype)
        x = jax.lax.stop_gradient(h)
        x = self.pre(x)
        x = self.dds(x, pad_mask, deterministic=deterministic)
        x = self.proj(x) * mask

        if inverse:
            # reversed flow stack, skipping the unused ConvFlow the
            # reference drops (duration_predictor.py:180-182).
            z = jax.random.normal(rng, x.shape[:2] + (2,),
                                  x.dtype) * noise_scale
            # Reference order (duration_predictor.py:180-189): undo each
            # flip then invert each ConvFlow, except the very first
            # training-order ConvFlow which is dropped as the "useless
            # vflow" (only its flip is undone).
            for f in list(reversed(self.conv_flows))[:-1]:
                z = jnp.flip(z, axis=-1)
                z = f(z, pad_mask, g=x, inverse=True,
                      deterministic=deterministic)
            z = jnp.flip(z, axis=-1)  # flip of the skipped ConvFlow
            z = self.aff(z, pad_mask, inverse=True)
            return z[..., 0]  # log-durations [B, T]

        assert w is not None and rng is not None
        # posterior flow q(u, z1 | w, text)
        h_w = self.post_pre(w)
        h_w = self.post_dds(h_w, pad_mask, deterministic=deterministic)
        h_w = self.post_proj(h_w) * mask
        e_q = jax.random.normal(rng, w.shape[:2] + (2,), x.dtype) * mask
        z_q = e_q
        logdet_q = jnp.zeros(w.shape[0], x.dtype)
        z_q, ld = self.post_aff(z_q, pad_mask)
        logdet_q += ld
        for f in self.post_conv_flows:
            z_q, ld = f(z_q, pad_mask, g=x + h_w,
                        deterministic=deterministic)
            logdet_q += ld
            z_q = jnp.flip(z_q, axis=-1)
        z_u, z1 = z_q[..., :1], z_q[..., 1:]
        u = nn.sigmoid(z_u) * mask
        z0 = (w - u) * mask
        logdet_q += jnp.sum((nn.log_sigmoid(z_u) + nn.log_sigmoid(-z_u))
                            * mask, axis=(-2, -1))
        logq = jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q ** 2) * mask,
                       axis=(-2, -1)) - logdet_q

        # prior flow p(z0, z1 | text)
        logdet = jnp.zeros(w.shape[0], x.dtype)
        z0, ld = log_flow(z0, pad_mask)
        logdet += ld
        z = jnp.concatenate([z0, z1], axis=-1)
        z, ld = self.aff(z, pad_mask)
        logdet += ld
        for f in self.conv_flows:
            z, ld = f(z, pad_mask, g=x, deterministic=deterministic)
            logdet += ld
            z = jnp.flip(z, axis=-1)
        nll = jnp.sum(0.5 * (math.log(2 * math.pi) + z ** 2) * mask,
                      axis=(-2, -1)) - logdet
        return nll + logq  # [B]
