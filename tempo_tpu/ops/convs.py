"""TPU-native conv primitives (NHWC layout).

Design notes (TPU-first, not a port):
- All activations are NHWC so the channel dimension sits on the TPU lane axis;
  weights are HWIO. XLA lowers `conv_general_dilated` onto the MXU directly.
- The reference's kernel-2 stride-2 downsample / transposed upsample
  (reference: src/model.py:240-247, 270-278) are algebraically exact matmuls
  after a space-to-depth / before a depth-to-space reshuffle. We implement
  them that way: a [B,H/2,W/2,4C] x [4C,C'] matmul keeps the MXU busy and
  avoids strided-conv / conv-transpose lowering overhead.
- Convs accept a compute dtype; accumulation is always float32 via
  `preferred_element_type`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")

# TPU vector lane width: the channel (minor) axis is tiled in units of 128.
_LANES = 128


def _ragged_split(c: int):
    """Split a channel count into (tile-aligned main, small tail), or None.

    A channel count like 1028 = 8*128 + 4 forces XLA's conv emitter onto a
    4-wide output-channel window (measured: the 1028-channel boundary convs
    run at ~40% of the rate of the 512-channel convs in the same step, and
    together cost ~73 ms of a 206 ms flagship train step). Splitting the
    conv into a 1024-lane-aligned part plus a 4-channel tail lets the main
    part use full 128-lane MXU windows; the tail is bandwidth-trivial.
    """
    main = (c // _LANES) * _LANES
    tail = c - main
    if tail == 0 or main < 2 * _LANES:
        return None
    return main, tail


def _split_conv_mode() -> str:
    """TEMPO_TPU_SPLIT_RAGGED_CONV: '1' (default) = split forward with
    raw-conv transposes in the backward (measured best: the split helps the
    conv+loss/stats forward fusions but the sliced cotangents regress every
    backward op); 'naive' = split with plain autodiff; '0' = off."""
    return os.environ.get("TEMPO_TPU_SPLIT_RAGGED_CONV", "1")


def _precision_for(dtype) -> lax.Precision | None:
    """float32 inputs get full-precision contractions (some backends default
    to reduced precision); bfloat16 inputs keep the fast default path."""
    return lax.Precision.HIGHEST if dtype == jnp.float32 else None


def conv2d_nhwc(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None,
                stride: int = 1, padding: str | int = "SAME") -> jax.Array:
    """2D convolution, NHWC activations / HWIO kernel, fp32 accumulation."""
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    # Output dtype follows the input dtype: the TPU MXU accumulates bf16
    # contractions in fp32 internally, and keeping operand/cotangent dtypes
    # uniform is required for conv's transpose rule under autodiff.
    kernel = kernel.astype(x.dtype)

    def raw_conv(xx, kk):
        return lax.conv_general_dilated(
            xx,
            kk,
            window_strides=(stride, stride),
            padding=pad,
            dimension_numbers=_DIMENSION_NUMBERS,
            precision=_precision_for(x.dtype),
        )

    mode = _split_conv_mode()
    out = None
    if mode != "0":
        cin, cout = kernel.shape[2], kernel.shape[3]
        if _ragged_split(cout) or _ragged_split(cin):
            if mode == "naive":
                out = _conv_lane_split(x, kernel, raw_conv)
            else:
                out = _conv_split_fwd_raw_bwd(x, kernel, raw_conv)
    if out is None:
        out = raw_conv(x, kernel)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _conv_split_fwd_raw_bwd(x: jax.Array, kernel: jax.Array, raw_conv) -> jax.Array:
    """Lane-split conv forward with the RAW conv's native transposes as the
    backward. Measured on the flagship step (batch 64, v5e): splitting the
    1028-channel boundary convs speeds the forward's conv+loss/conv+stats
    fusions by ~5 ms, but autodiff of the split slices every cotangent and
    regresses the backward by ~7 ms; the raw ragged wgrad/dgrad are the
    fastest backward formulations (tools/boundary_conv_experiments.py). The
    two formulations are algebraically identical, so mixing them changes
    gradients only by fp32 reassociation."""

    @jax.custom_vjp
    def conv_fn(xx, kk):
        return _conv_lane_split(xx, kk, raw_conv)

    def fwd(xx, kk):
        return conv_fn(xx, kk), (xx, kk)

    def bwd(res, g):
        xx, kk = res
        # linear_transpose traces (never executes) the raw forward, yielding
        # XLA's native dgrad/wgrad convs for the ragged shape.
        dx, = jax.linear_transpose(lambda v: raw_conv(v, kk), xx)(g)
        dk, = jax.linear_transpose(lambda v: raw_conv(xx, v), kk)(g)
        return dx, dk

    conv_fn.defvjp(fwd, bwd)
    return conv_fn(x, kernel)


def _conv_lane_split(x: jax.Array, kernel: jax.Array, raw_conv) -> jax.Array | None:
    """Decompose a conv with a ragged (non-multiple-of-128) channel axis into
    a lane-aligned main conv plus a small tail, or return None if already
    aligned. The splits/concat land on 128-lane tile boundaries, so they are
    cheap relayouts next to the conv itself. NOTE: plain autodiff of this
    composition slices every cotangent and measured SLOWER than the raw
    ragged wgrad/dgrad — that is why the default path wraps it in
    _conv_split_fwd_raw_bwd rather than differentiating through it."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    s_out = _ragged_split(cout)
    if s_out is not None:
        main, _ = s_out
        a = raw_conv(x, kernel[..., :main])
        b = raw_conv(x, kernel[..., main:])
        return jnp.concatenate([a, b], axis=-1)
    s_in = _ragged_split(cin)
    if s_in is not None:
        main, _ = s_in
        return (raw_conv(x[..., :main], kernel[:, :, :main, :])
                + raw_conv(x[..., main:], kernel[:, :, main:, :]))
    return None


def conv3d_ndhwc(x: jax.Array, kernel: jax.Array,
                 bias: jax.Array | None = None, stride: int = 1,
                 padding: str | int = "SAME") -> jax.Array:
    """3D convolution, NDHWC activations / DHWIO kernel, fp32-accumulated.

    The volumetric path of the reference CUNet (dim=3,
    /root/reference/src/mltools/networks/networks.py:43 via
    network_tools.py get_conv). The channel axis stays minor (lane axis);
    XLA lowers the 3-D conv onto the MXU the same way as 2-D. The
    lane-split machinery above is 2-D-only — volumetric channel counts in
    the toolkit are 8/16-sized, never ragged at the 1028 scale."""
    if isinstance(padding, int):
        pad = [(padding, padding)] * 3
    else:
        pad = padding
    kernel = kernel.astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,) * 3,
        padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=_precision_for(x.dtype),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def space_to_depth_2x3d(x: jax.Array) -> jax.Array:
    """[B,D,H,W,C] -> [B,D/2,H/2,W/2,8C]; the 8 block voxels are ordered
    (dd,di,dj) row-major so a following matmul reproduces a kernel-2
    stride-2 Conv3d whose DHWIO kernel was flattened over (kd,kh,kw,cin)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # [B,D/2,H/2,W/2,dd,di,dj,C]
    return x.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def depth_to_space_2x3d(x: jax.Array) -> jax.Array:
    """[B,D,H,W,8C] -> [B,2D,2H,2W,C]; inverse of space_to_depth_2x3d, so a
    preceding matmul producing (dd,di,dj,cout)-ordered channels reproduces
    a kernel-2 stride-2 ConvTranspose3d."""
    b, d, h, w, c8 = x.shape
    c = c8 // 8
    x = x.reshape(b, d, h, w, 2, 2, 2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # [B,D,dd,H,di,W,dj,C]
    return x.reshape(b, 2 * d, 2 * h, 2 * w, c)


def space_to_depth_2x(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,4C]; the 4 block pixels are ordered (di,dj)
    row-major so a following matmul reproduces a kernel-2 stride-2 conv whose
    HWIO kernel was flattened over (kh,kw,cin)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B,H/2,W/2,di,dj,C]
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space_2x(x: jax.Array) -> jax.Array:
    """[B,H,W,4C] -> [B,2H,2W,C]; inverse ordering of space_to_depth_2x, so a
    preceding matmul producing (di,dj,cout)-ordered channels reproduces a
    kernel-2 stride-2 transposed conv."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B,H,di,W,dj,C]
    return x.reshape(b, 2 * h, 2 * w, c)


def dense(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Channel-last matmul with fp32 accumulation (used for 1x1 convs and the
    down/up sample matmuls)."""
    out = lax.dot_general(
        x,
        kernel.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        precision=_precision_for(x.dtype),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
