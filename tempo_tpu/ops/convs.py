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

import jax
import jax.numpy as jnp
from jax import lax

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


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
    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DIMENSION_NUMBERS,
        precision=_precision_for(x.dtype),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


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
