"""Convolution output-length math shared by front ends, masks, and CTC.

Mirrors the semantics of the reference's helpers (reference:
src/models/utils.py:4-38 and src/models/extractors.py:133-162) — standard
floor-division conv length formula, with a causal variant where only the
left context is padded.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp

IntLike = Union[int, jnp.ndarray]


def conv_output_length(
    input_length: IntLike,
    kernel_size: int,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> IntLike:
    """floor((L + 2*pad - dilation*(k-1) - 1) / stride) + 1."""
    return (input_length + 2 * padding - dilation * (kernel_size - 1) - 1) // stride + 1


def causal_conv_output_length(
    input_length: IntLike, kernel_size: int, stride: int = 1, dilation: int = 1
) -> IntLike:
    """Causal conv: left-pad of dilation*(k-1); length = floor((L-1)/stride)+1."""
    pad = dilation * (kernel_size - 1)
    return (input_length + pad - dilation * (kernel_size - 1) - 1) // stride + 1


def conv_stack_output_length(
    input_length: IntLike,
    kernels: Sequence[int],
    strides: Sequence[int],
    paddings: Sequence[int] = None,
    causal: bool = False,
) -> IntLike:
    length = input_length
    if paddings is None:
        paddings = [0] * len(kernels)
    for k, s, p in zip(kernels, strides, paddings):
        if causal:
            length = causal_conv_output_length(length, k, s)
        else:
            length = conv_output_length(length, k, s, p)
    return length


def lengths_to_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) int -> (B, T) bool padding mask (True = valid)."""
    return jnp.arange(max_length, dtype=jnp.int32)[None, :] < lengths[:, None]
