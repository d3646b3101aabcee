"""SpecAugment compiled into the training graph (jit-compatible, batched).

Behavioral twin of the reference's ESPnet-port SpecAug (reference:
src/augmentations/spec_aug.py:312-393): time warp via bicubic interpolation
around a random center, N frequency masks with uniform widths, N time masks
with widths either absolute or relative to sequence length. The reference
runs this in CPU dataloader workers; here it is a pure function of
(rng, features, lengths) that XLA fuses into the train step — per-example
randomness comes from splitting the step RNG, so it is reproducible and
sharding-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    apply_time_warp: bool = True
    time_warp_window: int = 5
    apply_freq_mask: bool = True
    freq_mask_width_range: Tuple[int, int] = (0, 27)
    num_freq_mask: int = 2
    apply_time_mask: bool = True
    time_mask_width_range: Optional[Tuple[int, int]] = None
    time_mask_width_ratio_range: Optional[Tuple[float, float]] = (0.0, 0.05)
    num_time_mask: int = 5
    replace_with_zero: bool = True


def _cubic_kernel(x: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys cubic convolution kernel (a=-0.75, torch bicubic convention)."""
    ax = jnp.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w1 = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    w2 = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def _resample_time_cubic(
    x: jnp.ndarray, src_coords: jnp.ndarray, seg_start: jnp.ndarray, seg_end: jnp.ndarray
) -> jnp.ndarray:
    """Cubic interpolation of (T, F) along time at float coords, clamped to a segment.

    seg_start/seg_end bound the taps per output position (the reference
    interpolates the two warp segments independently, so taps must not
    cross the cut point).
    """
    base = jnp.floor(src_coords).astype(jnp.int32)
    out = 0.0
    wsum = 0.0
    for k in range(-1, 3):
        tap = base + k
        w = _cubic_kernel(src_coords - tap.astype(src_coords.dtype))
        tap = jnp.clip(tap, seg_start, seg_end - 1)
        out = out + w[:, None] * x[tap]
        wsum = wsum + w
    return out / jnp.maximum(wsum, 1e-6)[:, None]


def _time_warp_one(
    rng: jax.Array, x: jnp.ndarray, length: jnp.ndarray, window: int
) -> jnp.ndarray:
    """Warp a single (T, F) example over its valid length."""
    T = x.shape[0]
    r_center, r_shift = jax.random.split(rng)
    # center ~ U[window, length - window); warped = center + U[-window, window) + 1
    center = jax.random.randint(r_center, (), window, jnp.maximum(length - window, window + 1))
    warped = center + jax.random.randint(r_shift, (), -window, window) + 1

    o = jnp.arange(T, dtype=jnp.float32)
    lenf = length.astype(jnp.float32)
    cf, wf = center.astype(jnp.float32), warped.astype(jnp.float32)
    # align_corners=False mapping per segment: in = (out + .5) * scale - .5
    left_coord = (o + 0.5) * (cf / jnp.maximum(wf, 1.0)) - 0.5
    right_coord = cf + (o - wf + 0.5) * ((lenf - cf) / jnp.maximum(lenf - wf, 1.0)) - 0.5
    in_left = o < wf
    coords = jnp.where(in_left, left_coord, right_coord)
    seg_start = jnp.where(in_left, 0, center).astype(jnp.int32)
    seg_end = jnp.where(in_left, center, length).astype(jnp.int32)

    warped_x = _resample_time_cubic(x, coords, seg_start, seg_end)
    # Too-short sequences (length - window <= window) and padding are untouched.
    do_warp = (length - window > window) & (o.astype(jnp.int32) < length)
    return jnp.where(do_warp[:, None], warped_x, x)


def _mask_along_axis(
    rng: jax.Array,
    spec: jnp.ndarray,
    width_min: jnp.ndarray,
    width_max: jnp.ndarray,
    num_mask: int,
    axis: int,
) -> jnp.ndarray:
    """Batched mask sampling — per-example widths/positions, any-of-N union."""
    B = spec.shape[0]
    D = spec.shape[axis]
    r_len, r_pos = jax.random.split(rng)
    widths = jax.random.randint(
        r_len, (B, num_mask), width_min, jnp.maximum(width_max, width_min + 1)
    )
    max_w = jnp.max(widths, axis=1, keepdims=True)
    pos_bound = jnp.maximum(D - max_w, 1)
    positions = jax.random.randint(r_pos, (B, num_mask), 0, pos_bound)

    aran = jnp.arange(D, dtype=jnp.int32)[None, None, :]
    mask = (positions[..., None] <= aran) & (aran < positions[..., None] + widths[..., None])
    mask = jnp.any(mask, axis=1)  # (B, D)
    shape = [B, 1, 1]
    shape[axis] = D
    return jnp.where(mask.reshape(shape), 0.0, spec)


def spec_augment(
    rng: jax.Array,
    features: jnp.ndarray,
    lengths: jnp.ndarray,
    config: SpecAugmentConfig = SpecAugmentConfig(),
) -> jnp.ndarray:
    """Apply SpecAugment to a padded batch (B, T, F) with valid ``lengths``."""
    B, T, F = features.shape
    r_warp, r_freq, r_time = jax.random.split(rng, 3)

    x = features
    if config.apply_time_warp:
        warp_rngs = jax.random.split(r_warp, B)
        x = jax.vmap(_time_warp_one, in_axes=(0, 0, 0, None))(
            warp_rngs, x, lengths, config.time_warp_window
        )
    if config.apply_freq_mask:
        lo, hi = config.freq_mask_width_range
        x = _mask_along_axis(
            r_freq, x, jnp.int32(lo), jnp.int32(hi), config.num_freq_mask, axis=2
        )
    if config.apply_time_mask:
        if config.time_mask_width_range is not None:
            lo = jnp.full((B, 1), config.time_mask_width_range[0], dtype=jnp.int32)
            hi = jnp.full((B, 1), config.time_mask_width_range[1], dtype=jnp.int32)
        else:
            rlo, rhi = config.time_mask_width_ratio_range
            # Reference computes ratios against the padded max length
            # (spec_aug.py:296-300); we use per-example valid length, which
            # is the stricter/more correct behavior under bucketed padding.
            lo = jnp.floor(lengths.astype(jnp.float32) * rlo).astype(jnp.int32)[:, None]
            hi = jnp.floor(lengths.astype(jnp.float32) * rhi).astype(jnp.int32)[:, None]
            hi = jnp.maximum(hi, lo + 1)
        x = _mask_along_axis(r_time, x, lo, hi, config.num_time_mask, axis=1)

    # Never introduce energy into padding frames.
    valid = jnp.arange(T, dtype=jnp.int32)[None, :] < lengths[:, None]
    return jnp.where(valid[:, :, None], x, features)
