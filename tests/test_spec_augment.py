"""SpecAugment: shape, masking statistics, padding safety, jit."""

import numpy as np

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.ops.spec_augment import SpecAugmentConfig, spec_augment


def _batch(rng, B=4, T=200, F=80):
    x = rng.standard_normal((B, T, F)).astype(np.float32) + 5.0  # keep away from 0
    lengths = np.array([200, 150, 90, 200][:B], dtype=np.int32)
    for b, l in enumerate(lengths):
        x[b, l:] = 0.0
    return jnp.asarray(x), jnp.asarray(lengths)


def test_shapes_and_padding_untouched():
    rng = np.random.default_rng(0)
    x, lengths = _batch(rng)
    out = spec_augment(jax.random.key(0), x, lengths)
    assert out.shape == x.shape
    for b, l in enumerate(np.asarray(lengths)):
        np.testing.assert_array_equal(np.asarray(out[b, l:]), np.asarray(x[b, l:]))


def test_freq_masks_zero_full_rows():
    rng = np.random.default_rng(1)
    x, lengths = _batch(rng)
    cfg = SpecAugmentConfig(
        apply_time_warp=False, apply_time_mask=False,
        freq_mask_width_range=(5, 10), num_freq_mask=2,
    )
    out = np.asarray(spec_augment(jax.random.key(1), x, lengths, cfg))
    for b in range(out.shape[0]):
        l = int(lengths[b])
        zero_bins = np.all(out[b, :l] == 0.0, axis=0)
        assert 5 <= zero_bins.sum() <= 20  # between one and two masks of width 5-10


def test_time_masks_zero_full_frames():
    rng = np.random.default_rng(2)
    # full-length sequences: masks sampled over the padded axis (reference
    # semantics) always land in the valid region here
    x = jnp.asarray(rng.standard_normal((4, 200, 80)).astype(np.float32) + 5.0)
    lengths = jnp.full((4,), 200, jnp.int32)
    cfg = SpecAugmentConfig(
        apply_time_warp=False, apply_freq_mask=False,
        time_mask_width_range=(3, 8), time_mask_width_ratio_range=None, num_time_mask=3,
    )
    out = np.asarray(spec_augment(jax.random.key(2), x, lengths, cfg))
    for b in range(out.shape[0]):
        zero_frames = np.all(out[b] == 0.0, axis=1)
        assert 3 <= zero_frames.sum() <= 24


def test_ratio_time_masks():
    rng = np.random.default_rng(3)
    x, lengths = _batch(rng)
    cfg = SpecAugmentConfig(apply_time_warp=False, apply_freq_mask=False)
    out = np.asarray(spec_augment(jax.random.key(3), x, lengths, cfg))
    for b in range(out.shape[0]):
        l = int(lengths[b])
        zero_frames = np.all(out[b, :l] == 0.0, axis=1)
        # 5 masks, each at most 5% of length
        assert zero_frames.sum() <= int(np.ceil(0.05 * l)) * 5


def test_time_warp_preserves_energy_scale():
    rng = np.random.default_rng(4)
    x, lengths = _batch(rng)
    cfg = SpecAugmentConfig(apply_freq_mask=False, apply_time_mask=False)
    out = np.asarray(spec_augment(jax.random.key(4), x, lengths, cfg))
    x_np = np.asarray(x)
    assert not np.allclose(out, x_np)  # warp changed something
    for b in range(out.shape[0]):
        l = int(lengths[b])
        # warp is an interpolation: means stay close
        assert abs(out[b, :l].mean() - x_np[b, :l].mean()) < 0.3


def test_jit_and_determinism():
    rng = np.random.default_rng(5)
    x, lengths = _batch(rng)
    f = jax.jit(lambda k, x, l: spec_augment(k, x, l))
    a = f(jax.random.key(7), x, lengths)
    b = f(jax.random.key(7), x, lengths)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = f(jax.random.key(8), x, lengths)
    assert not np.array_equal(np.asarray(a), np.asarray(c))
