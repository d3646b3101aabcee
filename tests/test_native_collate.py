"""Native C++ collate bindings + prefetch iterator."""

import numpy as np

from huggingface_asr_tpu.data.native_collate import (
    _load,
    collate_f32,
    collate_i32,
    pcm16_to_f32,
)
from huggingface_asr_tpu.data.prefetch import PrefetchIterator


def test_native_library_builds():
    assert _load() is not None, "g++ build of native/collate.cpp failed"


def test_collate_f32_matches_numpy():
    rng = np.random.default_rng(0)
    rows = [rng.standard_normal(n).astype(np.float32) for n in (100, 250, 17)]
    out, lens = collate_f32(rows, 256)
    assert out.shape == (3, 256)
    assert list(lens) == [100, 250, 17]
    for i, r in enumerate(rows):
        np.testing.assert_array_equal(out[i, : len(r)], r)
        assert np.all(out[i, len(r):] == 0.0)


def test_collate_f32_truncates():
    rows = [np.ones(300, np.float32)]
    out, lens = collate_f32(rows, 128)
    assert lens[0] == 128
    assert out[0].sum() == 128


def test_collate_i32():
    out, lens = collate_i32([[1, 2, 3], [4]], 8, fill=-7)
    np.testing.assert_array_equal(out[0], [1, 2, 3, -7, -7, -7, -7, -7])
    np.testing.assert_array_equal(out[1], [4] + [-7] * 7)
    assert list(lens) == [3, 1]


def test_pcm16_roundtrip():
    pcm = np.array([0, 0, 16384, -16384, 32767, 0], np.int16)
    out = pcm16_to_f32(pcm, trim=True)
    np.testing.assert_allclose(out, [0.5, -0.5, 32767 / 32768], rtol=1e-6)
    out_notrim = pcm16_to_f32(pcm, trim=False)
    assert len(out_notrim) == 6


def test_prefetch_iterator():
    batches = [{"x": np.full((2,), i)} for i in range(10)]
    got = list(PrefetchIterator(iter(batches), depth=3))
    assert len(got) == 10
    np.testing.assert_array_equal(got[5]["x"], batches[5]["x"])


def test_prefetch_propagates_errors():
    def gen():
        yield {"x": np.zeros(1)}
        raise RuntimeError("boom")

    it = PrefetchIterator(gen(), depth=2)
    next(it)
    try:
        next(it)
        assert False, "expected RuntimeError"
    except RuntimeError as e:
        assert "boom" in str(e)
