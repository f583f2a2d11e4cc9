"""Legacy BIT_PACKED (big-endian) round-trip tests (bitpacked.go parity)."""

import numpy as np
import pytest

from parquet_go_ray.codecs import bitpacked


@pytest.mark.parametrize("width", [1, 2, 3, 5, 7, 8])
@pytest.mark.parametrize("n", [0, 1, 7, 8, 9, 64, 255, 1000])
def test_roundtrip(width, n):
    rng = np.random.default_rng(width * 1000 + n)
    vals = rng.integers(0, 1 << width, n).astype(np.uint64)
    assert np.array_equal(bitpacked.decode(bitpacked.encode(vals, width), width, n), vals)


def test_known_vector():
    # 3-bit values 0..7 MSB-first pack to the classic parquet example
    vals = np.arange(8, dtype=np.uint64)
    out = bitpacked.encode(vals, 3)
    assert out == bytes([0b00000101, 0b00111001, 0b01110111])
