"""XOR-previous float codec (byte-aligned Gorilla variant): kernel
vectors, chunk roundtrips, selector behavior, hypothesis fuzz."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_ray.codecs import decode_array, encode_array
from parquet_go_ray.codecs import registry as R
from parquet_go_ray.codecs import xorfloat as X


def _bits(v: np.ndarray) -> np.ndarray:
    return v.view(np.uint32 if v.dtype == np.float32 else np.uint64)


def kernel_roundtrip(v: np.ndarray):
    out = X.decode(X.encode(v), v.dtype)
    assert out.dtype == v.dtype and len(out) == len(v)
    assert np.array_equal(_bits(out), _bits(v))


class TestKernel:
    def test_vectors(self):
        rng = np.random.default_rng(0)
        for v in [
            np.zeros(0, dtype=np.float64),
            np.array([3.14], dtype=np.float64),
            np.cumsum(rng.normal(0, 0.01, 4096)) + 100.0,
            rng.random(4096),
            np.full(2048, 7.25),
            np.array(
                [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, 1e308, 5e-324]
            ),
            (np.cumsum(rng.normal(0, 0.01, 4096)) + 100).astype(np.float32),
            rng.random(4096).astype(np.float32),
            np.zeros(1000, dtype=np.float32),
        ]:
            kernel_roundtrip(np.asarray(v))

    def test_series_compresses(self):
        # the Gorilla case: slowly-varying series shares exponent + high
        # mantissa bytes with its predecessor
        v = np.cumsum(np.random.default_rng(1).normal(0, 1e-3, 8192)) + 50.0
        assert len(X.encode(v)) < v.nbytes * 0.9

    def test_constant_is_one_byte_per_value(self):
        v = np.full(10000, 123.456)
        assert len(X.encode(v)) <= 5 + len(v) + 10

    def test_width_mismatch_rejected(self):
        blob = X.encode(np.array([1.5, 2.5], dtype=np.float64))
        with pytest.raises(ValueError):
            X.decode(blob, np.float32)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            max_size=300,
        ),
        st.sampled_from([np.float32, np.float64]),
    )
    def test_fuzz(self, vals, dtype):
        kernel_roundtrip(np.array(vals, dtype=dtype))


class TestChunk:
    def test_explicit_codec_roundtrip_with_nulls(self):
        arr = pa.array(
            [1.5, None, 1.5000001, 2.5, None, float("nan")], type=pa.float64()
        )
        out = decode_array(encode_array(arr, R.XOR_FLOAT))
        assert out.type == arr.type
        # NaN-safe comparison: compare raw bits where valid
        a, b = arr.to_pandas(), out.to_pandas()
        assert a.isna().equals(b.isna())
        va = a.dropna().to_numpy(np.float64)
        vb = b.dropna().to_numpy(np.float64)
        assert np.array_equal(va.view(np.uint64), vb.view(np.uint64))

    def test_selector_picks_xor_on_series(self):
        v = np.cumsum(np.random.default_rng(2).normal(0, 1e-3, 8192)) + 50.0
        blob = encode_array(pa.array(v, type=pa.float64()))
        assert blob[4] == R.XOR_FLOAT
        assert decode_array(blob).equals(pa.array(v, type=pa.float64()))

    def test_selector_avoids_xor_on_random_bits(self):
        # full-range random bit patterns (random sign/exponent/mantissa):
        # every XOR spans all 8 bytes, so xor = plain + a control byte
        # per value and PLAIN/BSS must win. (Uniform [0,1) doubles are
        # NOT this case — they share the exponent byte and xor genuinely
        # beats plain there.)
        bits = np.random.default_rng(3).integers(
            0, 2**63, 8192, dtype=np.int64
        )
        v = bits.view(np.float64)
        v = np.where(np.isnan(v), 1.0, v)  # keep it a plain value set
        blob = encode_array(pa.array(v, type=pa.float64()))
        assert blob[4] != R.XOR_FLOAT
