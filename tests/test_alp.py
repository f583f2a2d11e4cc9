"""ALP decimal-float codec: kernel vectors, exceptions, chunk
roundtrips, selector behavior, hypothesis fuzz."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_ray.codecs import decode_array, encode_array
from parquet_go_ray.codecs import alp as A
from parquet_go_ray.codecs import registry as R


def _bits(v: np.ndarray) -> np.ndarray:
    return v.view(np.uint32 if v.dtype == np.float32 else np.uint64)


def kernel_roundtrip(v: np.ndarray):
    out = A.decode(A.encode(v), v.dtype)
    assert out.dtype == v.dtype and len(out) == len(v)
    assert np.array_equal(_bits(out), _bits(v))


class TestKernel:
    def test_vectors(self):
        rng = np.random.default_rng(0)
        for v in [
            np.zeros(0, dtype=np.float64),
            np.round(rng.random(4096) * 500, 2),  # 2-decimal prices
            np.round(rng.random(4096) * 100, 4).astype(np.float32),
            rng.random(4096),  # high-entropy: all exceptions
            np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e308, 5e-324]),
            np.full(2048, 19.99),
            np.concatenate([np.round(rng.random(4000) * 10, 2), rng.random(50)]),
            rng.integers(0, 10**12, 2048).astype(np.float64) / 100.0,
            np.array([np.nan] * 64),  # every slot an exception
            np.array([-123.45, 0.01, -0.01, 99999999.99]),
        ]:
            kernel_roundtrip(np.asarray(v))

    def test_decimal_data_compresses_hard(self):
        v = np.round(np.random.default_rng(1).random(8192) * 500, 2)
        assert len(A.encode(v)) < v.nbytes * 0.35

    def test_exceptions_bounded(self):
        # 10 high-entropy values among 4000 decimals: the decimal
        # exponent must still be found and only the 10 become exceptions
        rng = np.random.default_rng(2)
        v = np.round(rng.random(4000) * 10, 2)
        v[100:110] = rng.random(10)
        blob = A.encode(v)
        import struct

        _, e, n, n_exc = struct.unpack_from("<BBII", blob, 0)
        assert e == 2 and n == 4000 and n_exc == 10
        kernel_roundtrip(v)

    def test_width_mismatch_rejected(self):
        blob = A.encode(np.array([1.5, 2.5], dtype=np.float64))
        with pytest.raises(ValueError):
            A.decode(blob, np.float32)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.floats(allow_nan=True, allow_infinity=True, width=64),
                st.decimals(
                    min_value=-10**6, max_value=10**6, places=3
                ).map(float),
            ),
            max_size=300,
        ),
        st.sampled_from([np.float32, np.float64]),
    )
    def test_fuzz(self, vals, dtype):
        kernel_roundtrip(np.array(vals, dtype=dtype))


class TestChunk:
    def test_explicit_codec_roundtrip_with_nulls(self):
        arr = pa.array([19.99, None, 0.01, 490.02, None], type=pa.float64())
        out = decode_array(encode_array(arr, R.ALP_FLOAT))
        assert out.equals(arr)

    def test_selector_picks_alp_on_prices(self):
        v = np.round(np.random.default_rng(3).random(8192) * 500, 2)
        blob = encode_array(pa.array(v, type=pa.float64()))
        assert blob[4] == R.ALP_FLOAT
        assert decode_array(blob).equals(pa.array(v, type=pa.float64()))

    def test_selector_avoids_alp_on_high_entropy(self):
        bits = np.random.default_rng(4).integers(0, 2**63, 8192, dtype=np.int64)
        v = bits.view(np.float64)
        v = np.where(np.isnan(v), 1.0, v)
        blob = encode_array(pa.array(v, type=pa.float64()))
        assert blob[4] != R.ALP_FLOAT
