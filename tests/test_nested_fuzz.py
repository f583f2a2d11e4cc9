"""Randomized round-trip fuzzing for the structural codecs (list /
struct / map shredding) — the nested analogue of the reference's
encoding fuzz harness (encoding/fuzz/fuzz.go:128-158)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.codecs.chunk import decode_array, encode_array

RNG = np.random.default_rng(0xC0FFEE)


def _rand_scalar_type(rng):
    return rng.choice(
        [
            pa.int64(),
            pa.int32(),
            pa.float64(),
            pa.string(),
            pa.binary(),
            pa.timestamp("us"),
            pa.bool_(),
        ]
    )


def _rand_value(ty, rng):
    if rng.random() < 0.15:
        return None
    if pa.types.is_integer(ty):
        return int(rng.integers(-(2**31), 2**31))
    if pa.types.is_floating(ty):
        return float(rng.normal())
    if pa.types.is_string(ty):
        n = int(rng.integers(0, 20))
        return "".join(chr(int(c)) for c in rng.integers(32, 127, n))
    if pa.types.is_binary(ty):
        return bytes(rng.integers(0, 256, int(rng.integers(0, 16))).tolist())
    if pa.types.is_timestamp(ty):
        return int(rng.integers(0, 2**48))
    if pa.types.is_boolean(ty):
        return bool(rng.integers(0, 2))
    raise AssertionError(ty)


def _rand_nested_type(rng, depth=0):
    roll = rng.random()
    if depth >= 2 or roll < 0.35:
        return _rand_scalar_type(rng)
    if roll < 0.6:
        return pa.list_(_rand_nested_type(rng, depth + 1))
    if roll < 0.85:
        nf = int(rng.integers(1, 4))
        return pa.struct(
            [pa.field(f"f{i}", _rand_nested_type(rng, depth + 1)) for i in range(nf)]
        )
    return pa.map_(pa.string(), _rand_nested_type(rng, depth + 1))


def _rand_nested_value(ty, rng, depth=0):
    if rng.random() < 0.1:
        return None
    if pa.types.is_list(ty):
        n = int(rng.integers(0, 5))
        return [_rand_nested_value(ty.value_type, rng, depth + 1) for _ in range(n)]
    if pa.types.is_struct(ty):
        return {
            f.name: _rand_nested_value(f.type, rng, depth + 1) for f in ty
        }
    if pa.types.is_map(ty):
        n = int(rng.integers(0, 4))
        keys = [f"k{i}" for i in range(n)]
        return [
            (k, _rand_nested_value(ty.item_type, rng, depth + 1)) for k in keys
        ]
    return _rand_value(ty, rng)


@pytest.mark.parametrize("seed", range(25))
def test_random_nested_roundtrip(seed):
    rng = np.random.default_rng(seed)
    ty = _rand_nested_type(rng)
    n = int(rng.integers(0, 80))
    vals = [_rand_nested_value(ty, rng) for _ in range(n)]
    arr = pa.array(vals, type=ty)
    out = decode_array(encode_array(arr))
    assert out.equals(arr), f"seed={seed} type={ty}"
    # per-row SCALAR access must also survive: .equals() compares
    # buffers and misses a child-type/field-metadata mismatch that
    # makes Arrow's scalar path abort (the map entries invariant)
    assert out.to_pylist() == arr.to_pylist(), f"seed={seed} type={ty}"


@pytest.mark.parametrize("seed", range(10))
def test_random_nested_sliced_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    ty = _rand_nested_type(rng)
    vals = [_rand_nested_value(ty, rng) for _ in range(60)]
    arr = pa.array(vals, type=ty)
    a = int(rng.integers(0, 30))
    ln = int(rng.integers(1, 30))
    sl = arr.slice(a, ln)
    out = decode_array(encode_array(sl))
    assert out.equals(sl), f"seed={seed} type={ty} slice=({a},{ln})"
    assert out.to_pylist() == sl.to_pylist(), f"seed={seed} type={ty}"
