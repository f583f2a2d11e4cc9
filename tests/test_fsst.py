"""FSST symbol-table codec tests (paper-based; not in the reference)."""

import numpy as np
import pytest

from parquet_go_ray.codecs import fsst


def test_roundtrip_text():
    rng = np.random.default_rng(0)
    words = ["the", "quick", "brown", "fox", "http://", "www", "compression"]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 40))) for _ in range(300)]
    data = "\n".join(texts).encode()
    table = fsst.train(data)
    enc = table.encode(data)
    assert table.decode(enc) == data
    assert len(enc) < len(data) // 2  # must actually compress natural text


def test_escape_bytes():
    data = b"\xff" * 100 + b"ab\xff\xffcd" + bytes(range(256))
    table = fsst.train(data)
    assert table.decode(table.encode(data)) == data


def test_empty_and_tiny():
    for data in [b"", b"a", b"ab", b"\xff"]:
        t = fsst.train(data)
        assert t.decode(t.encode(data)) == data


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_random_alphabets(seed):
    r = np.random.default_rng(seed)
    alpha = int(r.integers(1, 256))
    raw = r.integers(0, alpha, int(r.integers(0, 4000))).astype(np.uint8).tobytes()
    t = fsst.train(raw)
    assert t.decode(t.encode(raw)) == raw


def test_byte_array_codec():
    rng = np.random.default_rng(3)
    strs = [b"", b"short", b"the same prefix " * 5, b"\x00\xff binary \x00"] * 40
    buf = b"".join(strs)
    off = np.cumsum([0] + [len(s) for s in strs])
    e = fsst.encode_byte_array(buf, off)
    d, o = fsst.decode_byte_array(e)
    assert d == buf
    assert np.array_equal(o, off)


def test_native_numpy_cross_compat():
    """The C hot loop and the numpy reference implementation must accept
    each other's streams (and produce equal-size output on this input)."""
    rng = np.random.default_rng(4)
    words = ["alpha", "beta", "gamma", "delta", " ", "the", "npj"]
    data = "".join(rng.choice(words, 3000)).encode() + bytes([255, 0, 255])
    table = fsst.train(data)
    lib = fsst._native()
    if lib is None:
        pytest.skip("no system compiler available")
    native_stream = table.encode(data)
    saved = fsst._NATIVE
    try:
        fsst._NATIVE = False  # force numpy path
        numpy_stream = table.encode(data)
        assert table.decode(native_stream) == data  # numpy decodes native
        fsst._NATIVE = saved
        assert table.decode(numpy_stream) == data  # native decodes numpy
        assert len(native_stream) == len(numpy_stream)
    finally:
        fsst._NATIVE = saved


def test_table_serialization():
    table = fsst.train(b"hello world hello world hello")
    blob = table.serialize()
    table2, pos = fsst.SymbolTable.deserialize(blob)
    assert pos == len(blob)
    assert table2.symbols == table.symbols
