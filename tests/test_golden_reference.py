"""Golden-file parity: every parquet file in the reference's own test
corpus (/root/reference/testdata, the files its file_test.go:13-30
iterates) must round-trip bit-identically through our chunk engine —
all physical types, deep nesting, maps, decimals, nulls.
"""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.codecs import decode_array, encode_array

GOLDEN = sorted(glob.glob("/root/reference/testdata/*.parquet"))


@pytest.mark.parametrize(
    "path", GOLDEN, ids=[p.rsplit("/", 1)[-1] for p in GOLDEN]
)
def test_reference_file_roundtrip(path):
    table = pq.read_table(path)
    for name in table.column_names:
        arr = table.column(name).combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = (
                arr.chunk(0)
                if arr.num_chunks == 1
                else pa.concat_arrays(arr.chunks)
                if arr.num_chunks
                else pa.array([], type=arr.type)
            )
        blob = encode_array(arr)
        out = decode_array(blob)
        assert out.type == arr.type, f"{path}:{name} type {out.type} != {arr.type}"
        assert out.equals(arr), f"{path}:{name} values differ"


def test_golden_corpus_nonempty():
    assert len(GOLDEN) >= 40
