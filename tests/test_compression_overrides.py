"""Per-column page-compression overrides (reference parity: per-column
compress.Codec via struct tags / WriterConfig, config.go:202-216)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from parquet_go_ray.stages.decode import decode_chunk_table
from parquet_go_ray.stages.encode import encode_table

_FLAG_OFFSET = 6  # MAGIC(4) + codec(1) + ptype(1)
_COMPRESSED = 4


def _table(n=2000):
    rng = np.random.default_rng(0)
    return pa.table(
        {
            "text": pa.array(
                ["the quick brown fox " * (i % 5 + 1) for i in range(n)]
            ),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
            "n": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
        }
    )


def _compression_flags(chunks: pa.Table) -> dict[str, bool]:
    out = {}
    for name, payload in zip(
        chunks.column("column").to_pylist(), chunks.column("payload").to_pylist()
    ):
        out[name] = bool(payload[_FLAG_OFFSET] & _COMPRESSED)
    return out


def test_single_column_compression():
    t = _table()
    chunks = encode_table(t, "s", compression={"text": "zstd"}, bloom_columns=())
    flags = _compression_flags(chunks)
    assert flags["text"] and not flags["lang"] and not flags["n"]
    assert decode_chunk_table(chunks).equals(t)


def test_star_default_with_override():
    t = _table()
    chunks = encode_table(
        t, "s", compression={"text": "zstd", "*": "snappy"}, bloom_columns=()
    )
    flags = _compression_flags(chunks)
    assert flags == {"text": True, "lang": True, "n": True}
    assert decode_chunk_table(chunks).equals(t)


def test_plain_string_still_applies_everywhere():
    t = _table()
    chunks = encode_table(t, "s", compression="zstd", bloom_columns=())
    assert all(_compression_flags(chunks).values())
    assert decode_chunk_table(chunks).equals(t)


def test_encode_job_with_dict_compression(ray_session, tmp_path, sf_dir):
    from parquet_go_ray.pipelines.decode import decode_dataset
    from parquet_go_ray.pipelines.encode import encode_job

    out = str(tmp_path / "store")
    encode_job(
        [f"{sf_dir}/documents.parquet"],
        out,
        rows_per_chunk=256,
        bloom_columns=(),
        compression={"text": "zstd"},
    )
    got = decode_dataset(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = (
        pq.read_table(f"{sf_dir}/documents.parquet")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want[got.columns])
