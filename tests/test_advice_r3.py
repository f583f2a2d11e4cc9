"""Regression tests for the round-2 ADVICE findings:

1. chunk header embeds FORMAT_VERSION; mismatched stores are rejected
2. wire writer derives OPTIONAL from schema nullability (consistent
   multi-shard schemas)
3. verify._column_hash keeps full precision on nullable 64-bit ints
4. merge_sorted_iter handles null merge keys deterministically
5. export job reconciles stale differently-named split files on rerun
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------- 1. version


def test_chunk_header_carries_format_version():
    from parquet_go_ray.codecs import chunk, registry

    blob = chunk.encode_array(pa.array([1, 2, 3], type=pa.int64()))
    assert blob[:2] == b"RC"
    assert blob[2] == registry.FORMAT_VERSION
    # tamper the version byte (and fix the CRC so only the version check
    # can fire): decode must refuse with a version message
    import struct
    import zlib

    tampered = bytearray(blob)
    tampered[2] = registry.FORMAT_VERSION + 1
    body = bytes(tampered[:-4])
    tampered[-4:] = struct.pack("<I", zlib.crc32(body))
    with pytest.raises(chunk.ChunkError, match="format version"):
        chunk.decode_array(bytes(tampered))


def test_store_format_version_checked(tmp_path):
    from parquet_go_ray.codecs.registry import FORMAT_VERSION
    from parquet_go_ray.state import manifest

    out = str(tmp_path / "store")
    manifest.write_job_meta(out, {"format_version": FORMAT_VERSION})
    manifest.check_format_version(out, "resume into")  # same version: fine
    manifest.write_job_meta(out, {"format_version": FORMAT_VERSION - 1})
    with pytest.raises(ValueError, match="format version"):
        manifest.check_format_version(out, "resume into")
    # legacy store with no recorded version: tolerated (chunk header
    # magic still rejects per-chunk)
    manifest.write_job_meta(out, {"mode": "direct"})
    manifest.check_format_version(out, "resume into")


def test_encode_job_refuses_mismatched_resume(ray_session, tmp_path, sf_dir):
    from parquet_go_ray.codecs.registry import FORMAT_VERSION
    from parquet_go_ray.pipelines.encode import encode_job
    from parquet_go_ray.state import manifest

    out = str(tmp_path / "store")
    manifest.write_job_meta(out, {"format_version": FORMAT_VERSION - 2})
    with pytest.raises(ValueError, match="format version"):
        encode_job([f"{sf_dir}/documents.parquet"], out, resume=True)


# ------------------------------------------------------- 2. wire optionality


def test_wire_optional_follows_schema_nullability(tmp_path):
    from parquet_go_ray.codecs.parquet_wire import write_table

    # same logical column; one shard has nulls, the other does not —
    # both must come out OPTIONAL because the field is nullable
    schema = pa.schema([pa.field("v", pa.int64(), nullable=True)])
    t_nulls = pa.table({"v": pa.array([1, None, 3], type=pa.int64())}, schema=schema)
    t_clean = pa.table({"v": pa.array([4, 5, 6], type=pa.int64())}, schema=schema)
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    write_table(t_nulls, p1)
    write_table(t_clean, p2)
    s1 = pq.read_schema(p1)
    s2 = pq.read_schema(p2)
    assert s1.field("v").nullable and s2.field("v").nullable
    ds = pq.ParquetDataset([p1, p2])  # strict readers see ONE schema
    assert ds.read().num_rows == 6

    # a genuinely non-nullable field still writes REQUIRED
    req = pa.schema([pa.field("v", pa.int64(), nullable=False)])
    t_req = pa.table({"v": pa.array([7, 8], type=pa.int64())}, schema=req)
    p3 = str(tmp_path / "c.parquet")
    write_table(t_req, p3)
    assert not pq.read_schema(p3).field("v").nullable


# ----------------------------------------------------- 3. nullable i64 hash


def test_column_hash_nullable_int64_precision():
    from parquet_go_ray.pipelines.verify import _column_hash

    # values differ only below float64's 2^53 mantissa at this magnitude:
    # the old float64 round-trip hashed them equal
    a = pa.array([2**60 + 1, None], type=pa.int64())
    b = pa.array([2**60 + 3, None], type=pa.int64())
    ha, hb = _column_hash(a), _column_hash(b)
    assert ha[0] != hb[0]
    assert ha[1] == hb[1]  # null slots hash to the sentinel on both

    # uint64 beyond int64 range survives too
    c = pa.array([2**63 + 5, None], type=pa.uint64())
    d = pa.array([2**63 + 6, None], type=pa.uint64())
    assert _column_hash(c)[0] != _column_hash(d)[0]


def test_checksum_distinguishes_large_nullable_ints(ray_session):
    import ray.data

    from parquet_go_ray.pipelines.verify import dataset_checksum

    t1 = pa.table({"v": pa.array([2**60 + 1, None, 7], type=pa.int64())})
    t2 = pa.table({"v": pa.array([2**60 + 2, None, 7], type=pa.int64())})
    r1 = dataset_checksum(ray.data.from_arrow(t1))
    r2 = dataset_checksum(ray.data.from_arrow(t2))
    assert r1[0] == r2[0] == 3
    assert r1[1] != r2[1]


# ----------------------------------------------------- 4. null merge keys


def test_merge_sorted_iter_null_keys(ray_session):
    import ray.data

    from parquet_go_ray.pipelines.relational import merge_sorted_iter

    # nulls last, like the inputs' own sort order
    s1 = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 3, None], type=pa.int64()), "s": ["a", "a", "a"]})
    )
    s2 = ray.data.from_arrow(
        pa.table({"k": pa.array([2, None], type=pa.int64()), "s": ["b", "b"]})
    )
    out = pa.concat_tables(list(merge_sorted_iter([s1, s2], ["k"])))
    ks = out.column("k").to_pylist()
    assert ks == [1, 2, 3, None, None]
    assert out.num_rows == 5


# ------------------------------------------------- 5. export reconciliation


def test_export_reconciles_stale_split_files(ray_session, tmp_path, sf_dir):
    from parquet_go_ray.pipelines.export import export_parquet_job

    out = str(tmp_path / "wire")
    src = f"{sf_dir}/documents.parquet"
    r1 = export_parquet_job([src], out)
    assert r1["files"] == 1
    # plant a stale file as if a prior run had split blocks differently
    stale = tmp_path / "wire" / "documents-deadbeef.parquet"
    pq.write_table(pa.table({"doc_id": pa.array([999], type=pa.int64())}), stale)
    r2 = export_parquet_job([src], out, resume=True)
    assert r2["files_skipped"] == 1
    assert r2["files_stale_removed"] == 1
    assert not stale.exists()
    # output rows match the source exactly (no duplication)
    got = pq.ParquetDataset(out).read()
    assert got.num_rows == pq.read_metadata(src).num_rows
