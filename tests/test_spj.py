"""Storage-partitioned joins over co-bucketed encode stores
(pipelines/spj.py): bucket-mode layout round-trip, zero-shuffle join
correctness vs pandas merge, co-bucketing contract enforcement, string
keys, outer joins, tombstone interaction, and bucket-roundtrip
completeness."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.functions.hashing import bucket_ids
from parquet_go_ray.pipelines.decode import decode_dataset
from parquet_go_ray.pipelines.encode import encode_job
from parquet_go_ray.pipelines.spj import (
    check_cobucketed,
    storage_partitioned_join,
)


def _write(tmp_path, name, table: pa.Table) -> str:
    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(table, p)
    return p


@pytest.fixture()
def pair(tmp_path, ray_session):
    """Two co-bucketed stores: facts (int key, skewed fanout) and dims."""
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 200, size=3000)
    facts = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "v": pa.array(rng.normal(size=3000)),
            "tag": pa.array([f"t{i % 13}" for i in range(3000)]),
        }
    )
    dims = pa.table(
        {
            "dk": pa.array(np.arange(0, 150, dtype=np.int64)),
            "name": pa.array([f"dim-{i}" for i in range(150)]),
        }
    )
    fpath = _write(tmp_path, "facts", facts)
    dpath = _write(tmp_path, "dims", dims)
    fstore, dstore = str(tmp_path / "fstore"), str(tmp_path / "dstore")
    encode_job([fpath], fstore, mode="bucket", bucket_key="k",
               num_buckets=8, rows_per_chunk=256, bloom_columns=())
    encode_job([dpath], dstore, mode="bucket", bucket_key="dk",
               num_buckets=8, rows_per_chunk=256, bloom_columns=())
    return fstore, dstore, facts.to_pandas(), dims.to_pandas()


def test_bucket_mode_roundtrip_complete(pair):
    fstore, _, facts, _ = pair
    got = decode_dataset(fstore).to_pandas()
    a = got.sort_values(["k", "v"]).reset_index(drop=True)
    b = facts.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_buckets_partition_by_key(pair):
    """Every shard holds exactly the keys that hash to its bucket."""
    fstore, _, _, _ = pair
    from parquet_go_ray.pipelines.spj import _bucket_files
    from parquet_go_ray.stages.decode import decode_chunk_table

    for b, files in _bucket_files(fstore).items():
        for f in files:
            t = decode_chunk_table(pq.read_table(f))
            got = bucket_ids(t.column("k"), 8)
            assert (got == b).all()


def test_spj_inner_matches_pandas(pair):
    fstore, dstore, facts, dims = pair
    out = storage_partitioned_join(fstore, dstore, "k", "dk").to_pandas()
    ref = facts.merge(dims, left_on="k", right_on="dk", how="inner")
    assert len(out) == len(ref)
    a = out.sort_values(["k", "v"]).reset_index(drop=True)
    b = ref.sort_values(["k", "v"]).reset_index(drop=True)
    for col in ("k", "v", "tag", "name"):
        assert (a[col].to_numpy() == b[col].to_numpy()).all()


def test_spj_projection(pair):
    fstore, dstore, facts, dims = pair
    out = storage_partitioned_join(
        fstore, dstore, "k", "dk",
        left_columns=["k", "tag"], right_columns=["dk", "name"],
    ).to_pandas()
    assert sorted(out.columns) == ["k", "name", "tag"]
    ref = facts.merge(dims, left_on="k", right_on="dk")
    assert len(out) == len(ref)


def test_spj_left_outer(pair):
    fstore, dstore, facts, dims = pair
    out = storage_partitioned_join(
        fstore, dstore, "k", "dk", how="left outer"
    ).to_pandas()
    ref = facts.merge(dims, left_on="k", right_on="dk", how="left")
    assert len(out) == len(ref)
    # unmatched fact keys (>=150) survive with null name
    assert out[out["k"] >= 150]["name"].isna().all()


def test_spj_rejects_mismatched_buckets(pair, tmp_path, ray_session):
    fstore, _, _, dims = pair
    other = str(tmp_path / "other")
    dpath = str(tmp_path / "dims.parquet")
    encode_job([dpath], other, mode="bucket", bucket_key="dk",
               num_buckets=4, rows_per_chunk=256, bloom_columns=())
    with pytest.raises(ValueError, match="not co-bucketed"):
        check_cobucketed(fstore, other)


def test_spj_rejects_unbucketed_store(pair, tmp_path, ray_session):
    fstore, _, _, _ = pair
    plain = str(tmp_path / "plain")
    encode_job([str(tmp_path / "dims.parquet")], plain,
               rows_per_chunk=256, bloom_columns=())
    with pytest.raises(ValueError, match="not a bucketed store"):
        check_cobucketed(fstore, plain)


def test_spj_rejects_wrong_join_key(pair):
    fstore, dstore, _, _ = pair
    with pytest.raises(ValueError, match="bucket keys"):
        storage_partitioned_join(fstore, dstore, "v", "dk")


def test_spj_string_keys(tmp_path, ray_session):
    a = pa.table({"url": [f"https://h{i % 40}.example/p{i}" for i in range(400)],
                  "score": pa.array(np.arange(400.0))})
    hosts = sorted({u.split("/p")[0] for u in a.column("url").to_pylist()})
    b = pa.table({"url": pa.array([h + "/p0" for h in hosts]),
                  "rank": pa.array(np.arange(len(hosts), dtype=np.int64))})
    ap, bp = _write(tmp_path, "a", a), _write(tmp_path, "b", b)
    astore, bstore = str(tmp_path / "astore"), str(tmp_path / "bstore")
    encode_job([ap], astore, mode="bucket", bucket_key="url",
               num_buckets=8, rows_per_chunk=128, bloom_columns=())
    encode_job([bp], bstore, mode="bucket", bucket_key="url",
               num_buckets=8, rows_per_chunk=128, bloom_columns=())
    out = storage_partitioned_join(astore, bstore, "url", "url").to_pandas()
    ref = a.to_pandas().merge(b.to_pandas(), on="url")
    assert len(out) == len(ref)
    assert set(out["url"]) == set(ref["url"])


def test_spj_applies_tombstones(pair):
    from parquet_go_ray.pipelines.tombstone import delete_where

    fstore, dstore, facts, dims = pair
    delete_where(fstore, "k", [0, 1, 2, 3, 4])
    out = storage_partitioned_join(fstore, dstore, "k", "dk").to_pandas()
    ref = facts[facts["k"] >= 5].merge(dims, left_on="k", right_on="dk")
    assert len(out) == len(ref)
    assert out["k"].min() >= 5


def test_spj_groupby_matches_pandas(pair):
    from parquet_go_ray.pipelines.spj import storage_partitioned_groupby

    fstore, _, facts, _ = pair
    got = (
        storage_partitioned_groupby(fstore, [("v", "count"), ("v", "sum")])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = (
        facts.groupby("k")["v"]
        .agg(["count", "sum"])
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (got["k"].to_numpy() == ref["k"].to_numpy()).all()
    assert (got["v_count"].to_numpy() == ref["count"].to_numpy()).all()
    assert np.allclose(got["v_sum"].to_numpy(), ref["sum"].to_numpy())


def test_spj_groupby_respects_tombstones(pair):
    from parquet_go_ray.pipelines.spj import storage_partitioned_groupby
    from parquet_go_ray.pipelines.tombstone import delete_where

    fstore, _, facts, _ = pair
    delete_where(fstore, "k", [7])
    got = storage_partitioned_groupby(fstore, [("v", "count")]).to_pandas()
    assert 7 not in set(got["k"])
    live = facts[facts["k"] != 7]
    assert got["v_count"].sum() == len(live)


def test_spj_groupby_groups_are_complete(pair):
    """No key may appear twice in the output (the zero-shuffle claim:
    each key's rows are entirely within one bucket task)."""
    from parquet_go_ray.pipelines.spj import storage_partitioned_groupby

    fstore, _, _, _ = pair
    got = storage_partitioned_groupby(fstore, [("v", "count")]).to_pandas()
    assert not got["k"].duplicated().any()
