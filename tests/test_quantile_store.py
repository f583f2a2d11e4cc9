"""decode.quantile_store: exact continuous quantiles answered from the
encode store with stats pruning. Clustered store: chunks guaranteed
entirely below/above the bracketing ranks never open (chmod-000 proof).
Unclustered store: degrades to decoding overlapping chunks, still
exact. Tombstones: pruning disables, deletes filter before selection."""

import os
import stat

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.pipelines.decode import quantile_store
from parquet_go_ray.pipelines.encode import encode_job


def _median(vals):
    v = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(v)
    pos = (n - 1) * 0.5
    lo, hi = int(np.floor(pos)), int(np.ceil(pos))
    return float(v[lo] + (pos - np.floor(pos)) * (v[hi] - v[lo]))


def test_quantile_clustered_prunes_to_middle_shard(tmp_path, ray_session):
    """750 strictly increasing values over 3 sorted shards: the median's
    bracketing ranks live wholly in the middle shard, so the outer two
    chmod-000 and never open."""
    vals = np.arange(750, dtype=np.int64)
    paths = []
    for i in range(3):
        sl = vals[i * 250 : (i + 1) * 250]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(i * 250, (i + 1) * 250, dtype=np.int64)),
                "v": pa.array(sl, pa.int64()),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=64, bloom_columns=())
    blocked = [os.path.join(out, "data", f"part{i}") for i in (0, 2)]
    for d in blocked:
        os.chmod(d, 0)
    try:
        got = quantile_store(out, "v", 0.5, out_name="med").to_pandas()
    finally:
        for d in blocked:
            os.chmod(d, stat.S_IRWXU)
    assert got["med"].iloc[0] == _median(vals) == 374.5


@pytest.mark.parametrize("q", [0.0, 0.1, 0.5, 0.9, 1.0])
def test_quantile_unclustered_matches_numpy(tmp_path, ray_session, q):
    rng = np.random.default_rng(11)
    v = rng.integers(0, 10_000, 1201)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(1201, dtype=np.int64)),
            "v": pa.array(v, pa.int64()),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=128, bloom_columns=())
    got = quantile_store(out, "v", q).to_pandas().iloc[0, 0]
    want = float(np.quantile(v.astype(np.float64), q, method="linear"))
    assert got == pytest.approx(want, abs=1e-9)


def test_quantile_with_nulls_and_single_value(tmp_path, ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(6, dtype=np.int64)),
            "v": pa.array([None, 7, None, None, None, None], pa.int64()),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=4, bloom_columns=())
    got = quantile_store(out, "v", 0.5).to_pandas().iloc[0, 0]
    assert got == 7.0


def test_quantile_after_delete_filters_first(tmp_path, ray_session):
    """Tombstoned rows must not count: deleting the top half moves the
    median to the live rows' middle (pruning disabled under tombstones)."""
    from parquet_go_ray.pipelines.tombstone import delete_where

    v = np.arange(100, dtype=np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "v": pa.array(v, pa.int64()),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=16, bloom_columns=())
    delete_where(out, "doc_id", list(range(50, 100)))
    got = quantile_store(out, "v", 0.5).to_pandas().iloc[0, 0]
    assert got == _median(v[:50]) == 24.5


# ---------------------------------------------------------------------------
# agg.histogram_store: exact fixed-width histogram with zone-map pruning


def test_histogram_clustered_interior_never_opens(tmp_path, ray_session):
    """900 increasing values over 3 shards, width 300 == one shard's
    range: every chunk is interior to one bucket, so ALL shards can be
    chmod-000 after the manifest is written — the histogram answers
    from stats alone."""
    from parquet_go_ray.pipelines.agg import histogram_store

    vals = np.arange(900, dtype=np.int64)
    paths = []
    for i in range(3):
        sl = vals[i * 300 : (i + 1) * 300]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(i * 300, (i + 1) * 300, dtype=np.int64)),
                "v": pa.array(sl, pa.int64()),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=100, bloom_columns=())
    blocked = [os.path.join(out, "data", f"part{i}") for i in range(3)]
    for d in blocked:
        os.chmod(d, 0)
    try:
        got = histogram_store(out, "v", 300).to_pandas()
    finally:
        for d in blocked:
            os.chmod(d, stat.S_IRWXU)
    assert got["bucket"].tolist() == [0, 1, 2]
    assert got["n"].tolist() == [300, 300, 300]


def test_histogram_unclustered_matches_pandas(tmp_path, ray_session):
    from parquet_go_ray.pipelines.agg import histogram_store

    rng = np.random.default_rng(7)
    v = rng.integers(-500, 2500, 1300)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(1300, dtype=np.int64)),
            "v": pa.array(v, pa.int64()),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=128, bloom_columns=())
    got = histogram_store(out, "v", 250).to_pandas()
    import pandas as pd

    want = (
        pd.Series(np.floor_divide(v, 250))
        .value_counts()
        .sort_index()
    )
    assert got["bucket"].tolist() == want.index.tolist()
    assert got["n"].tolist() == want.tolist()


def test_histogram_tombstones_filter_first(tmp_path, ray_session):
    from parquet_go_ray.pipelines.agg import histogram_store
    from parquet_go_ray.pipelines.tombstone import delete_where

    v = np.arange(100, dtype=np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "v": pa.array(v, pa.int64()),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=16, bloom_columns=())
    delete_where(out, "doc_id", list(range(0, 30)))
    got = histogram_store(out, "v", 50).to_pandas()
    assert got["bucket"].tolist() == [0, 1]
    assert got["n"].tolist() == [20, 50]


def test_quantile_and_histogram_survive_compaction(tmp_path, ray_session):
    """Compaction rewrites shards and manifests; the stats-pruned
    aggregates must answer identically before and after (they read
    through the manifest lineage, never a stale file list)."""
    from parquet_go_ray.pipelines.agg import histogram_store
    from parquet_go_ray.pipelines.compact import compact_store

    rng = np.random.default_rng(13)
    v = rng.integers(0, 5000, 900)
    paths = []
    for i in range(6):
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(i * 150, (i + 1) * 150, dtype=np.int64)),
                "v": pa.array(v[i * 150 : (i + 1) * 150], pa.int64()),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=64, bloom_columns=())
    before_q = quantile_store(out, "v", 0.5).to_pandas().iloc[0, 0]
    before_h = histogram_store(out, "v", 500).to_pandas()
    res = compact_store(out, target_bytes=1 << 20)
    assert res["groups"] >= 1
    after_q = quantile_store(out, "v", 0.5).to_pandas().iloc[0, 0]
    after_h = histogram_store(out, "v", 500).to_pandas()
    assert after_q == before_q == _median(v)
    assert after_h["bucket"].tolist() == before_h["bucket"].tolist()
    assert after_h["n"].tolist() == before_h["n"].tolist()
