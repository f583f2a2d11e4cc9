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
