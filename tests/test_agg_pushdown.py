"""Aggregate pushdown over the encode store (pipelines/agg.py):
metadata-only aggregates from manifest stats, encoded-domain group
counts from dictionary codes, codec-choice independence, null groups,
and the tombstone fallback."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.codecs import chunk as chunk_mod
from parquet_go_ray.codecs import registry as R
from parquet_go_ray.pipelines.agg import aggregate_meta, group_count_store
from parquet_go_ray.pipelines.encode import encode_job


@pytest.fixture()
def store(tmp_path, ray_session):
    rng = np.random.default_rng(3)
    langs = rng.choice(["en", "de", "fr", None], size=2000, p=[0.5, 0.25, 0.2, 0.05])
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(2000, dtype=np.int64)),
            "lang": pa.array([l if l is not None else None for l in langs]),
            "n_chars": pa.array(rng.integers(10, 999, size=2000), pa.int64()),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=256, bloom_columns=())
    return out, t.to_pandas()


def test_aggregate_meta_matches(store):
    out, df = store
    got = aggregate_meta(out, "n_chars").to_pylist()[0]
    assert got["n_rows"] == len(df)
    assert got["n_nulls"] == int(df["n_chars"].isna().sum())
    assert got["vmin"] == int(df["n_chars"].min())
    assert got["vmax"] == int(df["n_chars"].max())


def test_aggregate_meta_never_opens_chunks(store):
    """The metadata path must not read a single chunk file: chmod-000
    the whole data directory (workers included) — the manifest-only
    fold must still answer."""
    import os
    import stat

    out, _ = store
    data = os.path.join(out, "data")
    os.chmod(data, 0)
    try:
        got = aggregate_meta(out, "n_chars").to_pylist()[0]
        assert got["n_rows"] == 2000
    finally:
        os.chmod(data, stat.S_IRWXU)


def test_group_count_matches_pandas_with_nulls(store):
    out, df = store
    got = (
        group_count_store(out, "lang")
        .to_pandas()
        .sort_values("value", na_position="last")
        .reset_index(drop=True)
    )
    ref = df["lang"].value_counts(dropna=False)
    for _, row in got.iterrows():
        key = row["value"]
        if pd.isna(key):
            assert row["n"] == int(df["lang"].isna().sum())
        else:
            assert row["n"] == int(ref[key])
    assert got["n"].sum() == len(df)


def test_group_count_codec_independent(tmp_path, ray_session, store):
    """Forcing plain/FSST (no encoded domain) must give identical counts
    via the decode fallback."""
    out, df = store
    p = str(tmp_path / "docs.parquet")
    out2 = str(tmp_path / "store_plain")
    encode_job(
        [p], out2, rows_per_chunk=256, bloom_columns=(),
        codec_overrides={"lang": "plain"},
    )
    a = group_count_store(out, "lang").to_pandas()
    b = group_count_store(out2, "lang").to_pandas()
    ka = {(None if pd.isna(r["value"]) else r["value"]): r["n"] for _, r in a.iterrows()}
    kb = {(None if pd.isna(r["value"]) else r["value"]): r["n"] for _, r in b.iterrows()}
    assert ka == kb


def test_group_count_int_column(store):
    out, df = store
    got = group_count_store(out, "n_chars").to_pandas()
    ref = df["n_chars"].value_counts()
    assert len(got) == df["n_chars"].nunique()
    sample = got.head(20)
    for _, row in sample.iterrows():
        assert row["n"] == int(ref[row["value"]])


def test_tombstones_respected(store):
    from parquet_go_ray.pipelines.tombstone import delete_where

    out, df = store
    delete_where(out, "doc_id", list(range(0, 2000, 2)))
    live = df[df["doc_id"] % 2 == 1]
    got = aggregate_meta(out, "n_chars").to_pylist()[0]
    assert got["n_rows"] == len(live)
    assert got["vmin"] == int(live["n_chars"].min())
    gc = group_count_store(out, "lang").to_pandas()
    assert gc["n"].sum() == len(live)
    en = gc[gc["value"] == "en"]["n"].iloc[0]
    assert en == int((live["lang"] == "en").sum())


def test_shared_dict_counts(tmp_path, ray_session):
    """A multi-chunk-group file uses file-level shared dict pages; the
    encoded-domain counts must resolve codes against the dict page and
    drop values absent from a given chunk."""
    t = pa.table(
        {
            "k": pa.array(
                ["a"] * 600 + ["b"] * 600 + ["c"] * 600
            ),
            "x": pa.array(np.arange(1800, dtype=np.int64)),
        }
    )
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "s")
    encode_job([p], out, rows_per_chunk=512, bloom_columns=(),
               codec_overrides={"k": "dict"})
    got = group_count_store(out, "k").to_pandas().set_index("value")["n"]
    assert got.to_dict() == {"a": 600, "b": 600, "c": 600}


def test_distinct_matches_pandas_with_nulls(store):
    from parquet_go_ray.pipelines.agg import distinct_store

    out, df = store
    got = distinct_store(out, "lang").to_pandas()["value"]
    want = set(df["lang"].dropna().unique())
    got_nonnull = set(got.dropna())
    assert got_nonnull == want
    assert got.isna().sum() == (1 if df["lang"].isna().any() else 0)


def test_distinct_codec_independent(tmp_path, ray_session, store):
    from parquet_go_ray.pipelines.agg import distinct_store

    out, df = store
    p = str(tmp_path / "docs.parquet")
    out2 = str(tmp_path / "store_plain2")
    encode_job(
        [p], out2, rows_per_chunk=256, bloom_columns=(),
        codec_overrides={"lang": "plain"},
    )
    a = set(distinct_store(out, "lang").to_pandas()["value"].dropna())
    b = set(distinct_store(out2, "lang").to_pandas()["value"].dropna())
    assert a == b


def test_distinct_kernel_skips_index_stream(monkeypatch):
    """dict_domain_values must parse only the dictionary — the index
    stream decoder must never run (in-process kernel check)."""
    import parquet_go_ray.codecs.rle as rle_mod

    arr = pa.array(["x", "y", "x", "z", None])
    blob = chunk_mod.encode_array(arr, R.CODEC_IDS["dict"])

    def boom(*a, **k):
        raise AssertionError("index stream decoded on the values-only path")

    monkeypatch.setattr(rle_mod, "decode", boom)
    v, nn = chunk_mod.dict_domain_values(blob)
    assert set(v.to_pylist()) == {"x", "y", "z"} and nn == 1


def test_distinct_respects_tombstones(store):
    from parquet_go_ray.pipelines.agg import distinct_store
    from parquet_go_ray.pipelines.tombstone import delete_where

    out, df = store
    keep_ids = df[df["lang"] == "fr"]["doc_id"]
    # delete every non-fr doc: distinct must shrink to {fr}
    dead = df[df["lang"] != "fr"]["doc_id"].tolist()
    dead += df[df["lang"].isna()]["doc_id"].tolist()
    delete_where(out, "doc_id", dead)
    got = set(distinct_store(out, "lang").to_pandas()["value"].dropna())
    assert got == {"fr"}


def test_sum_pushdown_exact(store):
    """SUM/AVG from manifest sums alone — no chunk opens (chmod probe)."""
    import os
    import stat

    out, df = store
    data = os.path.join(out, "data")
    os.chmod(data, 0)
    try:
        got = aggregate_meta(out, "n_chars").to_pylist()[0]
        assert got["vsum"] == int(df["n_chars"].sum())
    finally:
        os.chmod(data, stat.S_IRWXU)


def test_sum_pushdown_tombstone_fallback(store):
    from parquet_go_ray.pipelines.tombstone import delete_where

    out, df = store
    delete_where(out, "doc_id", list(range(0, 2000, 3)))
    live = df[df["doc_id"] % 3 != 0]
    got = aggregate_meta(out, "n_chars").to_pylist()[0]
    assert got["vsum"] == int(live["n_chars"].sum())
    assert got["n_rows"] == len(live)


def test_sum_null_for_string_columns(store):
    out, _ = store
    got = aggregate_meta(out, "lang").to_pylist()[0]
    assert got["vsum"] is None


def test_aggregate_range_matches_pandas(store):
    from parquet_go_ray.pipelines.agg import aggregate_range

    out, df = store
    got = aggregate_range(out, "n_chars", "doc_id", 200, 1800).to_pylist()[0]
    live = df[(df["doc_id"] >= 200) & (df["doc_id"] <= 1800)]
    assert got["n_rows"] == len(live)
    assert got["vsum"] == int(live["n_chars"].sum())


def test_aggregate_range_open_bounds(store):
    from parquet_go_ray.pipelines.agg import aggregate_range

    out, df = store
    got = aggregate_range(out, "n_chars", "doc_id", None, 99).to_pylist()[0]
    live = df[df["doc_id"] <= 99]
    assert got["n_rows"] == len(live)
    assert got["vsum"] == int(live["n_chars"].sum())
    got_all = aggregate_range(out, "n_chars", "doc_id").to_pylist()[0]
    assert got_all["n_rows"] == len(df)
    assert got_all["vsum"] == int(df["n_chars"].sum())


def test_aggregate_range_boundary_only_decodes(store, monkeypatch):
    """Interior chunks must come from stats: lock the data dir except we
    can't partially lock files — instead assert the boundary set is
    small (the store is doc_id-ordered, 256-row chunks) by checking the
    count still matches when the range aligns mid-chunk."""
    from parquet_go_ray.pipelines.agg import aggregate_range

    out, df = store
    # range strictly inside [300, 1700]: interior has ~5 chunks, 2 boundary
    got = aggregate_range(out, "n_chars", "doc_id", 300, 1700).to_pylist()[0]
    live = df[(df["doc_id"] >= 300) & (df["doc_id"] <= 1700)]
    assert got["n_rows"] == len(live) == 1401
    assert got["vsum"] == int(live["n_chars"].sum())


def test_aggregate_range_tombstone_fallback(store):
    from parquet_go_ray.pipelines.agg import aggregate_range
    from parquet_go_ray.pipelines.tombstone import delete_where

    out, df = store
    delete_where(out, "doc_id", list(range(0, 2000, 4)))
    live = df[(df["doc_id"] % 4 != 0) & (df["doc_id"] >= 100) & (df["doc_id"] <= 900)]
    got = aggregate_range(out, "n_chars", "doc_id", 100, 900).to_pylist()[0]
    assert got["n_rows"] == len(live)
    assert got["vsum"] == int(live["n_chars"].sum())
