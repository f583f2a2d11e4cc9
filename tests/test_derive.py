"""Derived-column families (pipelines/derive.py): backfill a column
onto an existing store without rewriting it, zip-read base + family,
projection, resume, base immutability, stale-family detection."""

import hashlib
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.pipelines.derive import (
    add_derived_column,
    decode_with_family,
    list_families,
)
from parquet_go_ray.pipelines.encode import encode_job


# nested closures: cloudpickle serializes these by VALUE (a test-module
# top-level function would be pickled by reference and fail on workers)
def _double():
    def f(t: pa.Table) -> pa.Array:
        return pc.multiply(
            t.column("n_chars").combine_chunks(), pa.scalar(2, pa.int64())
        )

    return f


def _srclen():
    def f(t: pa.Table) -> pa.Array:
        return pc.utf8_length(t.column("source").combine_chunks()).cast(
            pa.int64()
        )

    return f


@pytest.fixture()
def store(tmp_path, ray_session):
    rng = np.random.default_rng(9)
    paths = []
    tables = []
    for i in range(3):
        n = 400
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(i * n, (i + 1) * n, dtype=np.int64)
                ),
                "source": pa.array(
                    [f"host{int(x)}.example" for x in rng.integers(0, 9, n)]
                ),
                "n_chars": pa.array(rng.integers(1, 999, n), pa.int64()),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
        tables.append(t)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=128, bloom_columns=())
    return out, pa.concat_tables(tables).to_pandas()


def _data_digest(store_dir):
    h = hashlib.sha256()
    for p in sorted(Path(store_dir, "data").rglob("*.parquet")):
        h.update(p.read_bytes())
    return h.hexdigest()


def test_derive_and_zip_read(store):
    out, df = store
    before = _data_digest(out)
    info = add_derived_column(out, "dbl", "n2", _double(), ["n_chars"])
    assert info["rows"] == len(df) and info["shards"] == 3
    # the base store's bytes are untouched — derive is O(new column)
    assert _data_digest(out) == before
    assert list_families(out) == {"dbl": ["n2"]}
    got = (
        decode_with_family(out)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n2"].tolist() == (df["n_chars"] * 2).tolist()
    assert got["n_chars"].tolist() == df["n_chars"].tolist()


def test_derive_projection_and_resume(store):
    out, df = store
    add_derived_column(out, "dbl", "n2", _double(), ["n_chars"])
    again = add_derived_column(out, "dbl", "n2", _double(), ["n_chars"])
    assert again["shards"] == 0 and again["skipped"] == 3
    got = (
        decode_with_family(out, columns=["doc_id", "n2"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(got.columns) == ["doc_id", "n2"]
    assert got["n2"].tolist() == (df["n_chars"] * 2).tolist()


def test_two_families_zip(store):
    out, df = store
    add_derived_column(out, "dbl", "n2", _double(), ["n_chars"])
    add_derived_column(out, "slen", "src_len", _srclen(), ["source"])
    got = (
        decode_with_family(out, columns=["doc_id", "n2", "src_len"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n2"].tolist() == (df["n_chars"] * 2).tolist()
    assert got["src_len"].tolist() == df["source"].str.len().tolist()


def _pair():
    def f(t: pa.Table) -> pa.Table:
        n = t.column("n_chars").combine_chunks()
        return pa.table(
            {
                "n2": pc.multiply(n, pa.scalar(2, pa.int64())),
                "n_bucket": pc.divide(n, pa.scalar(100, pa.int64())),
            }
        )

    return f


def test_multi_column_family(store):
    """One decode pass backfills several derived columns; projection,
    range scan on a named column, and aggregate pushdown all see them."""
    from parquet_go_ray.pipelines.agg import aggregate_meta
    from parquet_go_ray.pipelines.derive import (
        add_derived_columns,
        family_dir,
        search_family_range,
    )

    out, df = store
    add_derived_columns(out, "pair", ["n2", "n_bucket"], _pair(), ["n_chars"])
    assert list_families(out)["pair"] == ["n2", "n_bucket"]
    got = (
        decode_with_family(out, columns=["doc_id", "n2", "n_bucket"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n2"].tolist() == (df["n_chars"] * 2).tolist()
    assert got["n_bucket"].tolist() == (df["n_chars"] // 100).tolist()
    # range scan must name the column on a multi-column family
    with pytest.raises(ValueError, match="pass column="):
        search_family_range(out, "pair", lo=0)
    hit = search_family_range(
        out, "pair", lo=5, hi=5, column="n_bucket", columns=["doc_id"]
    ).to_pandas()
    assert sorted(hit["doc_id"]) == sorted(
        df[df["n_chars"] // 100 == 5]["doc_id"]
    )
    got_meta = aggregate_meta(family_dir(out, "pair"), "n_bucket").to_pylist()[0]
    assert got_meta["n_rows"] == len(df)
    assert got_meta["vmax"] == int((df["n_chars"] // 100).max())


def test_stale_family_fails_loudly(store):
    out, _ = store
    add_derived_column(out, "dbl", "n2", _double(), ["n_chars"])
    victim = sorted(Path(out, "families", "dbl", "data").rglob("*.parquet"))[0]
    os.unlink(victim)
    with pytest.raises(Exception, match="rewritten|sibling"):
        decode_with_family(out, families=["dbl"]).to_pandas()


def test_unknown_family_rejected(store):
    out, _ = store
    with pytest.raises(FileNotFoundError):
        decode_with_family(out, families=["nope"])


def test_family_range_scan_matches_pandas(store):
    from parquet_go_ray.pipelines.derive import search_family_range

    out, df = store
    add_derived_column(out, "dbl", "n2", _double(), ["n_chars"])
    got = (
        search_family_range(
            out, "dbl", lo=200, hi=900, columns=["doc_id", "n2", "n_chars"]
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = df[(df["n_chars"] * 2).between(200, 900)].reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n2"].tolist() == (want["n_chars"] * 2).tolist()


def _ident():
    def f(t: pa.Table) -> pa.Array:
        return t.column("doc_id").combine_chunks()

    return f


def test_family_range_prunes_base_reads(tmp_path, ray_session):
    """Family stats must prune the BASE reads too: derive d = doc_id
    (monotone across shards), query a range inside shard 1 only, and
    chmod-000 shards 0 and 2 in BOTH trees."""
    import stat as statmod

    from parquet_go_ray.pipelines.derive import search_family_range

    paths = []
    for i in range(3):
        n = 200
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(i * n, (i + 1) * n, dtype=np.int64)
                ),
                "n_chars": pa.array(np.full(n, 7), pa.int64()),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=64, bloom_columns=())
    add_derived_column(out, "ident", "d", _ident(), ["doc_id"])
    blocked = [
        str(Path(out, "data", f"part{i}")) for i in (0, 2)
    ] + [
        str(Path(out, "families", "ident", "data", f"part{i}"))
        for i in (0, 2)
    ]
    for d in blocked:
        os.chmod(d, 0)
    try:
        got = (
            search_family_range(out, "ident", lo=250, hi=349)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert got["doc_id"].tolist() == list(range(250, 350))
        assert got["d"].tolist() == list(range(250, 350))
    finally:
        for d in blocked:
            os.chmod(d, statmod.S_IRWXU)


def test_family_refresh_after_upsert(store, tmp_path):
    """After an upsert rewrites/adds base shards, re-running
    add_derived_column (resume=True) backfills EXACTLY the shards whose
    family sibling is missing — an incremental refresh, not a rebuild —
    and the zip read is consistent again."""
    from parquet_go_ray.pipelines.derive import search_family_range
    from parquet_go_ray.pipelines.tombstone import upsert_files

    out, df = store
    add_derived_column(out, "dbl", "n2", _double(), ["n_chars"])
    # upsert: replace doc_ids 0..49 with n_chars += 10000, add 5 new
    upd = df[df["doc_id"] < 50].copy()
    upd["n_chars"] += 10000
    new = df[df["doc_id"] < 5].copy()
    new["doc_id"] += 100000
    inc = pd.concat([upd, new], ignore_index=True)
    p = str(tmp_path / "inc-upsert.parquet")
    pq.write_table(pa.Table.from_pandas(inc, preserve_index=False), p)
    upsert_files(out, [p], key_col="doc_id", rows_per_chunk=128)
    # family is now stale for the rewritten shards -> read fails loudly
    with pytest.raises(Exception, match="rewritten|sibling"):
        decode_with_family(out, families=["dbl"]).to_pandas()
    info = add_derived_column(out, "dbl", "n2", _double(), ["n_chars"])
    assert info["shards"] > 0 and info["skipped"] > 0  # incremental
    got = (
        decode_with_family(out, columns=["doc_id", "n2"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = pd.concat(
        [df[df["doc_id"] >= 50], inc], ignore_index=True
    ).sort_values("doc_id", ignore_index=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n2"].tolist() == (want["n_chars"] * 2).tolist()
    # the derived column's family stats see the upserted range too
    got_hi = search_family_range(out, "dbl", lo=20000).to_pandas()
    assert len(got_hi) == 50


def test_family_composes_with_aggregate_pushdown(store):
    """A family is a full store in its own right: metadata-only
    aggregates answer from the FAMILY manifest without opening any
    chunk file (base or family)."""
    import stat as statmod

    from parquet_go_ray.pipelines.agg import aggregate_meta
    from parquet_go_ray.pipelines.derive import family_dir

    out, df = store
    add_derived_column(out, "dbl", "n2", _double(), ["n_chars"])
    fam = family_dir(out, "dbl")
    blocked = [os.path.join(out, "data"), os.path.join(fam, "data")]
    for d in blocked:
        os.chmod(d, 0)
    try:
        got = aggregate_meta(fam, "n2").to_pylist()[0]
        assert got["n_rows"] == len(df)
        assert got["vmin"] == int(df["n_chars"].min()) * 2
        assert got["vmax"] == int(df["n_chars"].max()) * 2
        assert got["vsum"] == int(df["n_chars"].sum()) * 2
    finally:
        for d in blocked:
            os.chmod(d, statmod.S_IRWXU)
