"""Tombstone route-independence (ADVICE r4 #1): the same logical
query must exclude deleted rows on EVERY access path the query router
can pick — dictionary-domain membership, pattern search, IS NULL
stats, stats-pruned range, stats-pruned top-k (filtered BEFORE the
k-truncation), scattered positional take, the distributed pruned
decode, and the derived-family routes — including projections that
exclude the tombstoned column."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.pipelines import tombstone
from parquet_go_ray.pipelines.decode import (
    decode_dataset_pruned_distributed,
    isnull_scan,
    search_dict_domain,
    search_pattern,
    take_rows,
    topk_store,
)
from parquet_go_ray.pipelines.derive import add_derived_column
from parquet_go_ray.pipelines.encode import encode_job
from parquet_go_ray.pipelines.query import scan


def _dbl():
    def f(t: pa.Table) -> pa.Array:
        return pc.multiply(
            t.column("n_chars").combine_chunks(), pa.scalar(2, pa.int64())
        )

    return f


N = 300
DEAD = [3, 77, 150, 298]


@pytest.fixture()
def store(tmp_path, ray_session):
    rng = np.random.default_rng(5)
    n_chars = rng.permutation(np.arange(100, 100 + N)).astype(np.int64)
    val = rng.normal(size=N)
    null_at = np.zeros(N, dtype=bool)
    null_at[rng.choice(N, 40, replace=False)] = True
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(N, dtype=np.int64)),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(N)]),
            "n_chars": pa.array(n_chars),
            "val": pa.array(
                [None if m else float(v) for v, m in zip(val, null_at)]
            ),
            "text": pa.array([f"doc-{i:04d} body" for i in range(N)]),
        }
    )
    src = tmp_path / "in.parquet"
    pq.write_table(t, src)
    out = str(tmp_path / "store")
    encode_job([str(src)], out, rows_per_chunk=64, bloom_columns=("doc_id",))
    add_derived_column(out, "dbl", "n2", _dbl(), input_columns=["n_chars"])
    tombstone.delete_where(out, "doc_id", DEAD)
    return out, t.to_pandas()


def _alive(df: pd.DataFrame) -> pd.DataFrame:
    return df[~df["doc_id"].isin(DEAD)]


def test_dict_domain_route(store):
    out, df = store
    got = scan(out, "lang", ("==", "en")).to_pandas()
    want = _alive(df[df["lang"] == "en"]) 
    assert set(got["doc_id"]) == set(want["doc_id"])
    # projection excluding the tombstoned column still filters + drops
    got2 = search_dict_domain(out, "lang", ["en"], columns=["lang", "text"])
    got2 = got2.to_pandas()
    assert sorted(got2.columns) == ["lang", "text"]
    assert len(got2) == len(want)


def test_pattern_route(store):
    out, df = store
    got = scan(out, "text", ("prefix", "doc-00")).to_pandas()
    want = _alive(df[df["text"].str.startswith("doc-00")])
    assert set(got["doc_id"]) == set(want["doc_id"])
    got2 = search_pattern(
        out, "text", "contains", "doc-0077", columns=["text"]
    ).to_pandas()
    assert len(got2) == 0  # doc 77 is deleted; its text must not match


def test_isnull_route(store):
    out, df = store
    got = scan(out, "val", ("is_null",)).to_pandas()
    want = _alive(df[df["val"].isna()])
    assert set(got["doc_id"]) == set(want["doc_id"])
    got2 = isnull_scan(out, "val", columns=["text", "val"]).to_pandas()
    assert sorted(got2.columns) == ["text", "val"]
    assert len(got2) == len(want)


def test_stats_range_routes(store):
    out, df = store
    lo, hi = 150, 250
    want = _alive(df[(df["n_chars"] >= lo) & (df["n_chars"] <= hi)])
    got = scan(out, "n_chars", ("between", lo, hi)).to_pandas()
    assert set(got["doc_id"]) == set(want["doc_id"])
    got2 = decode_dataset_pruned_distributed(
        out, "n_chars", lo, hi
    ).to_pandas()
    assert set(got2["doc_id"]) == set(want["doc_id"])


def test_topk_filters_before_truncation(store):
    out, df = store
    # delete the current top row by n_chars, then top-k must promote
    # the next-ranked LIVE rows, not truncate and then filter
    top_doc = int(df.loc[df["n_chars"].idxmax(), "doc_id"])
    tombstone.delete_where(out, "doc_id", [top_doc])
    alive = df[~df["doc_id"].isin(DEAD + [top_doc])]
    want = alive.nlargest(5, "n_chars")
    got = topk_store(out, "n_chars", 5, tiebreak="doc_id").to_pandas()
    assert len(got) == 5
    assert set(got["doc_id"]) == set(want["doc_id"])
    # with a projection excluding doc_id
    got2 = topk_store(out, "n_chars", 5, columns=["n_chars"]).to_pandas()
    assert list(got2.columns) == ["n_chars"]
    assert sorted(got2["n_chars"]) == sorted(want["n_chars"])


def test_take_rows_does_not_resurrect(store):
    out, df = store
    got = take_rows(out, list(range(N))).to_pandas()
    assert len(got) == N - len(DEAD)
    assert not (set(got["doc_id"]) & set(DEAD))
    got2 = take_rows(out, list(range(N)), columns=["text"]).to_pandas()
    assert sorted(got2.columns) == ["_row", "text"]
    assert len(got2) == N - len(DEAD)


def test_family_routes(store):
    out, df = store
    alive = _alive(df)
    # family_stats route: range predicate on the derived column
    lo, hi = 300, 500
    want = alive[(alive["n_chars"] * 2 >= lo) & (alive["n_chars"] * 2 <= hi)]
    got = scan(out, "n2", ("between", lo, hi)).to_pandas()
    assert set(got["doc_id"]) == set(want["doc_id"])
    # family_zip route: equality on the derived column, projection
    # excluding the tombstoned column
    dead_n2 = int(df.loc[df["doc_id"] == DEAD[0], "n_chars"].iloc[0]) * 2
    got2 = scan(out, "n2", ("==", dead_n2), columns=["n2", "text"])
    assert got2.count() == 0  # that row is deleted
    live_row = alive.iloc[0]
    got3 = scan(
        out, "n2", ("==", int(live_row["n_chars"]) * 2), columns=["text"]
    ).to_pandas()
    assert list(got3.columns) == ["text"]
    assert got3["text"].iloc[0] == live_row["text"]
