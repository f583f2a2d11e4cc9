"""Layout-independence + correctness regressions for the round-4 late
relational additions: topk_per_group, anti_join_broadcast,
interval_join_broadcast, and the multi-join top_revenue_customers
pipeline. Block layout from a parallel read is nondeterministic, so
every operator here is driven over SHUFFLED input rows and compared to
a plain pandas reference (the verify-skill regression pattern:
id-sorted testdata masks layout sensitivity)."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from parquet_go_ray.pipelines import relational


def _shuffled_docs(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr", "zh", "es"], size=n),
            "n_chars": rng.integers(10, 2000, size=n).astype(np.int64),
            "source": rng.choice([f"s{i}" for i in range(30)], size=n),
        }
    )
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def test_topk_per_group_matches_pandas_on_shuffled_input(ray_session):
    df = _shuffled_docs()
    ds = ray.data.from_pandas(df).repartition(13)
    got = (
        relational.topk_per_group(
            ds, "lang", "n_chars", "doc_id", k=4, n_rows_hint=len(df)
        )
        .to_pandas()
        .sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["n_chars", "doc_id"], ascending=[False, True], kind="stable")
        .groupby("lang", sort=False)
        .head(4)[["lang", "n_chars", "doc_id"]]
        .sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_topk_per_group_with_boundary_ties(ray_session):
    # every score identical: the k winners per group must be the k
    # smallest ids — the ROW_NUMBER tie-break, not arbitrary
    df = pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64)[::-1].copy(),
            "lang": ["en", "de"] * 50,
            "n_chars": np.int64(7),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = relational.topk_per_group(
        ds, "lang", "n_chars", "doc_id", k=3, n_rows_hint=100
    ).to_pandas()
    # doc_id runs 99..0 while lang alternates en/de, so "en" rows carry
    # the odd ids and "de" the even ones
    assert sorted(got[got["lang"] == "en"]["doc_id"]) == [1, 3, 5]
    assert sorted(got[got["lang"] == "de"]["doc_id"]) == [0, 2, 4]


def test_anti_join_broadcast_exact(ray_session):
    df = _shuffled_docs(n=2000, seed=11)
    block = pd.DataFrame({"source": ["s1", "s5", "s9", "nonexistent"]})
    ds = ray.data.from_pandas(df).repartition(9)
    small = ray.data.from_pandas(block)
    got = relational.anti_join_broadcast(ds, "source", small).to_pandas()
    want = df[~df["source"].isin(block["source"])]
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_interval_join_fans_out_overlaps(ray_session):
    df = pd.DataFrame(
        {"k": np.arange(10, dtype=np.int64), "v": np.arange(10, dtype=np.int64)}
    )
    iv = [("lo", 0, 5), ("mid", 3, 8), ("all", 0, 10)]
    ds = ray.data.from_pandas(df).repartition(3)
    got = relational.interval_join_broadcast(
        ds, "v", iv, out_cols=["k"]
    ).to_pandas()
    rows = set(zip(got["k"], got["window_name"]))
    want = {
        (k, name)
        for k in range(10)
        for name, lo, hi in iv
        if lo <= k < hi
    }
    assert rows == want
    # v=4 is in all three windows — the fan-out that separates a range
    # join from bucketing
    assert sum(1 for k, _ in rows if k == 4) == 3


def test_top_revenue_customers_runs(ray_session, sf_dir):
    from parquet_go_ray.pipelines.queries import QUERIES

    out = QUERIES["top_revenue_customers"](sf_dir).to_pandas()
    assert len(out) == 10
    assert list(out.columns) == ["c_custkey", "c_name", "revenue_cents"]
    rev = out["revenue_cents"].to_numpy()
    assert (rev[:-1] >= rev[1:]).all()


def test_top_revenue_bucket_path_matches_broadcast(
    ray_session, sf_dir, monkeypatch
):
    """The both-sides-large bucket join (forced by a zero broadcast
    limit) returns exactly what the broadcast-dim fast path returns."""
    from parquet_go_ray.pipelines import queries as Q

    fast = Q.QUERIES["top_revenue_customers"](sf_dir).to_pandas()
    monkeypatch.setattr(Q, "JOIN_BROADCAST_LIMIT_ROWS", 0)
    slow = Q.QUERIES["top_revenue_customers"](sf_dir).to_pandas()
    assert fast.equals(slow)
