"""Query router (pipelines/query.py): predicate -> access path
routing, explain prune counts, and result parity with the direct
operators."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.pipelines.encode import encode_job
from parquet_go_ray.pipelines.query import explain, scan


@pytest.fixture()
def store(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    n = 2000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(rng.choice(["en", "de", "fr"], n)),
            "n_chars": pa.array(
                np.sort(rng.integers(0, 10_000, n)), pa.int64()
            ),
            "source": pa.array(
                [f"host{int(x)}.example" for x in rng.integers(0, 9, n)]
            ),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=128, bloom_columns=("doc_id",))
    return out, t.to_pandas()


def test_routing_table(store):
    out, _ = store
    assert explain(out)["path"] == "full_scan"
    assert explain(out, "lang", ("is_null",))["path"] == "null_stats"
    assert explain(out, "lang", ("==", "en"))["path"] == "dict_domain"
    assert explain(out, "doc_id", ("==", 5))["path"] == "bloom_probe"
    assert explain(out, "n_chars", ("between", 1, 2))["path"] == "stats_range"
    assert explain(out, "source", ("prefix", "host1"))["path"] == "dict_pattern"
    assert explain(out, "source", ("regex", "h.st"))["path"] == "dict_pattern"
    with pytest.raises(ValueError, match="unknown predicate"):
        explain(out, "lang", ("!=", "en"))


def test_explain_prunes_ranges(store):
    out, df = store
    # n_chars is sorted -> a narrow range admits few files
    lo = int(df["n_chars"].quantile(0.4))
    hi = int(df["n_chars"].quantile(0.45))
    plan = explain(out, "n_chars", ("between", lo, hi))
    assert plan["path"] == "stats_range"
    assert 0 < plan["files_admitted"] <= plan["files_total"]
    assert plan["chunks_admitted"] >= 1
    # a range beyond the domain admits nothing
    none = explain(out, "n_chars", ("between", 10**9, 10**9 + 1))
    assert none["files_admitted"] == 0
    # no nulls in the fixture -> null scan admits nothing
    assert explain(out, "lang", ("is_null",))["files_admitted"] == 0


def test_router_routes_derived_columns(store):
    """A backfilled column queries through the same scan(): range
    predicates prune via the FAMILY's stats, equality zips + filters."""
    from parquet_go_ray.pipelines.derive import add_derived_column

    out, df = store

    def dbl():
        import pyarrow.compute as _pc

        def f(t):
            return _pc.multiply(
                t.column("n_chars").combine_chunks(),
                pa.scalar(2, pa.int64()),
            )

        return f

    add_derived_column(out, "dbl", "n2", dbl(), ["n_chars"])
    plan = explain(out, "n2", ("between", 100, 400))
    assert plan["path"] == "family_stats" and plan["family"] == "dbl"
    assert plan["files_admitted"] <= plan["files_total"]
    got = (
        scan(out, "n2", ("between", 100, 400), columns=["doc_id", "n2"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = df[(df["n_chars"] * 2).between(100, 400)]
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    target = int(df["n_chars"].iloc[500]) * 2  # a value that exists
    eq = explain(out, "n2", ("==", target))
    assert eq["path"] == "family_zip"
    got_eq = scan(out, "n2", ("==", target), columns=["doc_id"]).to_pandas()
    assert sorted(got_eq["doc_id"]) == sorted(
        df[df["n_chars"] * 2 == target]["doc_id"]
    )
    # base columns still route as before despite the family's presence
    assert explain(out, "n_chars", ("between", 1, 2))["path"] == "stats_range"


@pytest.mark.parametrize(
    "column,pred,oracle",
    [
        ("lang", ("==", "de"), lambda d: d[d["lang"] == "de"]),
        ("lang", ("in", ["en", "fr"]), lambda d: d[d["lang"].isin(["en", "fr"])]),
        ("doc_id", ("==", 77), lambda d: d[d["doc_id"] == 77]),
        ("doc_id", ("in", [3, 99, 1500]), lambda d: d[d["doc_id"].isin([3, 99, 1500])]),
        (
            "n_chars",
            ("between", 2000, 4000),
            lambda d: d[(d["n_chars"] >= 2000) & (d["n_chars"] <= 4000)],
        ),
        ("n_chars", ("<=", 100), lambda d: d[d["n_chars"] <= 100]),
        ("n_chars", (">=", 9900), lambda d: d[d["n_chars"] >= 9900]),
        (
            "source",
            ("suffix", "3.example"),
            lambda d: d[d["source"].str.endswith("3.example")],
        ),
        ("lang", ("is_null",), lambda d: d[d["lang"].isna()]),
        (None, None, lambda d: d),
    ],
)
def test_scan_matches_pandas(store, column, pred, oracle):
    out, df = store
    got = (
        scan(out, column, pred, columns=["doc_id"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
        if len(oracle(df))
        else scan(out, column, pred, columns=["doc_id"]).to_pandas()
    )
    want = oracle(df)["doc_id"].sort_values(ignore_index=True)
    assert got.get("doc_id", want.iloc[0:0]).tolist() == want.tolist()
