"""Layout independence for the round-5 relational additions: the driver
testdata ships id-/ts-sorted single-row-group files, which masks any
accidental dependence on row order or block boundaries. This mirror
re-runs the new operators over a deterministically ROW-SHUFFLED copy of
the tables (several row groups each, so reads split into multiple
blocks) and compares against DuckDB on the SAME shuffled files — the
results must be identical to the sorted-layout gate."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from test_queries import TABLES, _to_pandas, assert_frames_match

NEW_QUERIES = [
    "cube_counts",
    "set_intersect_users",
    "set_except_users",
    "pivot_event_counts",
    "corr_by_group",
    "exists_semi_groupby",
    "explode_tokens",
    "funnel_steps",
    "shipping_priority",
    "median_by_group",
    "multi_distinct",
    "group_concat_langs",
    "kmeans_assign",
    "moving_sum_time",
    "latest_event_per_user",
    "bigram_counts",
    "event_transitions",
    "orphan_orders",
    "p90_by_group",
    "above_avg_orders",
    "unpivot_measures",
    "local_supplier_revenue",
    "promo_revenue_share",
    "urgent_line_counts",
    "large_orders",
    # window family after the vectorized-bucket-fold refit
    "lag_gaps",
    "running_total",
    "moving_sum",
    "session_windows",
    "window_edges",
    "grouping_sets",
]


@pytest.fixture(scope="module")
def shuffled_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("shuffled_sf")
    rng = np.random.default_rng(20260820)
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        perm = rng.permutation(tab.num_rows)
        shuf = tab.take(perm)
        # small row groups -> several blocks per read
        pq.write_table(
            shuf, f"{out}/{t}.parquet", row_group_size=max(64, tab.num_rows // 7)
        )
    return str(out)


@pytest.fixture(scope="module")
def shuffled_con(shuffled_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{shuffled_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_round5_query_layout_independent(ray_session, shuffled_dir, shuffled_con, name):
    import __ray_entry__ as entrymod

    result = _to_pandas(entrymod.queries()[name](shuffled_dir))
    sql_df = shuffled_con.execute(entrymod.oracle_sql()[name]).df()
    assert len(sql_df) > 0, f"{name}: shuffled oracle is empty — fixture broken"
    assert_frames_match(result, sql_df, name)


def test_token_ops_edge_docs(ray_session, tmp_path):
    """explode_tokens / bigram_counts / vocab-adjacent kernels over
    degenerate documents the driver testdata never contains: empty
    text, a single token, all-identical tokens, consecutive separators
    (empty tokens). Oracle = DuckDB over the same planted file, so the
    Arrow split/offset arithmetic must agree with SQL semantics on
    every edge."""
    import duckdb as _duck
    import pyarrow as pa
    import pyarrow.parquet as _pq

    import __ray_entry__ as entrymod

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(["", "one", "a a a", "x  y", "b c b c b"]),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["s0"] * 5),
            "n_chars": pa.array([0, 3, 5, 4, 9], pa.int64()),
        }
    )
    out = tmp_path / "edge"
    out.mkdir()
    _pq.write_table(docs, f"{out}/documents.parquet")
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{out}/documents.parquet')"
    )
    oracles = entrymod.oracle_sql()
    for name in ["explode_tokens", "bigram_counts"]:
        r = _to_pandas(entrymod.queries()[name](str(out)))
        s = con.execute(oracles[name]).df()
        assert_frames_match(r, s, name)


def test_orphan_orders_counts_planted_violations(ray_session, tmp_path):
    """The referential-integrity audit must actually COUNT violations —
    the driver testdata is consistent (0 orphans), so this plants 7
    orders pointing at custkeys no customer has."""
    import duckdb as _duck

    import __ray_entry__ as entrymod

    src = "/root/testdata/sf0.001"
    out = tmp_path / "fk"
    out.mkdir()
    for t in TABLES:
        if t == "orders":
            continue
        (out / f"{t}.parquet").symlink_to(f"{src}/{t}.parquet")
    con = _duck.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/orders.parquet') "
        "UNION ALL "
        "SELECT 900000000 + i AS o_orderkey, 900000000 + i AS o_custkey, "
        "'F' AS o_orderstatus, 1.0 AS o_totalprice, "
        "TIMESTAMP '1996-01-01' AS o_orderdate, "
        "'1-URGENT' AS o_orderpriority FROM range(7) t(i)) "
        f"TO '{out}/orders.parquet' (FORMAT PARQUET)"
    )
    res = _to_pandas(entrymod.queries()["orphan_orders"](str(out)))
    assert int(res["n_orphans"].iloc[0]) == 7
    base = _to_pandas(entrymod.queries()["orphan_orders"](src))
    assert int(res["n_orders"].iloc[0]) == int(base["n_orders"].iloc[0]) + 7
    assert int(base["n_orphans"].iloc[0]) == 0


def test_group_distinct_hll_accuracy(ray_session):
    """The per-group HLL estimates must sit within the p=12 error bound
    (~1.6% stderr; assert 6% = ~4 sigma) of the exact per-group distinct
    counts on the real table."""
    import duckdb as _duck

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.01"
    est = _to_pandas(entrymod.queries()["group_distinct_hll"](sf))
    exact = _duck.connect().execute(
        f"SELECT event_type, count(DISTINCT user_id) AS n FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY event_type"
    ).df()
    m = est.merge(exact, on="event_type")
    assert len(m) == len(exact)
    rel = (m["n_users_est"] - m["n"]).abs() / m["n"]
    assert (rel <= 0.06).all(), rel.tolist()
