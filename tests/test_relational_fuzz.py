"""Randomized fuzz of the round-5 relational operators over generated
micro-warehouses (orders / lineitem / customer / part with random
cardinalities, skewed keys, boundary-heavy values): every operator's
partial-aggregation + bucket-join arithmetic compared against DuckDB
on the same files. Complements the layout tests (real tables, shuffled
rows) with shapes the driver testdata never produces — orders with no
lineitems, single-line orders, all-same-priority batches, quantity
sums exactly at the Q18 threshold."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from test_queries import _to_pandas, assert_frames_match

FUZZ_QUERIES = [
    "exists_semi_groupby",
    "large_orders",
    "median_by_group",
    "p90_by_group",
    "corr_by_group",
    "above_avg_orders",
    "urgent_line_counts",
    "promo_revenue_share",
    "shipping_priority",
    "unpivot_measures",
]

_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_SEG = ["BUILDING", "MACHINERY", "HOUSEHOLD"]


def _warehouse(tmp, seed: int):
    rng = np.random.default_rng(seed)
    n_cust = int(rng.integers(5, 40))
    n_ord = int(rng.integers(20, 150))
    n_li = int(rng.integers(40, 500))
    n_part = int(rng.integers(5, 30))
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64) * 3 + 1),
            "c_name": pa.array([f"Customer#{i}" for i in range(n_cust)]),
            "c_nationkey": pa.array(rng.integers(0, 5, n_cust).astype(np.int64)),
            "c_acctbal": pa.array(np.round(rng.uniform(-100, 9000, n_cust), 2)),
            "c_mktsegment": pa.array(rng.choice(_SEG, n_cust)),
        }
    )
    ckeys = cust["c_custkey"].to_numpy()
    base = np.datetime64("1996-06-01", "us").astype(np.int64)
    odate = base + rng.integers(-400, 400, n_ord).astype(np.int64) * 86_400_000_000
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64) * 2 + 1),
            "o_custkey": pa.array(rng.choice(ckeys, n_ord).astype(np.int64)),
            "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], n_ord)),
            "o_totalprice": pa.array(np.round(rng.uniform(100, 40000, n_ord), 2)),
            "o_orderdate": pa.array(odate, pa.timestamp("us")),
            "o_orderpriority": pa.array(rng.choice(_PRIO, n_ord)),
        }
    )
    okeys = orders["o_orderkey"].to_numpy()
    # some orderkeys get MANY lines (threshold-straddling sums), the
    # tail of orders gets none at all (the EXISTS negative case)
    li_ok = rng.choice(okeys[: max(1, int(n_ord * 0.8))], n_li).astype(np.int64)
    sdate = base + rng.integers(-380, 900, n_li).astype(np.int64) * 86_400_000_000
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(li_ok),
            "l_partkey": pa.array(
                (rng.integers(0, n_part, n_li).astype(np.int64) * 5 + 2)
            ),
            "l_suppkey": pa.array(rng.integers(1, 20, n_li).astype(np.int64)),
            "l_linenumber": pa.array(rng.integers(1, 7, n_li).astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 90000, n_li), 2)),
            "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n_li), 2)),
            "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
            "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
            "l_shipdate": pa.array(sdate, pa.timestamp("us")),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part, dtype=np.int64) * 5 + 2),
            "p_name": pa.array([f"part {i}" for i in range(n_part)]),
            "p_brand": pa.array(rng.choice(["B1", "B2"], n_part)),
            "p_type": pa.array(rng.choice(["PROMO", "STANDARD", "ECONOMY"], n_part)),
            "p_size": pa.array(rng.integers(1, 50, n_part).astype(np.int64)),
            "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, n_part), 2)),
        }
    )
    for name, t in [
        ("customer", cust),
        ("orders", orders),
        ("lineitem", lineitem),
        ("part", part),
    ]:
        pq.write_table(t, f"{tmp}/{name}.parquet")


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_relational_ops_random_warehouse(ray_session, tmp_path, seed):
    import __ray_entry__ as entrymod

    d = tmp_path / f"w{seed}"
    d.mkdir()
    _warehouse(d, seed)
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in FUZZ_QUERIES:
        r = _to_pandas(qs[name](str(d)))
        s = con.execute(oracles[name]).df()
        if len(s) == 0:
            assert len(r) == 0, f"{name}: ray {len(r)} rows vs empty oracle"
            continue
        assert_frames_match(r, s, f"{name}[seed={seed}]")


def test_empty_dimension_paths(ray_session, tmp_path):
    """Force the broadcast-dim edge cases the random warehouses may
    miss: a segment with NO customers (shipping_priority's dim goes
    empty), a ship month with NO lineitems (promo's total is zero ->
    SQL NULL), and a threshold nothing reaches (large_orders empty) —
    each must return exactly what the oracle returns instead of
    crashing in an empty searchsorted."""
    import __ray_entry__ as entrymod

    d = tmp_path / "edge"
    d.mkdir()
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 4], pa.int64()),
            "c_name": pa.array(["Customer#0", "Customer#1"]),
            "c_nationkey": pa.array([0, 1], pa.int64()),
            "c_acctbal": pa.array([10.0, 20.0]),
            # NO 'BUILDING' rows anywhere
            "c_mktsegment": pa.array(["MACHINERY", "HOUSEHOLD"]),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([2, 6], pa.int64()),
            "o_custkey": pa.array([1, 4], pa.int64()),
            "o_orderstatus": pa.array(["F", "O"]),
            "o_totalprice": pa.array([100.0, 200.0]),
            "o_orderdate": pa.array(
                np.array(["1996-05-01", "1996-07-01"], dtype="datetime64[us]")
            ),
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW"]),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([2, 2, 6], pa.int64()),
            "l_partkey": pa.array([2, 7, 2], pa.int64()),
            "l_suppkey": pa.array([1, 2, 3], pa.int64()),
            "l_linenumber": pa.array([1, 2, 1], pa.int32()),
            "l_quantity": pa.array([5.0, 6.0, 7.0]),
            "l_extendedprice": pa.array([1000.0, 2000.0, 3000.0]),
            "l_discount": pa.array([0.05, 0.0, 0.1]),
            "l_tax": pa.array([0.0, 0.02, 0.01]),
            "l_returnflag": pa.array(["A", "N", "R"]),
            "l_linestatus": pa.array(["O", "F", "O"]),
            # NONE in promo's 1996-01 window
            "l_shipdate": pa.array(
                np.array(
                    ["1996-06-01", "1996-08-01", "1995-02-01"],
                    dtype="datetime64[us]",
                )
            ),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array([2, 7], pa.int64()),
            "p_name": pa.array(["p0", "p1"]),
            "p_brand": pa.array(["B1", "B2"]),
            "p_type": pa.array(["PROMO", "STANDARD"]),
            "p_size": pa.array([1, 2], pa.int64()),
            "p_retailprice": pa.array([900.0, 950.0]),
        }
    )
    for name, t in [
        ("customer", cust),
        ("orders", orders),
        ("lineitem", lineitem),
        ("part", part),
    ]:
        pq.write_table(t, f"{d}/{name}.parquet")
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ["shipping_priority", "large_orders"]:
        r = _to_pandas(qs[name](str(d)))
        assert len(r) == 0, f"{name}: expected empty, got {len(r)}"
        assert len(con.execute(oracles[name]).df()) == 0
    # promo: SQL yields one row of NULL; ray yields one NaN row
    r = _to_pandas(qs["promo_revenue_share"](str(d)))
    s = con.execute(oracles["promo_revenue_share"]).df()
    assert len(r) == len(s) == 1
    assert pd.isna(r["promo_pct"].iloc[0]) and pd.isna(s["promo_pct"].iloc[0])
