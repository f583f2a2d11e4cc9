"""Randomized fuzz of the vectorized window-family bucket folds
(lag/running/ROWS/RANGE frames, edges, sessions, funnel, transitions):
random event tables with HEAVY timestamp ties (the RANGE frame's peer
semantics and every (ts, event_id) tiebreak), single-event users, and
skewed user sizes, each compared against the DuckDB oracle on the same
file. The segment arithmetic (cumsum bases, clamped edges, rebased
composite keys, reduceat chains) has to be exact on every shape."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from test_queries import _to_pandas, assert_frames_match

WINDOW_QUERIES = [
    "lag_gaps",
    "running_total",
    "moving_sum",
    "moving_sum_time",
    "window_edges",
    "session_windows",
    "funnel_steps",
    "event_transitions",
    "latest_event_per_user",
    "multi_distinct",
]


def _random_events(seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    n_users = int(rng.integers(1, 25))
    users = rng.integers(0, n_users, n).astype(np.int64) * 7 + 3
    # coarse timestamp grid -> many exact ties within and across users
    base = np.datetime64("1996-03-01T00:00:00", "us").astype(np.int64)
    ts = base + rng.integers(0, 50, n).astype(np.int64) * 1_800_000_000
    types = rng.choice(
        np.array(["view", "click", "purchase", "signup", "error"]), n
    )
    return pa.table(
        {
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users),
            "event_type": pa.array(types),
            "value": pa.array(np.round(rng.uniform(0, 120, n), 2)),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505])
def test_window_folds_random_tables(ray_session, tmp_path, seed):
    import __ray_entry__ as entrymod

    d = tmp_path / f"s{seed}"
    d.mkdir()
    pq.write_table(_random_events(seed), f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in WINDOW_QUERIES:
        r = _to_pandas(qs[name](str(d)))
        s = con.execute(oracles[name]).df()
        if len(s) == 0:
            # a random table may produce no funnel completions etc.;
            # the Ray side must agree it is empty
            assert len(r) == 0, f"{name}: ray {len(r)} rows vs empty oracle"
            continue
        assert_frames_match(r, s, f"{name}[seed={seed}]")
