"""KLL quantile sketch: rank-error envelope, merge associativity,
serialization, determinism, and the distributed gate query."""

import numpy as np
import pandas as pd
import pytest

from parquet_go_ray.functions.sketch import KLLSketch


def _rank_err(data_sorted, est, q):
    true_rank = np.searchsorted(data_sorted, est, side="right")
    return abs(true_rank - q * len(data_sorted)) / len(data_sorted)


def test_rank_error_envelope_heavy_tail():
    rng = np.random.default_rng(0)
    data = rng.lognormal(3, 2, 1_000_000)
    s = KLLSketch()
    for chunk in np.array_split(data, 53):
        s.merge(KLLSketch().update(chunk))
    sd = np.sort(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        assert _rank_err(sd, s.quantile(q), q) <= 0.01
    # bounded footprint: the whole point vs the exact operator
    assert sum(len(a) for a in s.levels) < 20 * s.k


def test_rank_error_envelope_adversarial_sorted_input():
    # already-sorted input with heavy duplication — the layout that
    # breaks naive sampling
    data = np.repeat(np.arange(1000, dtype=np.float64), 500)
    s = KLLSketch().update(data)
    sd = data  # already sorted
    for q in (0.1, 0.5, 0.9):
        assert _rank_err(sd, s.quantile(q), q) <= 0.01


def test_merge_matches_single_stream_error():
    rng = np.random.default_rng(1)
    data = rng.normal(0, 1, 300_000)
    merged = KLLSketch()
    for chunk in np.array_split(data, 16):
        merged.merge(KLLSketch().update(chunk))
    sd = np.sort(data)
    for q in (0.25, 0.5, 0.75):
        assert _rank_err(sd, merged.quantile(q), q) <= 0.01


def test_serialization_roundtrip_bit_identical():
    rng = np.random.default_rng(2)
    s = KLLSketch().update(rng.uniform(0, 1, 100_000))
    t = KLLSketch.from_bytes(s.to_bytes())
    assert t.n == s.n
    assert t.parity == s.parity
    assert all(np.array_equal(a, b) for a, b in zip(t.levels, s.levels))
    assert t.to_bytes() == s.to_bytes()


def test_deterministic_across_runs():
    rng1 = np.random.default_rng(3)
    data = rng1.exponential(5, 200_000)
    a = KLLSketch().update(data)
    b = KLLSketch().update(data.copy())
    assert a.to_bytes() == b.to_bytes()


def test_nan_and_empty_handling():
    s = KLLSketch()
    with pytest.raises(ValueError):
        s.quantile(0.5)
    s.update(np.array([np.nan, 1.0, np.nan, 2.0]))
    assert s.n == 2
    assert s.quantile(0.5) == 1.0
    assert s.rank(1.5) == 1


def test_group_gate_query_distributed(ray_session, sf_dir):
    import duckdb

    from parquet_go_ray.pipelines.queries import QUERIES

    out = QUERIES["group_quantile_sketch"](sf_dir)
    assert list(out.columns) == ["event_type", "p50", "p90", "p99"]
    df = duckdb.sql(
        f"SELECT event_type, value FROM read_parquet('{sf_dir}/events.parquet')"
    ).df()
    for _, row in out.iterrows():
        vals = np.sort(df[df["event_type"] == row["event_type"]]["value"].to_numpy())
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            assert _rank_err(vals, row[col], q) <= 0.01, (row["event_type"], col)


def test_gate_query_distributed(ray_session, sf_dir):
    import duckdb

    from parquet_go_ray.pipelines.queries import QUERIES

    out = QUERIES["quantile_sketch"](sf_dir)
    assert list(out.columns) == ["q", "value_est"]
    # estimates must sit within 1% rank error of the exact quantiles
    vals = duckdb.sql(
        f"SELECT value FROM read_parquet('{sf_dir}/events.parquet')"
    ).df()["value"].to_numpy()
    sd = np.sort(vals)
    for q, est in zip(out["q"], out["value_est"]):
        assert _rank_err(sd, est, q) <= 0.01, (q, est)
