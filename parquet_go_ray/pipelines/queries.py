"""Correctness-gate query registry.

Every implemented operator/pipeline from SURVEY.md §2 (plus the
training-data additions) has an entry here: a callable taking `sf_dir`
and returning a Dataset / DataFrame / Table, and — when SQL-expressible
— a DuckDB oracle producing identical rows, column names and dtypes.
The driver hash-compares them at sf=0.01; tests/test_queries.py runs the
same comparison at sf=0.001.
"""

from __future__ import annotations

from ..util import autoscale_concurrency

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions import text as ftext
from . import dedup, lm, relational, similarity
from .roundtrip import roundtrip_dataset

# --------------------------------------------------------------- helpers


def _read(sf_dir: str, table: str, **kw) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", **kw)


def _read_split(sf_dir: str, table: str, **kw) -> ray.data.Dataset:
    """Read with enough blocks to parallelize CPU-heavy per-row kernels
    (MinHash/SimHash/lang-id): read_parquet parallelism is capped at
    files x row-groups, and the driver testdata ships single-row-group
    files, so a hash stage would otherwise run as ONE task. Small inputs
    repartition to ~2x cluster CPUs (a few-MB shuffle, repaid many times
    over by the parallel kernel); inputs that already carry more row
    groups than cores — every real 100 TB layout — skip the shuffle."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    target = 2 * max(4, int(ray.cluster_resources().get("CPU", 8)))
    ds = ray.data.read_parquet(path, **kw)
    if pq.read_metadata(path).num_row_groups < target:
        ds = ds.repartition(target)
    return ds


def _dim_lookup(keys: np.ndarray, k: np.ndarray):
    """Sorted-dimension membership probe that is safe on an EMPTY
    dimension (np.searchsorted + fancy-index crashes on empty keys —
    found by the micro-warehouse fuzz): returns (positions, hit mask),
    all-miss when the dimension has no rows."""
    if len(keys) == 0:
        return np.zeros(len(k), dtype=np.int64), np.zeros(len(k), dtype=bool)
    at = np.searchsorted(keys, k)
    at[at == len(keys)] = 0
    return at, keys[at] == k


# --------------------------------------------------------------- queries


def q_filter_rows(sf_dir):
    """FilterRowReader parity (filter.go:5-90): vectorized predicate."""
    ds = _read(sf_dir, "documents")
    return relational.filter_expr(
        ds,
        lambda t: pc.and_(
            pc.equal(t.column("lang"), "en"), pc.greater(t.column("n_chars"), 300)
        ),
    )


def q_transform_project(sf_dir):
    """TransformRowReader parity (transform.go:9-143)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars", "lang"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars_2x": pc.multiply(t.column("n_chars"), pa.scalar(2, pa.int64())),
                "lang_uc": pc.utf8_upper(t.column("lang")),
            }
        )

    return relational.transform(ds, fn)


def q_scan_limit(sf_dir):
    """ScanRowReader parity (scan.go:7-33): first 100 rows by doc_id."""
    return relational.scan_limit(_read(sf_dir, "documents"), ["doc_id"], 100)


def q_sort_rows(sf_dir):
    """SortingWriter parity (sorting.go:24-133)."""
    return relational.scan_limit(_read(sf_dir, "documents"), ["lang", "doc_id"], 200)


def q_merge_sorted(sf_dir):
    """MergeRowGroups parity (merge.go:20-99): merge two sorted streams."""
    ds = _read(sf_dir, "events")
    lo = relational.filter_expr(ds, lambda t: pc.less(t.column("value"), 50.0))
    hi = _read(sf_dir, "events")
    hi = relational.filter_expr(hi, lambda t: pc.greater_equal(t.column("value"), 50.0))
    return relational.merge_sorted([lo, hi], ["ts", "event_id"]).limit(1000)


def q_merge_sorted_stream(sf_dir):
    """MergeRowGroups READ-path parity (merge.go:84-99 heap merge +
    CopyRows, sorting.go:79-133): the streaming O(n log k) k-way merge
    of pre-sorted runs, without re-sorting. Events are already
    ts-ordered per shard in the testdata, so each filtered stream is a
    sorted run; the heap merge yields globally ordered batches."""
    ds = _read(sf_dir, "events")
    lo = relational.filter_expr(ds, lambda t: pc.less(t.column("value"), 50.0))
    hi = _read(sf_dir, "events")
    hi = relational.filter_expr(hi, lambda t: pc.greater_equal(t.column("value"), 50.0))
    lo = relational.sorted_rows(lo, ["ts", "event_id"])
    hi = relational.sorted_rows(hi, ["ts", "event_id"])
    out = []
    n = 0
    for batch in relational.merge_sorted_iter([lo, hi], ["ts", "event_id"]):
        out.append(batch)
        n += batch.num_rows
        if n >= 1000:
            break
    merged = pa.concat_tables(out).slice(0, 1000)
    return merged


def q_dedupe_rows(sf_dir):
    """DedupeRowReader parity (dedupe.go:8-111), global exact dedup."""
    return dedup.exact_dedupe(
        _read(sf_dir, "documents"), n_docs_hint=_nrows(sf_dir, "documents")
    )


def q_dedupe_consecutive(sf_dir):
    """Distinct (lang, source) rows — 'consecutive under comparator'."""
    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    return relational.dedupe_consecutive(ds, ["lang", "source"])


def q_convert_schema(sf_dir):
    """ConvertRowGroup parity (convert.go:243-580): projection + casts."""
    ds = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_quantity", "l_shipdate"]
    )
    ds = relational.convert_schema(
        ds,
        {"l_quantity": pa.int32(), "l_shipdate": pa.date32()},
        keep=["l_orderkey", "l_quantity", "l_shipdate"],
    )
    # date32 -> string so the hash compare is dtype-stable across engines
    return relational.convert_schema(ds, {"l_shipdate": pa.string()})


def q_schema_evolution(sf_dir):
    """Convert parity with evolution: cast, null-fill a new column,
    drop the rest, reorder to the target schema (convert.go:243-580)."""
    from .convert import convert_dataset

    target = pa.schema(
        [
            pa.field("l_orderkey", pa.int64()),
            pa.field("l_linenumber", pa.string()),  # int32 -> string
            pa.field("l_quantity", pa.int32()),  # double -> int32 (lossy)
            pa.field("l_comment", pa.string()),  # absent -> nulls
        ]
    )
    return convert_dataset(_read(sf_dir, "lineitem"), target)


def q_stats_minmax(sf_dir):
    """ColumnIndexer parity (column_index.go:259-272)."""
    return relational.column_stats(_read(sf_dir, "documents"), "lang", "n_chars")


def q_distinct_values(sf_dir):
    """unique() — distinct lang values."""
    ds = _read(sf_dir, "documents", columns=["lang"])
    return relational.dedupe_consecutive(ds, ["lang"])


def q_search_pushdown(sf_dir):
    """Search/Find parity (search.go:6-116): predicate pushdown at read."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
        filter=(pc.field("event_type") == "click"),
    )
    out = relational.filter_expr(ds, lambda t: pc.greater(t.column("value"), 50.0))
    return out


def q_bloom_semi_join(sf_dir):
    """BloomFilter.Check parity (bloom.go:16-55): membership probe."""
    return relational.bloom_semi_join(
        _read(sf_dir, "documents"), "lang", ["en", "de", "fr"]
    )


def q_agg_pricing(sf_dir):
    """Grouped aggregation with per-batch partial agg (TPC-H Q1 shape)."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["l_returnflag", "l_linestatus"])
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_price=("l_extendedprice", "sum"),
                n=("l_quantity", "size"),
            )
            .reset_index()
        )
        return g

    # final reduction on the driver, NOT a groupby shuffle: the group
    # space is bounded by the key domain (returnflag x linestatus = 6),
    # so the partials are O(groups x blocks) tiny rows at ANY data
    # scale — collecting them costs less than an all-to-all exchange.
    # (Unbounded-key aggregations like windowed_counts keep the
    # distributed groupby.)
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    g = (
        parts.groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .agg(sum_qty=("sum_qty", "sum"), sum_price=("sum_price", "sum"), n=("n", "sum"))
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    g["sum_qty"] = g["sum_qty"].astype(float).round(2)
    g["sum_price"] = g["sum_price"].astype(float).round(2)
    g["n"] = g["n"].astype("int64")
    return g


def q_session_windows(sf_dir):
    """Sessionization: per user, events within 30 minutes of the
    previous event share a session (the guide's stream-shaped pattern:
    partition by key, sort by ts inside the group). Returns per-user
    session count and max session length."""
    GAP = 1_800_000_000  # 30 min in µs
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over the bucket: session breaks are timestamp gaps
        # > GAP within a user segment; reduceat folds per-user counts
        # and per-user max session sizes with no per-user Python call
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_sessions": pd.Series([], dtype=np.int64),
                    "max_session_events": pd.Series([], dtype=np.int64),
                }
            )
        starts = np.empty(n, dtype=bool)
        starts[0] = True
        starts[1:] = u[1:] != u[:-1]
        start_idx = np.nonzero(starts)[0]
        new_s = np.empty(n, dtype=bool)
        new_s[0] = True
        new_s[1:] = np.diff(ts) > GAP
        new_s[starts] = True
        sess_start = np.nonzero(new_s)[0]
        sizes = np.diff(np.concatenate((sess_start, [n])))
        # sessions are contiguous per user segment: the first session of
        # each segment indexes the reduceat over session sizes
        first_sess = np.searchsorted(sess_start, start_idx)
        return pd.DataFrame(
            {
                "user_id": u[start_idx],
                "n_sessions": np.add.reduceat(
                    new_s.astype(np.int64), start_idx
                ).astype(np.int64),
                "max_session_events": np.maximum.reduceat(
                    sizes, first_sess
                ).astype(np.int64),
            }
        )

    return _window_buckets(ds, fold)


def _window_buckets(ds, fold, B=None):
    """Shared scaffold for per-KEY window operators: hash-bucket the
    user key (one map-only tag), ONE bucket exchange, and a VECTORIZED
    fold per bucket that handles every user in the bucket with segment
    arithmetic over one lexsort — never a Python call per user
    (groupby(user).map_groups costs a per-GROUP call, which at 10^9
    users is days of pure call overhead; this shape is flat in the
    number of keys)."""
    if B is None:
        B = max(16, -(-ds.count() // JOIN_BUCKET_TARGET_ROWS))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (df["user_id"].to_numpy(np.int64) % B).astype("int32")
        return df

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


class _Segs:
    """Segment structure of one bucket sorted by (user, ts, event_id):
    the scaffolding every vectorized window fold reads."""

    __slots__ = ("order", "u", "ts", "eid", "starts", "seg_id", "start_idx", "cents")

    def __init__(self, g: pd.DataFrame, value_col: str | None = None):
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        self.order = np.lexsort((eid, ts, u))
        self.u, self.ts, self.eid = u[self.order], ts[self.order], eid[self.order]
        self.starts = np.empty(len(u), dtype=bool)
        if len(u):
            self.starts[0] = True
            self.starts[1:] = self.u[1:] != self.u[:-1]
        self.seg_id = np.cumsum(self.starts) - 1
        self.start_idx = np.nonzero(self.starts)[0]
        self.cents = None
        if value_col is not None:
            self.cents = np.floor(
                g[value_col].to_numpy()[self.order] * 100 + 0.5
            ).astype(np.int64)


def _user_segments(g: pd.DataFrame, value_col: str | None = None):
    s = _Segs(g, value_col)
    return s.u, s.ts, s.eid, s.starts, s.seg_id, s.start_idx, s.cents


def q_lag_gaps(sf_dir):
    """LAG window parity: per user, the microsecond gap since the
    user's previous event ((ts, event_id)-ordered; -1 for the first).
    Vectorized bucket fold: one lexsort per bucket, one diff, segment
    starts reset to -1 — no per-user Python call (see
    _window_buckets)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u, ts, eid, starts, _seg, _si, _v = _user_segments(g)
        gap = np.empty(len(ts), dtype=np.int64)
        if len(ts):
            gap[0] = -1
            gap[1:] = np.diff(ts)
            gap[starts] = -1
        return pd.DataFrame({"event_id": eid, "user_id": u, "gap_us": gap})

    return _window_buckets(ds, fold)


def q_running_total(sf_dir):
    """Cumulative-window parity (SUM OVER ... ROWS UNBOUNDED
    PRECEDING): per user, the running total of value in integer cents
    ((ts, event_id)-ordered) — exact int64 arithmetic so the oracle
    hash-matches bit-for-bit. Vectorized bucket fold: one global
    cumsum, per-segment base subtraction."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u, ts, eid, starts, seg_id, start_idx, cents = _user_segments(g, "value")
        cs = np.cumsum(cents)
        base = cs[start_idx] - cents[start_idx]
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": u,
                "run_cents": (cs - base[seg_id]).astype(np.int64),
            }
        )

    return _window_buckets(ds, fold)


def q_moving_sum(sf_dir):
    """Sliding-window parity (SUM OVER ... ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW): per user, the 3-event moving total in integer cents.
    Vectorized bucket fold: padded cumsum difference with the window's
    left edge clamped to each user's segment start."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u, ts, eid, starts, seg_id, start_idx, cents = _user_segments(g, "value")
        cs0 = np.concatenate(([0], np.cumsum(cents)))
        i = np.arange(len(u))
        j = np.maximum(i - 2, start_idx[seg_id])
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": u,
                "win3_cents": (cs0[i + 1] - cs0[j]).astype(np.int64),
            }
        )

    return _window_buckets(ds, fold)


def q_rollup_counts(sf_dir):
    """GROUP BY ROLLUP parity: event counts at (event_type, hour),
    (event_type) and grand-total granularities in ONE pass — the hour
    partials aggregate once, the coarser levels fold from those
    partials (no second corpus read), NULL marking the rolled-up
    levels exactly as SQL does."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def hour_partials(t: pa.Table) -> pa.Table:
        hours = pc.cast(
            pc.divide(
                pc.cast(t.column("ts").combine_chunks(), pa.int64()),
                pa.scalar(3_600_000_000, pa.int64()),
            ),
            pa.int64(),
        )
        g = pa.table(
            {"event_type": t.column("event_type"), "bucket": hours}
        )
        return (
            pa.TableGroupBy(g, ["event_type", "bucket"])
            .aggregate([("bucket", "count")])
            .rename_columns(["event_type", "bucket", "n"])
        )

    fine = (
        ds.map_batches(hour_partials, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["event_type", "bucket", "n"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def widen(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("n"),
            "n",
            t.column("n").cast(pa.int64()),
        )

    fine = fine.map_batches(widen, batch_format="pyarrow")
    ft = pa.concat_tables(
        [b for b in fine.iter_batches(batch_format="pyarrow")]
    )
    mid = (
        pa.TableGroupBy(ft.select(["event_type", "n"]), ["event_type"])
        .aggregate([("n", "sum")])
        .rename_columns(["event_type", "n"])
    )
    mid = mid.append_column(
        "bucket", pa.nulls(mid.num_rows, pa.int64())
    ).select(["event_type", "bucket", "n"])
    total = pa.table(
        {
            "event_type": pa.nulls(1, pa.string()),
            "bucket": pa.nulls(1, pa.int64()),
            "n": pa.array([int(pc.sum(ft.column("n")).as_py() or 0)], pa.int64()),
        }
    )
    out = pa.concat_tables(
        [ft, mid.set_column(2, "n", mid.column("n").cast(pa.int64())), total]
    )
    return ray.data.from_arrow(out)


def q_dense_ranks(sf_dir):
    """DENSE_RANK window parity: per event_type, the dense rank of the
    event's value (integer cents, ascending; ties share a rank) — one
    np.unique(return_inverse) per group."""
    ds = _read(
        sf_dir, "events", columns=["event_id", "event_type", "value"]
    )

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        _, inv = np.unique(cents, return_inverse=True)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "event_type": g["event_type"].to_numpy(),
                "rnk": (inv + 1).astype(np.int64),
            }
        )

    return ds.groupby("event_type").map_groups(ranks, batch_format="pandas")


def q_ntile_buckets(sf_dir):
    """NTILE window parity: per event_type, NTILE(4) over (cents,
    event_id) order — SQL's exact sizing rule (the first n mod k tiles
    get the extra row) reproduced with one np.repeat per group."""
    K = 4
    ds = _read(
        sf_dir, "events", columns=["event_id", "event_type", "value"]
    )

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, cents))
        n = len(eid)
        base, extra = divmod(n, K)
        sizes = np.full(K, base, dtype=np.int64)
        sizes[:extra] += 1
        tile = np.repeat(np.arange(1, K + 1, dtype=np.int64), sizes)
        out = np.empty(n, dtype=np.int64)
        out[order] = tile
        return pd.DataFrame(
            {
                "event_id": eid,
                "event_type": g["event_type"].to_numpy(),
                "tile": out,
            }
        )

    return ds.groupby("event_type").map_groups(tiles, batch_format="pandas")


def q_percent_ranks(sf_dir):
    """PERCENT_RANK window parity, milli-quantized for bit-stability:
    per event_type, floor((rank-1)/(n-1) * 1000 + 0.5) over the cents
    order — RANK ties share a value, so the result is deterministic
    regardless of tie order; ranks come from one searchsorted per
    group."""
    ds = _read(
        sf_dir, "events", columns=["event_id", "event_type", "value"]
    )

    def pranks(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        n = len(cents)
        srt = np.sort(cents)
        rank = np.searchsorted(srt, cents, side="left") + 1
        if n > 1:
            pr = (rank - 1) / np.float64(n - 1)
        else:
            pr = np.zeros(1)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "event_type": g["event_type"].to_numpy(),
                "pr_milli": np.floor(pr * 1000 + 0.5).astype(np.int64),
            }
        )

    return ds.groupby("event_type").map_groups(pranks, batch_format="pandas")


def q_window_edges(sf_dir):
    """LEAD / FIRST_VALUE / LAST_VALUE window parity: per user in
    (ts, event_id) order, the next event's id (-1 for the last row —
    LEAD's default), the partition's first event id, and its last
    (SQL's LAST_VALUE needs the UNBOUNDED FOLLOWING frame; here the
    whole group is in hand, so it's just the sorted tail). One lexsort
    per group, no per-row Python."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = _Segs(g)
        n = len(s.u)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "next_event": pd.Series([], dtype=np.int64),
                    "first_event": pd.Series([], dtype=np.int64),
                    "last_event": pd.Series([], dtype=np.int64),
                }
            )
        nxt = np.concatenate((s.eid[1:], [-1])).astype(np.int64)
        seg_end = np.concatenate((s.starts[1:], [True]))
        nxt[seg_end] = -1  # LEAD default at each partition's last row
        end_idx = np.concatenate((s.start_idx[1:], [n])) - 1
        return pd.DataFrame(
            {
                "event_id": s.eid,
                "user_id": s.u,
                "next_event": nxt,
                "first_event": s.eid[s.start_idx][s.seg_id],
                "last_event": s.eid[end_idx][s.seg_id],
            }
        )

    return _window_buckets(ds, fold)


def q_cume_dists(sf_dir):
    """CUME_DIST window parity, milli-quantized for bit-stability: per
    event_type over the cents order, floor(cd * 1000 + 0.5) where
    cd = (# rows with value <= current) / n — one sort + searchsorted
    (side='right') per group."""
    ds = _read(
        sf_dir, "events", columns=["event_id", "event_type", "value"]
    )

    def cdists(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        srt = np.sort(cents)
        cd = np.searchsorted(srt, cents, side="right") / np.float64(
            len(cents)
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "event_type": g["event_type"].to_numpy(),
                "cd_milli": np.floor(cd * 1000 + 0.5).astype(np.int64),
            }
        )

    return ds.groupby("event_type").map_groups(cdists, batch_format="pandas")


def q_asof_join(sf_dir):
    """As-of join: each event matched to the latest hourly mark (first
    event of its type in the hour) at or before its timestamp. Ray side:
    broadcast-asof (searchsorted per batch, no shuffle); oracle: DuckDB
    ASOF JOIN."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "ts"])

    def to_us(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "event_type": df["event_type"].to_numpy(),
                "ts_us": df["ts"].astype("int64"),
            }
        )

    us = ds.map_batches(to_us, batch_format="pandas")

    # hourly marks: small aggregate (partial per batch, tiny groupby)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hour = df["ts_us"] // 3_600_000_000
        return (
            df.assign(hour=hour)
            .groupby(["event_type", "hour"])["ts_us"]
            .min()
            .reset_index()
            .rename(columns={"ts_us": "mark_us"})
        )

    marks = (
        us.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "hour"])
        .map_groups(
            lambda g: g.nsmallest(1, "mark_us")[["event_type", "mark_us"]],
            batch_format="pandas",
        )
        .to_pandas()
    )

    joined = relational.asof_join_broadcast(
        us, marks, "event_type", "ts_us", "mark_us"
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "mark_us": df["mark_us"].astype("int64"),
            }
        )

    return joined.map_batches(project, batch_format="pandas")


def q_windowed_counts(sf_dir):
    """Tumbling 1-hour event-time window per event_type."""
    return relational.windowed_agg(
        _read(sf_dir, "events"), "ts", "event_type", "value", 3_600_000_000
    )


# ---- engine round-trip gates (the whole codec path through SQL compare)


def q_encode_decode_documents(sf_dir):
    return roundtrip_dataset(_read(sf_dir, "documents"))


def q_encode_decode_zorder(sf_dir):
    """Z-ORDER BY clustering round-trip: documents encoded via the
    Morton-key global sort on (doc_id, n_chars), decoded back
    value-identical (the clustering changes LAYOUT, never content).
    The both-column pruning win is asserted in test_pruning.py."""
    import hashlib
    import os

    from ..codecs.registry import FORMAT_VERSION
    from .decode import decode_dataset
    from .encode import encode_job

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_zorder_v{FORMAT_VERSION}_{key}"
    if not os.path.exists(os.path.join(out, "_manifest")):
        encode_job(
            [f"{sf_dir}/documents.parquet"],
            out,
            mode="zorder",
            rows_per_chunk=512,
            bloom_columns=(),
            zorder_cols=("doc_id", "n_chars"),
        )
    return decode_dataset(out)


def q_encode_decode_deleted(sf_dir):
    """Tombstone-delete read path (pipelines/tombstone.py): encode the
    documents table, record a delete of every doc_id ending in 3 (a
    KB-scale tombstone file — no data rewritten), decode. The anti-
    filter must hide exactly those rows; the oracle states the same
    NOT-IN. The store is rebuilt per run (deletes mutate it), under
    /tmp per the scratch contract."""
    import hashlib
    import os
    import shutil

    from ..codecs.registry import FORMAT_VERSION
    from .decode import decode_dataset
    from .encode import encode_job
    from .tombstone import delete_where

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_tombstone_v{FORMAT_VERSION}_{key}"
    shutil.rmtree(out, ignore_errors=True)
    encode_job(
        [f"{sf_dir}/documents.parquet"],
        out,
        rows_per_chunk=512,
        bloom_columns=(),
    )
    n = _nrows(sf_dir, "documents")
    delete_where(out, "doc_id", list(range(3, n, 10)))
    return decode_dataset(out)


def q_upsert_snapshot(sf_dir):
    """Merge-on-write upsert into the encode store
    (pipelines/tombstone.py::upsert_files): encode the corpus, apply a
    deterministic crawl increment — every doc_id %5==0 page re-crawled
    with edited text, every %20==0 page appearing anew under id+10^6 —
    and decode. Old versions must be gone, new versions and new pages
    visible; the oracle states the same three-way UNION."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..codecs.registry import FORMAT_VERSION
    from .decode import decode_dataset
    from .encode import encode_job
    from .tombstone import upsert_files

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_upsert_v{FORMAT_VERSION}_{key}"
    shutil.rmtree(out, ignore_errors=True)
    encode_job(
        [f"{sf_dir}/documents.parquet"],
        out,
        rows_per_chunk=512,
        bloom_columns=(),
    )
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = docs.column("doc_id").to_numpy()
    changed = docs.filter(pa.array(ids % 5 == 0))
    changed = changed.set_column(
        changed.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise(changed.column("text"), " v2", ""),
    )
    new = docs.filter(pa.array(ids % 20 == 0))
    new = new.set_column(
        new.schema.get_field_index("doc_id"),
        "doc_id",
        pc.add(new.column("doc_id"), pa.scalar(1_000_000, pa.int64())),
    )
    new = new.set_column(
        new.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise(new.column("text"), " fresh page", ""),
    )
    inc_dir = tempfile.mkdtemp(prefix="pgr_upsert_inc_")
    inc = os.path.join(inc_dir, "increment-0.parquet")
    pq.write_table(
        pa.concat_tables([changed, new]), inc
    )
    upsert_files(out, [inc], key_col="doc_id", rows_per_chunk=512)
    return decode_dataset(out)


def q_apply_changelog(sf_dir):
    """CDC changelog apply (tombstone.apply_changelog): one batch
    carrying deletes (doc_id %10==7), re-crawls (%5==0, edited text)
    and new pages (%20==0 under id+10^6) lands on the store with
    batch-level exactly-once (content-hash marker; disjoint op key
    sets here, so order is immaterial). The oracle states the
    resulting corpus as a three-way UNION minus the deletes."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..codecs.registry import FORMAT_VERSION
    from .decode import decode_dataset
    from .encode import encode_job
    from .tombstone import apply_changelog

    import pyarrow.parquet as pq

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_cdc_v{FORMAT_VERSION}_{key}"
    shutil.rmtree(out, ignore_errors=True)
    encode_job(
        [f"{sf_dir}/documents.parquet"],
        out,
        rows_per_chunk=512,
        bloom_columns=(),
    )
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = docs.column("doc_id").to_numpy()
    changed = docs.filter(pa.array(ids % 5 == 0))
    changed = changed.set_column(
        changed.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise(changed.column("text"), " v2", ""),
    )
    new = docs.filter(pa.array(ids % 20 == 0))
    new = new.set_column(
        new.schema.get_field_index("doc_id"),
        "doc_id",
        pc.add(new.column("doc_id"), pa.scalar(1_000_000, pa.int64())),
    )
    new = new.set_column(
        new.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise(new.column("text"), " fresh page", ""),
    )
    ups = pa.concat_tables([changed, new])
    ups = ups.append_column(
        "op", pa.array(["upsert"] * ups.num_rows, pa.string())
    )
    dels = docs.filter(pa.array(ids % 10 == 7))
    dels = dels.append_column(
        "op", pa.array(["delete"] * dels.num_rows, pa.string())
    )
    log_dir = tempfile.mkdtemp(prefix="pgr_cdc_")
    logp = os.path.join(log_dir, "batch-0.parquet")
    pq.write_table(pa.concat_tables([ups, dels]), logp)
    apply_changelog(out, [logp], key_col="doc_id")
    return decode_dataset(out)


def q_encode_decode_events(sf_dir):
    return roundtrip_dataset(_read(sf_dir, "events"))


def q_encode_decode_lineitem(sf_dir):
    return roundtrip_dataset(_read(sf_dir, "lineitem"))


def q_parquet_native_read(sf_dir):
    """Wire-level parquet READER (file_.go / column.go:541-690 parity):
    lineitem.parquet — written by pyarrow — parsed and decoded entirely
    by our own thrift reader + page decoders (codecs/parquet_wire_read)
    as a distributed Ray Data source (one task per file), no pyarrow
    parquet in the loop. Oracle reads the same file with DuckDB;
    value-identical output proves the decoders consume foreign parquet
    wire bytes directly (the same corpus-level proof as the reference's
    golden-file suite, file_test.go:13-30)."""
    from ..sources.wire import read_parquet_native

    return read_parquet_native([f"{sf_dir}/lineitem.parquet"])


def q_seek_rows(sf_dir):
    """SeekToRow parity (column.go:127-149 / reader SeekToRow) as a
    distributed read: absolute rows [100, 350) of the documents table in
    file order, planned from footer row counts and narrowed in-task by
    the OffsetIndex when present. doc_id equals file position in the
    testdata, which gives this positional read an exact SQL oracle."""
    from ..sources.wire import read_parquet_native

    return read_parquet_native(
        [f"{sf_dir}/documents.parquet"],
        columns=["doc_id", "lang", "n_chars"],
        row_range=(100, 350),
    )


def q_parquet_wire_lists(sf_dir):
    """Wire-level rep/def level shredding for list columns
    (node.go:393-415 at the wire): embeddings (list<float>) exported as
    real parquet via our writer — 3-level schema, RLE rep/def streams,
    element values through the normal encoders — then read back by
    pyarrow's reader. Oracle reads the source directly."""
    import tempfile
    from pathlib import Path

    from .export import export_parquet_job

    out = tempfile.mkdtemp(prefix="pgr_wire_l_")
    export_parquet_job([f"{sf_dir}/embeddings.parquet"], out, resume=False)
    files = sorted(str(p) for p in Path(out).glob("*.parquet"))
    return ray.data.read_parquet(files)


def q_parquet_wire_roundtrip(sf_dir):
    """Wire-level parquet interop (writer.go:568-692 parity at the BYTE
    level): lineitem -> real .parquet files whose pages are produced by
    our own encoders and whose footer is our hand-rolled thrift compact
    serialization (codecs/parquet_wire) -> read back by pyarrow's
    parquet reader. Value-identical output proves any parquet reader —
    including the reference — decodes our encodings directly."""
    import tempfile
    from pathlib import Path

    from .export import export_parquet_job

    out = tempfile.mkdtemp(prefix="pgr_wire_")
    export_parquet_job([f"{sf_dir}/lineitem.parquet"], out, resume=False)
    files = sorted(str(p) for p in Path(out).glob("*.parquet"))
    return ray.data.read_parquet(files)


def q_encode_decode_embeddings(sf_dir):
    return roundtrip_dataset(_read(sf_dir, "embeddings"))


def q_encode_decode_nested(sf_dir):
    """Struct/map shredding round-trip with an exact SQL oracle: events
    columns are packed into a struct and a map column, run through the
    full encode->decode path (STRUCT/MAP structural codecs — per-field
    child chunks, no arrow_ipc fallback), then flattened back so the
    DuckDB hash compare proves bit-identity of the nested payload."""
    import pyarrow as pa

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value", "user_id"])

    def pack(t: pa.Table) -> pa.Table:
        evt = pa.StructArray.from_arrays(
            [t.column("event_type").combine_chunks(), t.column("value").combine_chunks()],
            ["etype", "val"],
        )
        m = pa.MapArray.from_arrays(
            pa.array(range(0, t.num_rows + 1), type=pa.int32()),
            pa.array(["user"] * t.num_rows),
            t.column("user_id").combine_chunks(),
        )
        return pa.table(
            {"event_id": t.column("event_id"), "evt": evt, "attrs": m}
        )

    def unpack(t: pa.Table) -> pa.Table:
        evt = t.column("evt").combine_chunks()
        attrs = t.column("attrs").combine_chunks()
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": evt.field("etype"),
                "value": evt.field("val"),
                "user_id": attrs.items,
            }
        )

    packed = ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
    return roundtrip_dataset(packed).map_batches(
        unpack, batch_format="pyarrow", zero_copy_batch=True
    )


def _mk_roundtrip(table):
    def q(sf_dir, _t=table):
        return roundtrip_dataset(_read(sf_dir, _t))

    return q


# one partitioned-join bucket targets this many rows of the BIG side, so
# per-task memory stays bounded as the data grows (round-2 verdict #3
# replaced the fixed 16-bucket fan-out)
JOIN_BUCKET_TARGET_ROWS = 250_000
# dim sides up to this many rows broadcast (two int64 arrays, 64 MB at
# the cap) instead of bucket-partitioning both join sides
JOIN_BROADCAST_LIMIT_ROWS = 4_000_000


def q_hash_join(sf_dir):
    """Partitioned hash join (both sides large — the guide's explicit
    bucket pattern): bucket = custkey % B on both sides, groupby(bucket),
    pandas merge within each bucket. No broadcast; only matching buckets
    co-locate. B is sized from the big side's row count (a metadata-only
    Dataset.count() on parquet), so one map_groups call materializes
    ~JOIN_BUCKET_TARGET_ROWS rows regardless of scale."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    B = max(16, -(-orders.count() // JOIN_BUCKET_TARGET_ROWS))

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (df["o_custkey"] % B).astype("int32")
        return df

    def tag_cust(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": -1,
                "o_custkey": df["c_custkey"].to_numpy(),
                "o_totalprice": 0.0,
                "c_name": df["c_name"].to_numpy(),
                "bucket": (df["c_custkey"] % B).astype("int32"),
            }
        )

    def tag_orders2(df: pd.DataFrame) -> pd.DataFrame:
        df = tag_orders(df)
        df["c_name"] = None
        return df[["o_orderkey", "o_custkey", "o_totalprice", "c_name", "bucket"]]

    both = orders.map_batches(tag_orders2, batch_format="pandas").union(
        cust.map_batches(tag_cust, batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["o_orderkey"] >= 0][["o_orderkey", "o_custkey", "o_totalprice"]]
        right = g[g["o_orderkey"] < 0][["o_custkey", "c_name"]].drop_duplicates(
            "o_custkey"
        )
        out = left.merge(right, on="o_custkey", how="inner")
        out["o_totalprice"] = out["o_totalprice"].round(2)
        return out[["o_orderkey", "o_custkey", "o_totalprice", "c_name"]]

    return both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")


def q_hash_join_broadcast(sf_dir):
    """Broadcast small-side join (the common dimension-table case): the
    customer side is `ray.put` once as a pandas lookup and merged inside
    each orders batch — the big side never shuffles at all. Use this
    form whenever the small side fits in a worker's heap; the
    partitioned q_hash_join is the fallback when both sides are large."""
    import ray as _ray

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust_df = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .to_pandas()
        .drop_duplicates("c_custkey")
        .rename(columns={"c_custkey": "o_custkey"})
    )
    cust_ref = _ray.put(cust_df)

    def join_batch(df: pd.DataFrame) -> pd.DataFrame:
        small = _ray.get(cust_ref)
        out = df.merge(small, on="o_custkey", how="inner")
        out["o_totalprice"] = out["o_totalprice"].round(2)
        return out[["o_orderkey", "o_custkey", "o_totalprice", "c_name"]]

    return orders.map_batches(join_batch, batch_format="pandas")


def q_spj_join(sf_dir):
    """Storage-partitioned join (pipelines/spj.py): orders and customer
    are each bucket-encoded on their custkey with the same bucketing
    spec (mode='bucket', hash(key) % 16), then equi-joined with ZERO
    shuffle — one task per bucket decodes both stores' bucket files and
    hash-joins locally. The write-time shuffle amortizes over every
    subsequent join on the key (the lakehouse SPJ pattern); the stores
    are cached per sf_dir so repeat queries exercise the join alone."""
    from .spj import storage_partitioned_join

    ds = storage_partitioned_join(
        _spj_store(sf_dir, "orders", "o_custkey"),
        _spj_store(sf_dir, "customer", "c_custkey"),
        "o_custkey",
        "c_custkey",
        left_columns=["o_orderkey", "o_custkey", "o_totalprice"],
        right_columns=["c_custkey", "c_name"],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("o_totalprice"),
            "o_totalprice",
            pc.round(t.column("o_totalprice"), 2),
        )
        return t.select(["o_orderkey", "o_custkey", "o_totalprice", "c_name"])

    return ds.map_batches(finish, batch_format="pyarrow")


def _spj_store(sf_dir: str, table: str, bucket_key: str) -> str:
    """Bucket-encode a testdata table once per sf_dir (num_buckets=16)."""
    import hashlib
    import os

    from ..codecs.registry import FORMAT_VERSION
    from .encode import encode_job

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_spj_{table}_v{FORMAT_VERSION}_{key}"
    if not os.path.exists(os.path.join(out, "_manifest")):
        encode_job(
            [f"{sf_dir}/{table}.parquet"],
            out,
            mode="bucket",
            bucket_key=bucket_key,
            num_buckets=16,
            rows_per_chunk=2048,
            bloom_columns=(),
        )
    return out


def q_spj_groupby(sf_dir):
    """GROUP BY the bucket key with ZERO shuffle
    (spj.storage_partitioned_groupby): the bucketed layout localizes
    every key to one bucket, so each task computes COMPLETE groups —
    the usual partial-aggregate-then-merge collapses to one stage with
    no exchange at all."""
    from .spj import storage_partitioned_groupby

    ds = storage_partitioned_groupby(
        _spj_store(sf_dir, "orders", "o_custkey"),
        [("o_orderkey", "count"), ("o_orderkey", "min"), ("o_orderkey", "max")],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["o_custkey", "n_orders", "min_ok", "max_ok"])
        return t.set_column(
            1, "n_orders", t.column("n_orders").cast(pa.int64())
        )

    return ds.map_batches(finish, batch_format="pyarrow")


def q_json_props_extract(sf_dir):
    """Extract the integer k from the JSON props column (vectorized
    regex on both sides — no JSON library dependency)."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        k = (
            df["props"]
            .str.extract(r'"k":\s*(\d+)', expand=False)
            .astype("float64")
        )
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(),
                "k": k.fillna(-1).astype("int64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


# ---- encoded-store access paths (stats pruning + bloom lookup)


def _doc_store(sf_dir: str) -> str:
    """Encode the documents table into a cached chunk store (once per
    sf_dir) with stats + bloom sidecars on doc_id."""
    import hashlib

    from ..codecs.registry import FORMAT_VERSION
    from .encode import encode_job

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    # m2 = manifest schema with per-chunk sums (vsum)
    out = f"/tmp/graft_docstore_m2_v{FORMAT_VERSION}_{key}"
    encode_job(
        [f"{sf_dir}/documents.parquet"],
        out,
        rows_per_chunk=512,
        bloom_columns=("doc_id",),
    )
    return out


def q_search_pruned_store(sf_dir):
    """Search/Find parity on the encoded store: chunk-stats pruning +
    residual filter (search.go:6-116 over ColumnIndex-style stats)."""
    from .decode import decode_dataset_pruned

    return decode_dataset_pruned(_doc_store(sf_dir), "n_chars", 100, 300)


def q_store_group_count(sf_dir):
    """GROUP BY COUNT evaluated in the ENCODED domain
    (pipelines/agg.group_count_store): dictionary codes are bincounted
    per chunk — row values never materialize, only each chunk's
    dictionary does — and only (value, count) partials shuffle. The
    low-cardinality case where min/max stats cannot prune but the
    encoded domain answers the whole query."""
    from .agg import group_count_store

    return group_count_store(
        _doc_store(sf_dir), "lang", out_value="lang", out_count="n"
    )


def q_store_agg_meta(sf_dir):
    """Metadata-only aggregate (pipelines/agg.aggregate_meta): COUNT /
    COUNT(col) / MIN / MAX for a numeric column folded from the
    manifest's per-chunk stats — no chunk file is opened at all (the
    ColumnIndex-as-aggregate-index trick, column_index.go:259-272)."""
    from .agg import aggregate_meta

    return aggregate_meta(_doc_store(sf_dir), "n_chars")


def q_store_distinct(sf_dir):
    """SELECT DISTINCT from chunk dictionaries (agg.distinct_store):
    chunk-local dictionaries ARE their chunks' distinct sets, so neither
    the index streams nor any row value decodes; only per-task distinct
    values shuffle."""
    from .agg import distinct_store

    return distinct_store(_doc_store(sf_dir), "lang", out_value="lang")


def q_store_agg_range(sf_dir):
    """Filtered aggregate with zone-map short-circuiting
    (agg.aggregate_range): interior chunks (doc_id range fully inside
    the predicate — the store is doc_id-ordered, so most are) answer
    from manifest (n, vsum) stats; only the two boundary chunks decode,
    reading just the two columns. COUNT and SUM exact."""
    from .agg import aggregate_range

    n = _nrows(sf_dir, "documents")
    return aggregate_range(
        _doc_store(sf_dir), "n_chars", "doc_id", n // 10, (n * 9) // 10
    )


def q_text_index_search(sf_dir):
    """Inverted-index conjunctive search (pipelines/textindex.py): the
    postings live in a token-bucketed encode store, so the query opens
    ONLY the two queried tokens' hash buckets, decodes only chunks whose
    token dictionary/stats admit a match, and merges doc_id counts —
    corpus text never moves. Index cached per sf_dir; the oracle states
    the same space-delimited token membership in SQL."""
    from .textindex import search_docs

    return search_docs(_text_index(sf_dir), ["scan", "column"])


def _text_index(sf_dir: str) -> str:
    """Build (once per sf_dir) the cached inverted index over the
    documents table. i3 = positional postings schema (tf+dl+pos)."""
    import hashlib
    import os

    from ..codecs.registry import FORMAT_VERSION
    from .textindex import build_text_index

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_txtidx_i3_v{FORMAT_VERSION}_{key}"
    if not os.path.exists(os.path.join(out, "_manifest")):
        build_text_index([f"{sf_dir}/documents.parquet"], out, num_buckets=16)
    return out


def q_text_index_phrase(sf_dir):
    """Exact phrase search from POSITIONAL postings
    (textindex.phrase_docs): per-doc position lists ride the posting
    rows, so "part filter" matches only docs where the split-pieces are
    CONSECUTIVE — the tokens' two hash buckets are the only I/O, and the
    adjacency verify shuffles just the candidate docs' posting rows.
    The oracle states the same adjacency as a single-space LIKE (the
    tokenizer is exact single-space split, so piece adjacency == one
    literal space between the words)."""
    from .textindex import phrase_docs

    return phrase_docs(_text_index(sf_dir), "part filter")


def q_text_index_near(sf_dir):
    """Proximity search from the positional index
    (textindex.near_docs): docs where 'scan' and 'filter' occur within
    3 split-piece positions of each other, either order — two hash
    buckets of I/O, per-candidate verify via one binary search per
    occurrence. Oracle: DuckDB zipped unnest/generate_subscripts
    positions (1-based there, 0-based here — gaps are identical)."""
    from .textindex import near_docs

    return near_docs(_text_index(sf_dir), "scan", "filter", window=3)


def q_store_pattern_prefix(sf_dir):
    """LIKE 'src1%' evaluated in the store's DICTIONARY domain
    (decode.search_pattern): the prefix kernel runs over each chunk's
    ~20 distinct source values, never its rows, and [vmin, vmax] stats
    pre-prune chunks to the [needle, next-prefix) range driver-side
    (a no-op on this unclustered store; the clustered case is
    pytest-asserted with never-opened files)."""
    from .decode import search_pattern

    return search_pattern(
        _doc_store(sf_dir),
        "source",
        "prefix",
        "src1",
        columns=["doc_id", "source"],
    )


def q_store_pattern_suffix(sf_dir):
    """LIKE '%3' through the same dictionary-domain pattern path —
    suffix has no order relation for stats, so this exercises the
    pure late-materialization case."""
    from .decode import search_pattern

    return search_pattern(
        _doc_store(sf_dir),
        "source",
        "suffix",
        "3",
        columns=["doc_id", "source"],
    )


def q_derived_column(sf_dir):
    """Derived-column FAMILY (pipelines/derive.py): a token-count
    column is backfilled onto the cached document store WITHOUT
    rewriting it — per-shard tasks decode only `text`, encode the new
    column as parallel chunk files with the base's chunk_ids — and the
    zip read emits (doc_id, n_tokens) with no join and no shuffle.
    Resume-skips on the cached store, so only the first run derives."""
    from .derive import add_derived_column, decode_with_family

    store = _doc_store(sf_dir)

    def n_tokens(t: pa.Table) -> pa.Array:
        return pc.list_value_length(
            pc.split_pattern(t.column("text").combine_chunks(), pattern=" ")
        ).cast(pa.int64())

    add_derived_column(store, "ntok", "n_tokens", n_tokens, ["text"])
    return decode_with_family(
        store, families=["ntok"], columns=["doc_id", "n_tokens"]
    )


def q_store_merge_sorted(sf_dir):
    """Range-planned merge of two sorted stores into one globally
    sorted store (pipelines/merge_store.py — the LSM level merge,
    merge.go:84-99 re-planned as disjoint key ranges with ZERO
    all-to-all): the driver cuts row-balanced ranges from manifest
    [vmin, vmax, n] stats alone, each range task reads only its
    chunk-id-filtered intersection from both inputs and commits one
    ordered output shard. The oracle checks content; global order is
    pytest-asserted (the hash compare is order-insensitive by
    design)."""
    from .merge_store import read_merged_sorted

    return read_merged_sorted(_merged_doc_store(sf_dir))


def q_merge_ingest(sf_dir):
    """LSM minor ingest (merge_store.merge_into): the even half of
    documents is range-merged on n_chars, then the odd half routes
    into the EXISTING ranges as a generation of shards — base shards
    never rewritten, bounds frozen — and the read merges generations
    in-task. Content must equal the whole table; global order is
    pytest-asserted."""
    import hashlib
    import os
    import shutil

    from ..codecs.registry import FORMAT_VERSION
    from .encode import encode_job
    from .merge_store import merge_into, merge_sorted_stores, read_merged_sorted

    import pyarrow.parquet as pq

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    base = f"/tmp/graft_lsmingest_v{FORMAT_VERSION}_{key}"
    merged = f"{base}/merged"
    if not os.path.exists(os.path.join(base, "_done")):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        docs = pq.read_table(f"{sf_dir}/documents.parquet")
        ids = docs.column("doc_id").to_numpy()
        stores = {}
        for tag, m in (("even", ids % 2 == 0), ("odd", ids % 2 == 1)):
            part = docs.filter(pa.array(m))
            src = f"{base}/{tag}.parquet"
            pq.write_table(part, src)
            stores[tag] = f"{base}/{tag}_store"
            encode_job(
                [src], stores[tag], rows_per_chunk=512, bloom_columns=()
            )
        merge_sorted_stores(
            [stores["even"]], merged, "n_chars",
            num_ranges=12, extra_sort_keys=("doc_id",),
        )
        merge_into(merged, [stores["odd"]])
        open(os.path.join(base, "_done"), "w").write("ok")
    return read_merged_sorted(merged)


def q_merged_groupby(sf_dir):
    """Zero-shuffle GROUP BY on the range-merged store
    (merge_store.groupby_merged_store): the merge put every n_chars
    value in exactly one range shard, so shard tasks emit COMPLETE
    groups — the range-partitioned sibling of spj_groupby."""
    from .merge_store import groupby_merged_store

    ds = groupby_merged_store(
        _merged_doc_store(sf_dir),
        [("doc_id", "count"), ("doc_id", "sum")],
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["n_chars", "n_docs", "sum_ids"])
        return t.set_column(1, "n_docs", t.column("n_docs").cast(pa.int64()))

    return ds.map_batches(finish, batch_format="pyarrow")


def _merged_doc_store(sf_dir: str) -> str:
    """Cached per sf_dir: documents split even/odd, each half sorted by
    n_chars, encoded, then range-merged on n_chars."""
    import hashlib
    import os
    import shutil

    from ..codecs.registry import FORMAT_VERSION
    from .encode import encode_job
    from .merge_store import merge_sorted_stores

    import pyarrow.parquet as pq

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    base = f"/tmp/graft_mrgstore_v{FORMAT_VERSION}_{key}"
    merged = f"{base}/merged"
    if not os.path.exists(os.path.join(merged, "_manifest")):
        shutil.rmtree(base, ignore_errors=True)
        docs = pq.read_table(f"{sf_dir}/documents.parquet")
        ids = docs.column("doc_id").to_numpy()
        halves = []
        for tag, m in (("even", ids % 2 == 0), ("odd", ids % 2 == 1)):
            part = docs.filter(pa.array(m)).sort_by(
                [("n_chars", "ascending")]
            )
            os.makedirs(base, exist_ok=True)
            src = f"{base}/{tag}.parquet"
            pq.write_table(part, src)
            store = f"{base}/{tag}_store"
            encode_job([src], store, rows_per_chunk=512, bloom_columns=())
            halves.append(store)
        merge_sorted_stores(halves, merged, "n_chars", num_ranges=16)
    return merged


def q_range_join_copart(sf_dir):
    """Zero-shuffle join of CO-RANGE-PARTITIONED stores
    (merge_store.range_join): customer is range-merged on c_custkey,
    orders is range-merged REUSING customer's recorded bounds, so equal
    keys live in co-indexed shards and each shard pair Acero-joins
    locally — no exchange at query time, completing the range-layout
    trilogy (ordered scan, zero-shuffle groupby, zero-shuffle join)."""
    import hashlib
    import os
    import shutil

    from ..codecs.registry import FORMAT_VERSION
    from ..state import manifest
    from .encode import encode_job
    from .merge_store import merge_sorted_stores, range_join

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    base = f"/tmp/graft_rjoin_v{FORMAT_VERSION}_{key}"
    cm, om = f"{base}/cust_m", f"{base}/ord_m"
    if not os.path.exists(os.path.join(om, "_manifest")):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        cs, osrc = f"{base}/cust_store", f"{base}/ord_store"
        encode_job(
            [f"{sf_dir}/customer.parquet"], cs,
            rows_per_chunk=512, bloom_columns=(),
        )
        encode_job(
            [f"{sf_dir}/orders.parquet"], osrc,
            rows_per_chunk=512, bloom_columns=(),
        )
        merge_sorted_stores([cs], cm, "c_custkey", num_ranges=8)
        bounds = (manifest.load_job_meta(cm) or {})["bounds"]
        merge_sorted_stores([osrc], om, "o_custkey", bounds=bounds)
    return range_join(
        om,
        cm,
        left_columns=["o_orderkey", "o_custkey"],
        right_columns=["c_name"],
    )


def q_family_range_scan(sf_dir):
    """Range predicate on a BACKFILLED column, pruned by the family's
    own manifest stats (derive.search_family_range): chunk groups whose
    n_tokens [vmin, vmax] cannot reach [40, 60] skip BOTH their family
    and their base chunks; survivors zip + residual-filter. Reuses the
    derived_column family (resume-built once per sf_dir)."""
    from .derive import add_derived_column, search_family_range

    store = _doc_store(sf_dir)

    def n_tokens(t: pa.Table) -> pa.Array:
        return pc.list_value_length(
            pc.split_pattern(t.column("text").combine_chunks(), pattern=" ")
        ).cast(pa.int64())

    add_derived_column(store, "ntok", "n_tokens", n_tokens, ["text"])
    return search_family_range(
        store, "ntok", lo=40, hi=60, columns=["doc_id", "n_tokens"]
    )


_TAKE_ROWS_IDX = [0, 17, 99, 123, 250, 333, 401, 499]


def q_store_topk(sf_dir):
    """ORDER BY n_chars DESC LIMIT 100 with STATS pruning
    (decode.topk_store): chunk vmin stats establish a lower bound on
    the 100th value, chunks whose vmax can't reach it never open
    (clustered-store chmod pytest), survivors emit k-bounded partials."""
    from .decode import topk_store

    return topk_store(
        _doc_store(sf_dir),
        "n_chars",
        100,
        columns=["doc_id", "n_chars"],
        tiebreak="doc_id",
    )


def q_store_median(sf_dir):
    """Exact MEDIAN answered from the encode store with STATS pruning
    (decode.quantile_store): the bracketing ranks are located from
    manifest (n, n_null, vmin, vmax) rows alone, chunks guaranteed
    entirely below/above them never open, and only the target column
    decodes from survivors. On a store clustered by the column the
    candidate set is O(1) chunks (chmod-000 pytest,
    test_quantile_store.py); this gate runs it on the doc_id-ordered
    store, where it stays exact and simply prunes less."""
    from .decode import quantile_store

    return quantile_store(_doc_store(sf_dir), "n_chars", 0.5, out_name="med_chars")


def q_store_histogram(sf_dir):
    """Exact fixed-width histogram answered from the encode store with
    zone-map short-circuiting (agg.histogram_store): chunks whose
    [vmin, vmax] fit one bucket contribute manifest counts without
    decoding; only straddling chunks decode one column. Clustered-store
    chmod-000 proof in test_quantile_store.py's sibling test file."""
    import ray.data as _rd

    from .agg import histogram_store

    return _rd.from_arrow(histogram_store(_doc_store(sf_dir), "n_chars", 100))


def q_store_take_rows(sf_dir):
    """Scattered global-position reads on the encode store
    (decode.take_rows — SeekToRow generalized to an index set):
    positions map through manifest cumulative row counts, only hit
    chunks' files open. doc_id equals store position on this table,
    giving the positional read an exact SQL oracle."""
    from .decode import take_rows

    return take_rows(
        _doc_store(sf_dir),
        _TAKE_ROWS_IDX,
        columns=["doc_id", "lang", "n_chars"],
    )


def q_audio_features_raw(sf_dir):
    """RAW-audio windowed features — the NO-stub multimodal audio path
    (stages/multimodal.RawAudioFeaturizer): payloads are real PCM16-LE
    sample streams built deterministically from the doc text bytes
    (byte pairs = samples), featurized into per-window RMS + zero-
    crossing rate in integer millis, one row per window (rows-only:
    PCM bytes aren't SQL-expressible; the kernel is pinned by
    hand-computed windows in pytest). Completes the image/video/audio
    no-stub triad."""
    from ..stages.multimodal import RawAudioFeaturizer

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_pcm(df: pd.DataFrame) -> pd.DataFrame:
        payloads = []
        for t in df["text"]:
            b = t.encode()[:2048]
            payloads.append(b[: len(b) - (len(b) % 2)])
        return pd.DataFrame(
            {
                "media_id": df["doc_id"].astype("int64"),
                "payload": payloads,
                "sample_rate": pd.array([8000] * len(df), dtype="int64"),
            }
        )

    return ds.map_batches(to_pcm, batch_format="pandas").map_batches(
        RawAudioFeaturizer,
        fn_constructor_kwargs={"window": 64},
        batch_format="pandas",
        batch_size=256,
        concurrency=autoscale_concurrency(),
    )


def q_query_router_membership(sf_dir):
    """One scan() entry point routes each predicate to the store's
    cheapest access path (pipelines/query.py): lang has no bloom
    sidecar, so ("in", [fr, zh]) routes to the dictionary domain —
    explain() reports the chosen path, pytest asserts the routing
    table."""
    from .query import scan

    return scan(
        _doc_store(sf_dir),
        "lang",
        ("in", ["fr", "zh"]),
        columns=["doc_id", "lang", "n_chars"],
    )


def q_query_router_point(sf_dir):
    """The same scan() with ("==", doc_id) routes through the BLOOM
    sidecars (the store blooms doc_id), probing only (column, bloom)
    rows before any payload decode."""
    from .query import scan

    return scan(_doc_store(sf_dir), "doc_id", ("==", 123))


def q_derived_multi(sf_dir):
    """Multi-column family (derive.add_derived_columns): ONE decode
    pass over text backfills (tok_cnt, space_cnt) together — the way a
    pipeline attaches several quality axes without re-reading the
    corpus per column."""
    from .derive import add_derived_columns, decode_with_family

    store = _doc_store(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        txt = t.column("text").combine_chunks()
        toks = pc.split_pattern(txt, pattern=" ")
        return pa.table(
            {
                "tok_cnt": pc.list_value_length(toks).cast(pa.int64()),
                "space_cnt": pc.subtract(
                    pc.utf8_length(txt),
                    pc.utf8_length(
                        pc.replace_substring(txt, pattern=" ", replacement="")
                    ),
                ).cast(pa.int64()),
            }
        )

    add_derived_columns(store, "txtstats", ["tok_cnt", "space_cnt"], stats, ["text"])
    return decode_with_family(
        store,
        families=["txtstats"],
        columns=["doc_id", "tok_cnt", "space_cnt"],
    )


def q_query_router_derived(sf_dir):
    """scan() on a DERIVED column: n_tokens lives in the 'ntok' family
    (backfilled by q_derived_column), so ("between", 30, 50) routes to
    family_stats — the family's own manifest prunes, then base+family
    zip for the survivors. One query API over physical and backfilled
    columns alike."""
    from .derive import add_derived_column
    from .query import scan

    store = _doc_store(sf_dir)

    def n_tokens(t: pa.Table) -> pa.Array:
        return pc.list_value_length(
            pc.split_pattern(t.column("text").combine_chunks(), pattern=" ")
        ).cast(pa.int64())

    add_derived_column(store, "ntok", "n_tokens", n_tokens, ["text"])
    return scan(
        store, "n_tokens", ("between", 30, 50), columns=["doc_id", "n_tokens"]
    )


def q_store_pattern_regex(sf_dir):
    """Unanchored RE2 match through the dictionary-domain pattern path —
    both engines (pyarrow and DuckDB) compile the identical RE2, so the
    oracle is exact."""
    from .decode import search_pattern

    return search_pattern(
        _doc_store(sf_dir),
        "source",
        "regex",
        "^src1[0-9]$",
        columns=["doc_id", "source"],
    )


def _null_store(sf_dir: str) -> str:
    """documents with lang nullified where doc_id % 7 == 0, encoded into
    a cached chunk store — the fixture for null-statistics pushdown
    (the driver tables themselves carry no NULLs)."""
    import hashlib
    import os

    from ..codecs.registry import FORMAT_VERSION
    from .encode import encode_job

    import pyarrow.parquet as pq

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_nullstore_v{FORMAT_VERSION}_{key}"
    if not os.path.exists(os.path.join(out, "_manifest")):
        t = pq.read_table(f"{sf_dir}/documents.parquet")
        ids = t.column("doc_id").to_numpy()
        nullify = pa.array(ids % 7 == 0)
        li = t.schema.get_field_index("lang")
        t = t.set_column(
            li,
            "lang",
            pc.if_else(
                nullify,
                pa.nulls(len(t), t.column("lang").type),
                t.column("lang").combine_chunks(),
            ),
        )
        src = f"{out}.src.parquet"
        pq.write_table(t, src)
        encode_job([src], out, rows_per_chunk=512)
    return out


def q_store_null_scan(sf_dir):
    """IS NULL answered from null-count statistics (decode.isnull_scan):
    n_null == 0 chunks never open, n_null == n chunks match wholesale,
    boundary chunks resolve from the header validity bitmap — the lang
    payload itself is never decoded on any path."""
    from .decode import isnull_scan

    return isnull_scan(_null_store(sf_dir), "lang", columns=["doc_id"])


def q_text_index_bm25(sf_dir):
    """BM25 ranking computed from the inverted index ALONE
    (textindex.search_ranked): tf/dl ride the postings, df is the
    bucket-local posting count, (n_docs, dl_sum) come from the index
    meta — the corpus is never read at query time. Integer-exact
    against the same SQL oracle as the corpus-side bm25_scores, which
    is the real check: index-derived statistics reproduce the
    corpus-wide computation bit-for-bit."""
    from .textindex import search_ranked

    return search_ranked(
        _text_index(sf_dir), ["column", "join", "merge", "order", "scan"]
    )


def q_text_index_update(sf_dir):
    """Incremental index maintenance (textindex.update_text_index):
    build the index, apply a deterministic crawl increment (every
    doc_id %5==0 re-crawled with edited text, every %20==0 appearing
    anew under id+10^6), then BM25-rank over the UPDATED index. The
    oracle states the same BM25 over the updated corpus in SQL, so a
    hash match proves the merge-on-write update (probe -> tombstone ->
    layout-preserving purge -> generation append -> meta delta) leaves
    the index integer-identical to a fresh rebuild."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..codecs.registry import FORMAT_VERSION
    from .textindex import build_text_index, search_ranked, update_text_index

    import pyarrow.parquet as pq

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_txtupd_v{FORMAT_VERSION}_{key}"
    shutil.rmtree(out, ignore_errors=True)
    build_text_index([f"{sf_dir}/documents.parquet"], out, num_buckets=16)
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = docs.column("doc_id").to_numpy()
    changed = docs.filter(pa.array(ids % 5 == 0))
    changed = changed.set_column(
        changed.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise(changed.column("text"), " v2 scan", ""),
    )
    new = docs.filter(pa.array(ids % 20 == 0))
    new = new.set_column(
        new.schema.get_field_index("doc_id"),
        "doc_id",
        pc.add(new.column("doc_id"), pa.scalar(1_000_000, pa.int64())),
    )
    new = new.set_column(
        new.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise(new.column("text"), " fresh page column", ""),
    )
    inc_dir = tempfile.mkdtemp(prefix="pgr_txtinc_")
    inc = os.path.join(inc_dir, "inc-0.parquet")
    pq.write_table(pa.concat_tables([changed, new]), inc)
    update_text_index(out, [inc])
    return search_ranked(out, ["column", "join", "merge", "order", "scan"])


def q_text_semantic_pairs(sf_dir):
    """Raw text -> hashing-trick embeddings -> exact cosine near-dup
    pairs: the complete model-free semantic-dedup pipeline (rows-only:
    float embeddings are not SQL-expressible; the kernel and the
    composition each have planted-corpus pytests)."""
    return similarity.text_semantic_pairs(
        _read_split(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.8,
    )


def q_pack_sequences(sf_dir):
    """Training-sequence packing: docs folded into 256-token sequences
    (big+smalls, deterministic per contiguous id-range bucket). The
    per-doc token counts are SQL-checkable; the bin assignment is bin
    packing, not SQL — so the oracle checks (doc_id, n_tokens) and the
    packing invariants (fill <= cap, one seq per doc, layout
    independence) are pytest-asserted."""
    from .lm import pack_sequences

    out = pack_sequences(
        _read_split(sf_dir, "documents", columns=["doc_id", "text"]),
        max_tokens=256,
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_id", "n_tokens"]]

    return out.map_batches(project, batch_format="pandas")


MIX_RATES = {"src0": 2.5, "src13": 0.25}


def q_mix_corpora(sf_dir):
    """Weighted domain mixing (DoReMi/Pile-style training mixture):
    src0 upsampled 2.5x (2 full epochs + a half), src13 downsampled 4x,
    every other source passed through once. One output row per emitted
    copy — (doc_id, source, epoch) — a pure function of doc_id, so the
    mixture is rerun/layout/cluster-size invariant. Map-only, zero
    shuffle (lm.py::mix_corpora)."""
    from .lm import mix_corpora

    return mix_corpora(_read(sf_dir, "documents"), MIX_RATES)


def q_shuffle_train_order(sf_dir):
    """Deterministic global shuffle (training-order prep): sort by a
    keyed hash of doc_id — order is a pure function of (ids, seed),
    identical across cluster sizes and block layouts. The gate uses the
    SQL-expressible knuth32 key so DuckDB verifies the key values;
    the layout-independence of the ORDER itself is pytest-asserted
    (hash compare is order-insensitive by design)."""
    from .relational import deterministic_shuffle

    return deterministic_shuffle(
        _read_split(sf_dir, "documents", columns=["doc_id", "source"]),
        seed=7,
        key="knuth32",
    )


def q_search_dict_domain(sf_dir):
    """Membership search evaluated in the store's DICTIONARY domain
    (late materialization — page.Dictionary-style, page.go): lang codes
    tested as ints, zero-match chunk groups never decode their other
    columns. The case stats pruning can't touch: every chunk's
    lang range spans the predicate."""
    from .decode import search_dict_domain

    return search_dict_domain(
        _doc_store(sf_dir),
        "lang",
        ["en", "de"],
        columns=["doc_id", "lang", "n_chars"],
    )


def q_point_lookup_bloom(sf_dir):
    """Bloom-sidecar point lookup on the encoded store (bloom.go:16-55)."""
    from .decode import point_lookup

    return point_lookup(_doc_store(sf_dir), "doc_id", [5, 105, 205])


# ---- wire-level page index / bloom access paths


def _wire_store(
    sf_dir: str,
    table: str,
    sort_col: str | None = None,
    bloom_cols: tuple[str, ...] = (),
    page_rows: int = 1024,
) -> str:
    """Cached wire export (once per sf_dir+config) carrying page
    indexes (+ optional sorting metadata / bloom sidecars)."""
    import hashlib

    from .export import export_parquet_job

    key = hashlib.sha1(
        f"{sf_dir}|{table}|{sort_col}|{bloom_cols}|{page_rows}".encode()
    ).hexdigest()[:10]
    out = f"/tmp/graft_wirestore_{key}"
    export_parquet_job(
        [f"{sf_dir}/{table}.parquet"],
        out,
        page_rows=page_rows,
        sorting_columns=[(sort_col, False, False)] if sort_col else None,
        bloom_columns=bloom_cols,
        resume=True,
    )
    return out


def q_wire_page_index_range(sf_dir):
    """Range predicate over a sorted wire export, answered through the
    file's own ColumnIndex/OffsetIndex: only pages whose [min, max]
    intersects the range are decoded (search.go:6-116 pruning at wire
    level; index write parity with writer.go:1291-1330). One Ray task
    per exported file."""
    import glob as _glob

    from ..sources.wire import read_parquet_native

    store = _wire_store(sf_dir, "orders", sort_col="o_orderkey")
    files = sorted(_glob.glob(f"{store}/*.parquet"))
    ds = read_parquet_native(
        files,
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
        range_filter=("o_orderkey", 1000, 1999),
    )

    def fix(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["o_totalprice"] = df["o_totalprice"].round(2)
        return df

    return ds.map_batches(fix, batch_format="pandas")


def q_wire_bloom_lookup(sf_dir):
    """Point lookup over a wire export with standard split-block bloom
    sidecars (bloom.go:99-117 / bloom/block.go:17-28): files whose
    filters exclude every probe key are never read beyond the footer."""
    import glob as _glob

    from ..sources.wire import read_parquet_native

    store = _wire_store(sf_dir, "documents", bloom_cols=("doc_id",))
    files = sorted(_glob.glob(f"{store}/*.parquet"))
    return read_parquet_native(
        files,
        columns=["doc_id", "n_chars"],
        point_filter=("doc_id", [5, 105, 205, 99999999]),
    )


# ---- text analysis


def q_token_counts(sf_dir):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "tokens": ftext.token_counts(t.column("text")),
            }
        )

    return relational.transform(ds, fn)


def q_quality_scores(sf_dir):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        stats = ftext.char_stats(t.column("text"))
        return pa.table({"doc_id": t.column("doc_id"), **stats})

    return relational.transform(ds, fn)


def q_fingerprint_winnow(sf_dir):
    """Winnowing (rolling k-gram hash) document fingerprints — the
    SIGMOD'03 scheme: sliding-window minima of rolling hashes, distinct
    per doc (rows-only: not SQL-expressible). Returns per-doc
    fingerprint count + order-insensitive 64-bit digest."""
    from ..functions import hashing

    ds = _read_split(sf_dir, "documents")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        fps = hashing.winnow_fingerprints([t.encode() for t in df["text"]])
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_fp": np.array([len(f) for f in fps], dtype=np.int64),
                "digest": hashing.winnow_digest(fps).view(np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def q_fingerprint_docs(sf_dir):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "fp": ftext.md5_fingerprints(list(df["text"])),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def q_lang_id(sf_dir):
    """N-gram-heuristic language ID (rows-only check: heuristic output)."""
    import duckdb

    sample = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 40"
    ).df()
    samples = {lang: list(g["text"]) for lang, g in sample.groupby("lang")}
    model_ref = ray.put(ftext.NgramLanguageID(samples))

    class Predict:
        def __init__(self):
            self.model = ray.get(model_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(),
                    "lang_pred": self.model.predict(list(df["text"])),
                }
            )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(Predict, batch_format="pandas", concurrency=autoscale_concurrency())


# ---- dedup family (rows-only where not SQL-expressible)


def _nrows(sf_dir: str, table: str) -> int:
    """Row-count hint from parquet metadata (footer-only read)."""
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def q_minhash_lsh_pairs(sf_dir):
    return dedup.minhash_lsh_pairs(
        _read_split(sf_dir, "documents"),
        jaccard_threshold=0.5,
        n_docs_hint=_nrows(sf_dir, "documents"),
    )


def q_stratified_sample(sf_dir):
    """Deterministic per-group corpus subsampling (the training-data
    'take N docs per language' step): the N lowest doc_ids per lang.
    Scale shape: a vectorized per-batch partial top-N bounds the
    shuffle to N rows per (group, block) before the groupby — the
    same partial-aggregate discipline as agg_pricing."""
    N = 20
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values("doc_id").groupby("lang", as_index=False).head(N)

    def final(part: pd.DataFrame) -> pd.DataFrame:
        return part.sort_values("doc_id").head(N)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def q_vocab_topk(sf_dir):
    """Corpus vocabulary statistics (the training-data 'build the token
    frequency table' step): top-100 whitespace tokens by count, ties by
    token. Scale shape: vectorized per-batch value_counts partials
    (bounded by per-batch vocab), one groupby(token) sum over partial
    rows — token counts, never token instances, ride the shuffle — then
    a sort+limit over the vocab-sized count table."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ").explode()
        toks = toks[toks != ""]
        vc = toks.value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str), "cnt": vc.to_numpy().astype(np.int64)}
        )

    # hash-partitioned merge: ONE vectorized pandas groupby per
    # partition, not one map_groups Python call per token (at web-scale
    # vocab that is 10^8 per-group calls)
    P = 64

    def add_pt(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import stable_hash_strings

        df = df.copy()
        df["pt"] = (
            stable_hash_strings(df["token"].to_numpy()) % np.uint64(P)
        ).astype(np.int64)
        return df

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("token", as_index=False)["cnt"].sum()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_pt, batch_format="pandas")
        .groupby("pt")
        .map_groups(merge, batch_format="pandas")
    )
    top = counts.sort(["cnt", "token"], descending=[True, False]).limit(100)
    return top


def q_token_counts_bpe(sf_dir):
    """Token counting with a GPT-2-style BPE pretokenizer regex
    (contraction suffixes, letter runs, digit runs, punctuation runs,
    whitespace runs) — the 'BPE-ish' counterpart to the plain word-run
    counter; both engines evaluate the identical RE2 pattern."""
    PAT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+| +"
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "tokens": pc.cast(
                    pc.count_substring_regex(t.column("text"), PAT), pa.int64()
                ),
            }
        )

    return relational.transform(ds, fn)


def q_agg_stats(sf_dir):
    """Grouped second-moment aggregation (count/avg/stddev): mergeable
    (n, sum, sum-of-squares) partials per batch, one small groupby —
    the combiner discipline extended beyond sums to variance."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].astype(float)
        g = df.assign(v=v, v2=v * v).groupby("event_type", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), s2=("v2", "sum")
        )
        return g

    def final(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum")
        )
        n = g["n"].astype(float)
        mean = g["s"] / n
        var = (g["s2"] - n * mean * mean) / (n - 1)
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n": g["n"].astype(np.int64),
                "avg_v": mean.round(2),
                "sd_v": np.sqrt(var).round(2),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(final, batch_format="pandas")
    )


def q_normalize_text(sf_dir):
    """C4-style text normalization: lowercase, strip non-alphanumerics,
    collapse whitespace runs, trim. Pure RE2 Arrow kernels (pyarrow and
    DuckDB both compile RE2, so the regex semantics match exactly);
    zero-copy batches, no shuffle."""
    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t.column("text"))
        s = pc.replace_substring_regex(s, pattern="[^a-z0-9 ]+", replacement="")
        s = pc.replace_substring_regex(s, pattern=" +", replacement=" ")
        s = pc.utf8_trim(s, characters=" ")
        return pa.table({"doc_id": t.column("doc_id"), "text": s})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\+?\d[\d\- ]{7,}\d", "[PHONE]"),
)


def redact_pii(col: "pa.ChunkedArray | pa.Array"):
    """Email/IP/phone redaction as three RE2 passes — pyarrow and
    DuckDB both compile RE2, so the SQL oracle applies the literally
    identical patterns. The standard C4/CCNet-style PII scrub stage."""
    for pat, repl in _PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
    return col


def q_redact_pii(sf_dir):
    """PII redaction, gate form: the corpus carries no PII, so the
    query first INJECTS deterministic doc_id-derived email/ip/phone
    strings (identically constructed in SQL), then redacts — proving
    the scrub on text that actually contains all three kinds."""
    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        sid = pc.cast(t.column("doc_id"), pa.string())
        # pyarrow 16 has no pc.mod — compute the octet in numpy
        octet = pc.cast(
            pa.array(t.column("doc_id").to_numpy() % 256, type=pa.int64()),
            pa.string(),
        )
        injected = pc.binary_join_element_wise(
            t.column("text"),
            " contact user", sid, "@example.com from 10.0.", octet,
            ".7 call 555-123-4567 now",
            "",
        )
        return pa.table(
            {"doc_id": t.column("doc_id"), "text": redact_pii(injected)}
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def q_chunk_documents(sf_dir):
    """Training-sequence prep: split every doc into tumbling 64-word
    chunks (the pre-tokenization packing step every LLM data pipeline
    runs). Emits (doc_id, chunk_idx, chunk) — one vectorized pass over
    the same block-bounds kernel passage_dedupe uses (byte slices on
    single-space text equal SQL word-list slices); no shuffle, chunk
    boundaries are per-doc so block layout cannot change the output."""
    from ..functions import hashing

    n_words = 64
    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = [x.encode() for x in t.column("text").to_pylist()]
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        didx, bidx, b0, b1 = hashing.block_bounds(texts, n_words)
        # b0/b1 already index the CONCATENATION of texts; build the
        # chunk column as ONE vectorized gather + Arrow from_buffers —
        # no per-chunk Python slicing/decoding
        buf = hashing._concat_bytes(texts)[0]
        lens = b1 - b0
        off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        total = int(off[-1])
        rel = np.arange(total, dtype=np.int64) - np.repeat(off[:-1], lens)
        values = buf[rel + np.repeat(b0, lens)]
        chunk_arr = pa.StringArray.from_buffers(
            len(lens),
            pa.py_buffer(off.astype(np.int32).tobytes()),
            pa.py_buffer(values.tobytes()),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[didx], type=pa.int64()),
                "chunk_idx": pa.array(bidx, type=pa.int64()),
                "chunk": chunk_arr,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_TFIDF_TERMS = ("column", "join", "merge", "order", "scan")


def q_tfidf_scores(sf_dir):
    """Retrieval-style TF-IDF scoring of the corpus against a fixed
    query-term set, with BM25's idf = ln((N - df + .5)/(df + .5) + 1).
    Two zero-shuffle streaming passes: (1) per-batch document-frequency
    partials — a fixed |q|-int vector per batch, folded on the driver
    (batches x 40 B, never a token shuffle); (2) per-batch scores with
    the idf vector closed over. The emitted score is INTEGER
    (sum of tf * floor(idf*1000 + .5)), so the only float is the idf
    quantization itself — a 1-ulp ln() difference between numpy and
    DuckDB flips the floor only when idf*1000 sits within ~1e-10 of an
    integer+.5 (probability ~1e-7 per distinct df value)."""
    terms = np.array(_TFIDF_TERMS, dtype=object)
    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def _tf(df: pd.DataFrame) -> np.ndarray:
        """(rows, |q|) int64 term-frequency matrix (single-space split)."""
        toks = df["text"].str.split(" ").explode()
        hit = toks[toks.isin(terms)]
        out = np.zeros((len(df), len(terms)), dtype=np.int64)
        if len(hit):
            ridx = pd.Series(
                np.arange(len(df)), index=df.index
            ).reindex(hit.index).to_numpy()
            tidx = np.searchsorted(terms, hit.to_numpy(dtype=object))
            np.add.at(out, (ridx, tidx), 1)
        return out

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        tf = _tf(df)
        return pd.DataFrame(
            {
                "df": [(tf > 0).sum(axis=0).astype(np.int64).tobytes()],
                "n": np.array([len(df)], dtype=np.int64),
            }
        )

    parts = (
        ds.map_batches(df_partial, batch_format="pandas").to_pandas()
    )
    dfv = np.zeros(len(terms), dtype=np.int64)
    for b in parts["df"]:
        dfv += np.frombuffer(b, dtype=np.int64)
    n_docs = int(parts["n"].sum())
    idf_millis = np.floor(
        np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0) * 1000 + 0.5
    ).astype(np.int64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tf = _tf(df)
        s = tf @ idf_millis
        any_hit = tf.sum(axis=1) > 0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[any_hit].astype(np.int64),
                "score": s[any_hit].astype(np.int64),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def q_vocab_topk_sketch(sf_dir):
    """The sketch path to the token frequency table: CountMin-pruned
    candidates (zero-shuffle streaming pass, 128 KiB partials, linear-
    sketch merges) + an exact broadcast refine pass — top-k counts are
    EXACT, so this shares vocab_topk's SQL oracle while never shuffling
    a token. See pipelines/vocab.py for the scale story."""
    from .vocab import heavy_hitter_tokens

    return heavy_hitter_tokens(_read_split(sf_dir, "documents", columns=["text"]), k=100)


def q_distinct_count_hll(sf_dir):
    """Approximate distinct-document count via HyperLogLog (p=12,
    ~1.6% stderr): each task folds its batch into a 4 KiB register
    array; only registers leave the tasks (task_count x 4 KiB driver
    state — the sketch form of the bounded-partial discipline, vs
    `unique`, whose shuffle moves every distinct value). rows-only
    gate entry: approximate by design, no SQL oracle."""
    from ..functions.hashing import content_hash128
    from ..functions.sketch import hll_estimate, hll_merge, hll_registers

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = [t.encode() for t in df["text"]]
        h1, _h2 = content_hash128(texts)
        return pd.DataFrame({"regs": [hll_registers(h1).tobytes()]})

    regs = None
    for row in ds.map_batches(partial, batch_format="pandas").take_all():
        r = np.frombuffer(row["regs"], dtype=np.uint8)
        regs = r if regs is None else hll_merge(regs, r)
    est = 0 if regs is None else hll_estimate(regs)
    return pd.DataFrame({"distinct_est": pd.Series([round(est)], dtype="int64")})


def q_bpe_merges(sf_dir):
    """BPE tokenizer TRAINING (Sennrich et al. 2016) with the
    production split of work: the corpus-sized stage (word-frequency
    counting) runs distributed with a vocab-bounded exchange
    (lm.word_frequencies); the state-sized stage (the merge loop) runs
    on the driver over that vocab-sized table. Returns the ordered
    merge list — deterministic (count desc, lexicographic tiebreak), so
    layout-independent. rows-only gate (an iterative algorithm, not
    SQL); pinned against a from-scratch reference implementation in
    tests/test_bpe.py."""
    from .lm import train_bpe, word_frequencies

    wf = word_frequencies(_read(sf_dir, "documents", columns=["text"]))
    merges = train_bpe(wf, n_merges=48)
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(merges)), dtype="int64"),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
        }
    )


def q_bpe_token_counts(sf_dir):
    """Tokenize the corpus with the trained BPE (map-only actor pool,
    merges broadcast once, per-actor word memo): per-doc subword token
    counts — the sequence-length statistic packing and batching need.
    rows-only gate (depends on the trained merges)."""
    from .lm import bpe_token_counts, train_bpe, word_frequencies

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    wf = word_frequencies(_read(sf_dir, "documents", columns=["text"]))
    merges = train_bpe(wf, n_merges=48)
    return bpe_token_counts(ds, merges, concurrency=autoscale_concurrency())


def q_group_distinct_hll(sf_dir):
    """Per-GROUP approximate distinct counts (distinct users per event
    type) via one HLL register array per group: each batch folds into a
    {group: 4 KiB registers} dict — group-count bounded, like the
    per-group KLL — so the exchange carries |groups| x 4 KiB per task
    no matter how many distinct members exist. The sketch sibling of
    the exact `group_distinct` (whose exchange is distinct-pair
    bounded): at web-scale member cardinality the registers win by
    orders of magnitude. rows-only gate (approximate by design); the
    accuracy bound vs the exact counts is pytest-asserted."""
    from ..functions.hashing import content_hash128
    from ..functions.sketch import hll_estimate, hll_merge, hll_registers

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {"event_type": [], "regs": []}
        for et, g in df.groupby("event_type", sort=False):
            keys = [str(int(u)).encode() for u in g["user_id"]]
            h1, _h2 = content_hash128(keys)
            out["event_type"].append(et)
            out["regs"].append(hll_registers(h1).tobytes())
        return pd.DataFrame(out)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        regs = None
        for b in g["regs"]:
            r = np.frombuffer(b, dtype=np.uint8)
            regs = r if regs is None else hll_merge(regs, r)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users_est": pd.Series([round(hll_estimate(regs))], dtype="int64"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(fold, batch_format="pandas")
    )


def q_length_percentiles(sf_dir):
    """Exact distributed percentiles of a bounded-range int column
    (the 'document length distribution' curation step): per-batch
    (lang, n_chars) histogram partials, one groupby over DISTINCT
    values (bounded by the value range, never the row count), quantiles
    read off the merged CDF at DuckDB's quantile_disc rank ceil(q*n)."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    QS = (0.5, 0.9, 0.99)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    def final(part: pd.DataFrame) -> pd.DataFrame:
        g = (
            part.groupby("n_chars", as_index=False)["c"].sum()
            .sort_values("n_chars")
        )
        cum = g["c"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = g["n_chars"].to_numpy()
        row = {"lang": [part["lang"].iloc[0]]}
        for name, qq in zip(("p50", "p90", "p99"), QS):
            rank = int(np.ceil(qq * n))
            row[name] = [np.int64(vals[np.searchsorted(cum, rank)])]
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def q_simhash_fingerprints(sf_dir):
    return dedup.simhash_fingerprints(_read_split(sf_dir, "documents"))


def q_simhash_near_pairs(sf_dir):
    # banded multi-probe buckets + within-bucket vectorized Hamming;
    # every pair at distance <= 3 shares an intact 16-bit band
    return dedup.simhash_near_pairs(
        _read_split(sf_dir, "documents"), n_docs_hint=_nrows(sf_dir, "documents")
    )


def q_dedup_pipeline(sf_dir):
    # exact dedup -> MinHash-LSH near-dup pairs over representatives
    # (the standard training-corpus composition)
    return dedup.dedup_pipeline(
        _read_split(sf_dir, "documents"),
        jaccard_threshold=0.5,
        n_docs_hint=_nrows(sf_dir, "documents"),
    )


def q_dup_passages(sf_dir):
    """Substring-level exact dedup: per doc, how many of its sliding
    8-word passages also appear verbatim in another document. The
    oracle states the same thing over passage STRINGS (string_split +
    list slicing); the Ray side shuffles only 64-bit passage hashes."""
    return dedup.passage_dup_stats(
        _read_split(sf_dir, "documents", columns=["doc_id", "text"]),
        n_words=8,
        n_docs_hint=_nrows(sf_dir, "documents"),
    )


def q_passage_dedupe(sf_dir):
    """C4-style passage removal: tumbling 8-word blocks, keep only the
    globally-first occurrence of each repeated block (min doc_id, then
    min block index), rebuild each doc from its surviving blocks. The
    oracle states the same edit over block STRINGS with a window
    ROW_NUMBER; the Ray side shuffles 64-bit block hashes and moves
    text exactly once (the rebuild join)."""
    return dedup.passage_dedupe(
        _read_split(sf_dir, "documents", columns=["doc_id", "text"]),
        n_words=8,
        n_docs_hint=_nrows(sf_dir, "documents"),
    )


def q_decontaminate(sf_dir):
    """Benchmark decontamination: docs with doc_id < 32 stand in for
    the eval set; every other doc reports how many of its sliding
    8-word windows appear verbatim in that set. The eval-side window
    hashes broadcast once via ray.put; the corpus is probed in place
    with searchsorted — zero shuffle. The oracle states the same count
    over window STRINGS."""
    corpus = _read_split(
        sf_dir, "documents", columns=["doc_id", "text"]
    ).filter(expr="doc_id >= 32")
    bench = _read(sf_dir, "documents", columns=["doc_id", "text"]).filter(
        expr="doc_id < 32"
    )
    return dedup.decontaminate(corpus, bench, n_words=8)


def q_unigram_logprob(sf_dir):
    """CCNet-style LM quality axis: mean unigram negative
    log-likelihood per doc under the corpus's own token distribution,
    in 1e-4 nat units. Token-hash partials (Zipf-collapsed) ride the
    only wide shuffle; the oracle states the same score over token
    STRINGS."""
    return lm.unigram_logprob_scores(
        _read_split(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_dsir_weights(sf_dir):
    """DSIR importance weights (hashed-unigram, target domain =
    source 'src0'): per-doc mean log importance ratio between the
    target slice's unigram distribution and the whole corpus's, +1
    smoothed, in 1e-4 nat units. Same two id-sized exchanges as
    unigram_logprob; the oracle states the identical factored
    expression over token STRINGS."""
    return lm.dsir_weights(
        _read_split(
            sf_dir, "documents", columns=["doc_id", "text", "source"]
        )
    )


def q_perplexity_filter(sf_dir):
    """CCNet-style perplexity filter: keep the most-fluent 75% of docs
    by corpus-unigram mean NLL, value-thresholded (every boundary tie
    kept) so the output is layout/cluster-size invariant. The score
    table is checkpointed once (two consumers); the threshold folds a
    distinct-value histogram (bounded-int domain); the filter is
    map-only (lm.py::perplexity_filter)."""
    return lm.perplexity_filter(
        _read_split(sf_dir, "documents", columns=["doc_id", "text"])
    )


def q_dup_clusters(sf_dir):
    """Distributed connected components (min-label propagation with
    pointer jumping) over a deterministic chain-edge graph: consecutive
    doc_ids within each `source` group, plus self-loops so singleton
    groups appear. Components equal the source groups, which the SQL
    oracle states as a window min — but the Ray side has to EARN it by
    propagating labels down 25-250-node chains in O(log n) rounds."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    n = _nrows(sf_dir, "documents")
    edges = dedup.chain_edges_by_group(ds, "source", "doc_id", n_hint=n)

    def self_loops(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"id_a": ids, "id_b": ids})

    edges = edges.union(ds.map_batches(self_loops, batch_format="pandas"))
    comps = dedup.connected_components(edges, n_nodes_hint=n)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["node"].to_numpy().astype(np.int64),
                "cluster_id": df["component"].to_numpy().astype(np.int64),
            }
        )

    return comps.map_batches(rename, batch_format="pandas")


def q_curate_corpus(sf_dir):
    """End-to-end training-corpus curation: lang/length filter ->
    exact-dedup representatives -> near-dup pair breaking (greedy,
    exact distributed anti-join) -> curated doc ids. The composition of
    the filter, dedup and join operators as one streaming pipeline
    (rows-only: the near-dup stage is approximate by design)."""
    return dedup.curate_corpus(
        _read_split(sf_dir, "documents"),
        min_chars=50,
        jaccard_threshold=0.5,
        n_docs_hint=_nrows(sf_dir, "documents"),
    )


def q_curate_corpus_clusters(sf_dir):
    """curate_corpus with cluster-collapse dedup: near-dup pairs ->
    distributed connected components -> keep one representative (min
    id) per component (rows-only: the pair stage is approximate)."""
    return dedup.curate_corpus(
        _read_split(sf_dir, "documents"),
        min_chars=50,
        jaccard_threshold=0.5,
        n_docs_hint=_nrows(sf_dir, "documents"),
        dedup_mode="clusters",
    )


def q_curate_corpus_full(sf_dir):
    """The COMPLETE curation chain: filter -> exact reps -> near-dup
    removal -> C4-style passage removal -> benchmark decontamination
    (docs doc_id < 32 stand in for the eval set), returning the final
    (doc_id, text) a training job would read. Rows-only: the near-dup
    stage is approximate by design; every constituent stage has its
    own SQL-oracled gate query."""
    n = _nrows(sf_dir, "documents")
    corpus = _read_split(sf_dir, "documents").filter(expr="doc_id >= 32")
    bench = _read(sf_dir, "documents", columns=["doc_id", "text"]).filter(
        expr="doc_id < 32"
    )
    return dedup.curate_corpus_full(
        corpus,
        bench,
        min_chars=50,
        jaccard_threshold=0.5,
        n_docs_hint=n,
    )


def q_near_dupes_verified(sf_dir):
    return dedup.verified_near_dupes(
        _read_split(sf_dir, "documents"),
        jaccard_threshold=0.5,
        n_docs_hint=_nrows(sf_dir, "documents"),
    )


# ---- similarity search


def q_embedding_topk(sf_dir):
    import duckdb

    q = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        "ORDER BY vec_id LIMIT 1"
    ).fetchone()[0]
    return similarity.brute_force_topk(_read(sf_dir, "embeddings"), np.array(q), k=10)


def _ivf_store(sf_dir: str) -> str:
    """Cluster-partitioned embedding store (once per sf_dir): one
    parquet shard per centroid cell, so probes prune the READ, not just
    the compute (round-2 verdict #5)."""
    import hashlib
    import os

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_ivfstore_{key}"
    if not os.path.exists(f"{out}/_ivf_meta.json"):
        similarity.build_ivf_store(_read(sf_dir, "embeddings"), out)
    return out


def q_embedding_topk_ivf(sf_dir):
    """IVF approximate nearest neighbours over the cluster-partitioned
    store — only probed cells' shards are opened (rows-only gate:
    approximate)."""
    import duckdb

    q = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        "ORDER BY vec_id LIMIT 1"
    ).fetchone()[0]
    return similarity.ivf_topk_store(_ivf_store(sf_dir), np.array(q), k=10, n_probe=8)


def q_embedding_topk_pq(sf_dir):
    """Product-quantization top-k: codes are 8 B/vector (32x smaller
    than the raw float column), the ADC scan ranks in the compressed
    domain, and only the top-`rerank` candidates are re-scored against
    raw vectors (rows-only gate: approximate; recall pinned by
    pytest against the exact oracle)."""
    import duckdb

    q = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        "ORDER BY vec_id LIMIT 1"
    ).fetchone()[0]
    return similarity.pq_topk(
        _read(sf_dir, "embeddings"), np.array(q), k=10, rerank=100
    )


def _ivfpq_store(sf_dir: str) -> str:
    """IVFPQ code store (once per sf_dir): per-cell shards of (id,
    8 B PQ code) — the index is ~1/32 the raw embedding column, and a
    probe opens only the probed cells' code shards."""
    import hashlib
    import os

    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/graft_ivfpqstore_{key}"
    if not os.path.exists(f"{out}/_ivfpq_meta.json"):
        similarity.build_ivfpq_store(_read(sf_dir, "embeddings"), out)
    return out


def q_embedding_topk_ivfpq(sf_dir):
    """IVFPQ approximate nearest neighbours: coarse cells prune the
    READ, PQ codes rank in the compressed domain, exact rerank touches
    only the top candidates' raw rows (rows-only gate: approximate;
    recall pinned by pytest)."""
    import duckdb

    q = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        "ORDER BY vec_id LIMIT 1"
    ).fetchone()[0]
    return similarity.ivfpq_topk_store(
        _ivfpq_store(sf_dir),
        _read(sf_dir, "embeddings"),
        np.array(q),
        k=10,
        n_probe=8,
        rerank=100,
    )


def q_embedding_near_pairs(sf_dir):
    """Banded random-hyperplane LSH near-pairs (rows-only gate:
    approximate-by-design). The synthetic embeddings are
    near-orthogonal — max pairwise cosine ~0.6 at every sf — so the
    threshold/band shape is tuned to the corpus (t=0.4, 16 bands x 4
    planes ~ 94% recall per true pair); production near-dup runs use
    t>=0.85 with deeper bands and far sparser candidates. The exact
    oracle-checked companions are embedding_cosine_pairs /
    embedding_dedupe."""
    return similarity.lsh_near_pairs(
        _read(sf_dir, "embeddings"),
        cos_threshold=0.4,
        n_planes=4,
        n_bands=16,
    )


def q_jaccard_pairs(sf_dir):
    """Exact all-pairs 4-gram Jaccard near-dup pairs at t=0.5 —
    integer cross-multiplied threshold, so the Ray kernel and the SQL
    HAVING compute identical int64 comparisons (no float anywhere)."""
    from .dedup import jaccard_pairs

    return jaccard_pairs(
        _read_split(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold_millis=500,
    )


def q_jaccard_dedupe(sf_dir):
    """Exact n-gram-Jaccard near-dup REMOVAL: keep doc v iff no u < v
    has Jaccard(u, v) >= 0.5 — same pair-breaking semantics as
    embedding_dedupe, driven by the exact blocked pair kernel and the
    id-only distributed anti-join."""
    from .dedup import anti_join_ids, jaccard_pairs

    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = jaccard_pairs(ds, threshold_millis=500)

    def drop_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["id_b"].to_numpy().astype(np.int64)}
        )

    drops = pairs.map_batches(drop_side, batch_format="pandas")
    return anti_join_ids(ds.select_columns(["doc_id"]), drops, "doc_id")


def q_embedding_cosine_pairs(sf_dir):
    """Exact embedding-cosine near-dup pairs (blocked all-pairs matmul,
    off-driver) — the oracle-checkable exact form of the embedding
    near-dup family. Threshold 0.4 sits >= 1e-5 away from every pair's
    cosine in the synthetic tables, so f64 summation-order differences
    vs DuckDB cannot flip a pair."""
    return similarity.cosine_pairs(
        _read(sf_dir, "embeddings"), threshold=0.4, rows_per_block=256
    )


def q_embedding_dedupe(sf_dir):
    """Exact embedding-cosine near-dup REMOVAL: keep v iff no u < v has
    cos(u, v) >= 0.4 (pair-breaking semantics, distributed anti-join)."""
    return similarity.semantic_dedupe(
        _read(sf_dir, "embeddings"), threshold=0.4
    )


# ---- multimodal stubs


def q_gopher_quality(sf_dir):
    """Gopher-style quality features + keep decision per doc, all RE2
    Arrow kernels, SQL-oracled value for value."""
    from ..functions.text import gopher_quality

    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        feats = gopher_quality(t.column("text"))
        return pa.table({"doc_id": t.column("doc_id"), **feats})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_repetition_scores(sf_dir):
    """Repetition rule (the other deterministic Gopher family):
    duplicate-token fraction per doc = 1 - distinct/total tokens.
    Split on single spaces to match SQL string_split exactly; pandas
    explode + groupby nunique/size (C kernels, no per-row Python);
    half-away rounding on the non-negative ratio via floor(x*1e4+0.5)."""
    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ").explode()
        g = toks.groupby(level=0)
        total = g.size().to_numpy()
        distinct = g.nunique().to_numpy()
        ratio = 1.0 - distinct / np.maximum(total, 1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy().astype(np.int64),
                "total_tokens": total.astype(np.int64),
                "distinct_tokens": distinct.astype(np.int64),
                "rep_ratio": np.floor(ratio * 10_000 + 0.5) / 10_000,
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")


def q_stopword_fraction(sf_dir):
    """Stopword-fraction rule (Gopher requires >= ~2 stopwords per doc):
    count and fraction of stopword tokens, single-space split matching
    SQL string_split; pandas explode + isin (C kernels)."""
    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ").explode()
        g_size = toks.groupby(level=0).size().to_numpy()
        n_stop = (
            toks.isin(_STOPWORDS).groupby(level=0).sum().to_numpy()
        )
        frac = n_stop / np.maximum(g_size, 1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy().astype(np.int64),
                "n_stop": n_stop.astype(np.int64),
                "stop_ratio": np.floor(frac * 10_000 + 0.5) / 10_000,
                "enough_stopwords": n_stop >= 2,
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def q_source_reputation(sf_dir):
    """Per-domain reputation filter: keep docs whose source's mean doc
    length clears the bar. Stats pre-aggregate in-batch (int64-exact,
    no float average), good-source set broadcasts, corpus filters in
    place — zero corpus shuffle."""
    from .webtext import source_reputation_filter

    return source_reputation_filter(
        _read_split(sf_dir, "documents", columns=["doc_id", "source", "n_chars"]),
        min_avg_chars=280,
    )


def q_extract_text_general(sf_dir):
    """Template-INDEPENDENT boilerplate removal: wrap each doc's text in
    a page template the extractor has never seen — link-dense nav,
    styled head, inline script, short footer (all DIFFERENT from
    extract_text's <article> template) — and recover it with the
    general density-based extractor (block split -> word-count +
    link-density scoring, all Arrow kernels). Hash-identical to the raw
    table iff recovery is byte-exact, which it is because every corpus
    doc has >= 10 single-spaced words and zero links."""
    from ..functions import webtext as W

    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        html = pc.binary_join_element_wise(
            '<html><head><title>t</title><style>body{margin:0}</style>'
            '</head><body><nav><a href="/">home</a> <a href="/s">all the'
            ' sections</a> <a href="/c">contact us today</a></nav>'
            "<div><h2>heading</h2></div><div>",
            t.column("text"),
            '</div><footer>&copy; 2020 example</footer>'
            "<script>var x=1; if (x<2) { x=3; }</script></body></html>",
            "",
        )
        got = W.extract_main_text_general(html)
        return pa.table(
            {"doc_id": t.column("doc_id"), "text": pc.cast(got, pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _built_urls(t: pa.Table) -> pa.Array:
    """Deterministic doc_id-derived url construction shared by the
    canonicalization gates (identically constructed in SQL): mixed-case
    scheme+host, utm params on even ids, fragment on ids % 3 == 0,
    trailing slash on query-less ids % 5 == 0."""
    ids = t.column("doc_id").to_numpy()
    path = pc.cast(pa.array(ids % 50, type=pa.int64()), pa.string())
    ref = pc.cast(pa.array(ids % 7, type=pa.int64()), pa.string())
    qpart = pc.if_else(
        pa.array(ids % 2 == 0),
        pc.binary_join_element_wise("?utm_source=feed&ref=", ref, ""),
        pa.scalar("", type=pa.string()),
    )
    fpart = pc.if_else(
        pa.array(ids % 3 == 0),
        pa.scalar("#s", type=pa.string()),
        pa.scalar("", type=pa.string()),
    )
    spart = pc.if_else(
        pa.array((ids % 2 == 1) & (ids % 5 == 0)),
        pa.scalar("/", type=pa.string()),
        pa.scalar("", type=pa.string()),
    )
    return pc.binary_join_element_wise(
        "HTTPS://WWW.",
        pc.cast(t.column("source"), pa.string()),
        "/Dir/",
        path,
        qpart,
        fpart,
        spart,
        "",
    )


_URL_BUILD_SQL = (
    "'HTTPS://WWW.' || source || '/Dir/' || (doc_id % 50) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=' || (doc_id % 7) "
    "ELSE '' END) || "
    "(CASE WHEN doc_id % 3 = 0 THEN '#s' ELSE '' END) || "
    "(CASE WHEN doc_id % 2 = 1 AND doc_id % 5 = 0 THEN '/' ELSE '' END)"
)

# the LITERAL same RE2 chain as functions.webtext.canonicalize_urls
_URL_CANON_SQL = (
    "regexp_replace(regexp_replace("
    "lower(regexp_extract(c3, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+', 0)) || "
    "regexp_replace(c3, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+', ''), "
    "'/$', ''), '\\?$', '')"
)
_URL_C3_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(u, '#.*', ''), "
    "'[?&]utm_[a-zA-Z]+=[^&]*', '', 'g'), '^([^?]*)&', '\\1?')"
)


def q_canonicalize_urls(sf_dir):
    """URL canonicalization (the crawl-dedup key): fragment + utm
    stripping, separator fix-up, scheme/host lowercasing, trailing
    / and ? removal — every step one RE2 pass, the SQL oracle running
    the literal same patterns over identically-constructed urls."""
    from ..functions.webtext import canonicalize_urls

    ds = _read_split(sf_dir, "documents", columns=["doc_id", "source"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "url": pc.cast(
                    canonicalize_urls(_built_urls(t)), pa.string()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_canonical_url_dedupe(sf_dir):
    """Crawl dedup by canonical url: many spellings of the same page
    (utm junk, fragments, case, trailing slash) collapse to one
    canonical key; keep the smallest doc_id per key. Composition of
    canonicalize_urls + the exact_dedupe hash partitioning, with the
    canonical string riding the one shuffle as the dedup key."""
    from ..functions.webtext import canonicalize_urls

    ds = _read_split(sf_dir, "documents", columns=["doc_id", "source"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": pc.cast(
                    canonicalize_urls(_built_urls(t)), pa.string()
                ),
            }
        )

    n = _nrows(sf_dir, "documents")
    return dedup.exact_dedupe(
        ds.map_batches(fn, batch_format="pyarrow"), n_docs_hint=n
    )


def q_host_quota(sf_dir):
    """Per-domain quota sampling: at most 3 docs per source, the
    smallest doc_ids win (deterministic; SQL states it as a window
    ROW_NUMBER). Batch partials cap the shuffle at k rows per (source,
    batch); the merge is hash-partitioned on the source string, one
    vectorized groupby-head per partition."""
    from .webtext import host_quota_sample

    return host_quota_sample(
        _read_split(sf_dir, "documents", columns=["doc_id", "source"]),
        max_per_source=3,
        n_docs_hint=_nrows(sf_dir, "documents"),
    )


def q_snapshot_dedupe(sf_dir):
    """Incremental cross-snapshot exact dedup: persist the corpus's
    128-bit-hash dedup index (16 B/doc, hash-partitioned shards written
    in-task), then dedupe a simulated re-crawl — every doc_id % 3 == 0
    page unchanged (an exact dup of the old snapshot), the rest edited
    — against the index WITHOUT touching the old corpus again. The
    oracle states the same NOT EXISTS over text equality."""
    import tempfile

    n = _nrows(sf_dir, "documents")
    old = _read_split(sf_dir, "documents", columns=["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="pgr_dedup_idx_")
    dedup.build_dedup_index(old, index_dir, n_docs_hint=n)

    def recrawl(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        text = df["text"].to_numpy().astype(object)
        changed = ids % 3 != 0
        return pd.DataFrame(
            {
                "doc_id": ids + 1_000_000,
                "text": np.where(changed, text + " v2", text),
            }
        )

    new = _read_split(
        sf_dir, "documents", columns=["doc_id", "text"]
    ).map_batches(recrawl, batch_format="pandas")
    return dedup.dedupe_against_index(
        new, index_dir, payload_cols=("text",), n_docs_hint=n
    )


def q_extract_text(sf_dir):
    """HTML main-content extraction, SQL-checkable: wrap each doc's text
    in the page template (vectorized Arrow concat), extract it back with
    the RE2 kernel, return (doc_id, text) — hash-identical to the raw
    table iff extraction is byte-exact."""
    from ..functions import webtext as W

    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        html = pc.binary_join_element_wise(
            '<html><head><title>d</title></head><body><nav>home | about</nav>'
            "<article><p>",
            t.column("text"),
            "</p></article><footer>&copy; 2020</footer></body></html>",
            "",
        )
        got = W.extract_main_text(html)
        return pa.table(
            {"doc_id": t.column("doc_id"), "text": pc.cast(got, pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_multimodal_meta(sf_dir):
    from ..stages.multimodal import binary_meta

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        payload = pc.cast(t.column("text"), pa.large_binary())
        t2 = pa.table({"doc_id": t.column("doc_id"), "payload": payload})
        return binary_meta(t2, "payload", "doc_id")

    return relational.transform(ds, fn)


def q_frame_sample(sf_dir):
    """Frame sampling over binary payloads (actor pool, exploded one
    row per sampled frame). Container parsing is the documented stub
    seam; the explode layout, timestamps and actor plumbing are real
    (rows-only: per-frame bytes aren't SQL-expressible)."""
    from ..stages.multimodal import FrameSampler

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pc.cast(t.column("text"), pa.large_binary()),
            }
        )

    return ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": 4, "decode_stub": True},
        batch_format="pandas",
        batch_size=64,
        concurrency=autoscale_concurrency(),
    )


def q_image_resize(sf_dir):
    """Image resize over binary payloads (actor pool): opaque payload
    in, resized opaque payload + typed dims out. Decode/encode are the
    documented stub seams; the schema and exact target dims are real
    (rows-only: re-encoded bytes aren't SQL-expressible)."""
    from ..stages.multimodal import ImageResizer

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pc.cast(t.column("text"), pa.large_binary()),
            }
        )

    return ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target": 32, "decode_stub": True},
        batch_format="pandas",
        batch_size=64,
        concurrency=autoscale_concurrency(),
    )


def q_image_resize_raw(sf_dir):
    """RAW-raster resize — the NO-stub multimodal path: payloads are
    real H x W x 1 uint8 rasters built deterministically from the doc
    text bytes with explicit dimension columns, resized by the
    vectorized bilinear kernel (rows-only: raster bytes aren't
    SQL-expressible; the kernel itself is pinned by a hand-computed
    matrix in test_pipeline.py)."""
    from ..stages.multimodal import RawRasterResizer

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_raster(df: pd.DataFrame) -> pd.DataFrame:
        payloads, hs, ws = [], [], []
        for t in df["text"]:
            b = t.encode()[:1024]
            w = 16
            h = max(1, len(b) // w)
            payloads.append(b[: h * w])
            hs.append(h)
            ws.append(w)
        return pd.DataFrame(
            {
                "media_id": df["doc_id"].to_numpy().astype(np.int64),
                "payload": pd.Series(payloads, dtype=object),
                "height": pd.Series(hs, dtype="int64"),
                "width": pd.Series(ws, dtype="int64"),
                "channels": pd.Series([1] * len(df), dtype="int64"),
            }
        )

    return ds.map_batches(to_raster, batch_format="pandas").map_batches(
        RawRasterResizer,
        fn_constructor_kwargs={"target_h": 8, "target_w": 8},
        batch_format="pandas",
        batch_size=64,
        concurrency=autoscale_concurrency(),
    )


def q_video_sample_raw(sf_dir):
    """RAW-video frame sampling + per-frame resize — the NO-stub
    multimodal CHAIN: payloads are real n_frames x (H*W*C) uint8 raster
    stacks built deterministically from the doc text bytes, with the
    layout in explicit columns (n_frames/height/width/channels/fps).
    RawVideoFrameSampler slices exact frame bytes (evenly spaced,
    always including frame 0, fps-derived timestamps) and explodes one
    row per frame; RawRasterResizer consumes that output directly, so
    sample -> resize runs with no decoder seam anywhere (rows-only:
    raster bytes aren't SQL-expressible; the slicing and the bilinear
    kernel are each pinned by hand-computed cases in test_pipeline.py)."""
    from ..stages.multimodal import RawRasterResizer, RawVideoFrameSampler

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_video(df: pd.DataFrame) -> pd.DataFrame:
        h, w = 4, 8
        fb = h * w
        payloads, nfs = [], []
        for t in df["text"]:
            b = np.frombuffer(t.encode()[:1024] or b"\x00", dtype=np.uint8)
            n = 1 + int(b.sum()) % 7
            payloads.append(np.resize(b, n * fb).tobytes())
            nfs.append(n)
        n_rows = len(df)
        return pd.DataFrame(
            {
                "media_id": df["doc_id"].to_numpy().astype(np.int64),
                "payload": pd.Series(payloads, dtype=object),
                "n_frames": pd.Series(nfs, dtype="int64"),
                "height": pd.Series([h] * n_rows, dtype="int64"),
                "width": pd.Series([w] * n_rows, dtype="int64"),
                "channels": pd.Series([1] * n_rows, dtype="int64"),
                "fps": pd.Series([25.0] * n_rows, dtype="float64"),
            }
        )

    # both stages are stateless (plain int config, no model/index), so
    # run them as elastic TASKS (instance form), not actor pools: two
    # chained pools at their floor size would monopolize a small
    # session's CPUs and starve their own upstream read (the documented
    # pool>=CPUs deadlock); tasks scale per-batch with no such floor
    return (
        ds.map_batches(to_video, batch_format="pandas")
        .map_batches(
            RawVideoFrameSampler(n_frames=3),
            batch_format="pandas",
            batch_size=64,
        )
        .map_batches(
            RawRasterResizer(target_h=8, target_w=8),
            batch_format="pandas",
            batch_size=64,
        )
    )


def q_media_features(sf_dir):
    from ..stages.multimodal import MediaFeatureExtractor

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pc.cast(t.column("text"), pa.large_binary()),
            }
        )

    return ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode_stub": True},
        batch_format="pandas",
        batch_size=64,
        concurrency=autoscale_concurrency(),
    )


def q_topk_per_group(sf_dir):
    """Group-wise top-k selection: the 3 longest docs per language,
    doc_id breaking ties — the 'best k per group' ending of every
    curation pipeline. k-bounded partials BEFORE the shuffle (<= k rows
    per group per batch of (lang, n_chars, doc_id) triples), then a
    hash-partitioned vectorized merge: the corpus never moves. SQL
    states it as the ROW_NUMBER window."""
    return relational.topk_per_group(
        _read_split(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]),
        group_col="lang",
        score_col="n_chars",
        id_col="doc_id",
        k=3,
        n_rows_hint=_nrows(sf_dir, "documents"),
    )


def q_anti_join(sf_dir):
    """Broadcast EXACT anti-join: drop every document whose source also
    published an outlier-length page (max n_chars > 530) — the
    blocklist-join shape (banned hosts / opted-out domains). The
    blocklist is computed distributed (groupby max = mergeable
    partials), broadcast once via ray.put, and probed zero-copy in
    every task; the corpus itself never shuffles. Exactness matters: a
    bloom FP here would silently drop a kept document, so unlike
    bloom_semi_join no filter approximation is admissible."""
    docs = _read(sf_dir, "documents")
    heads = (
        _read(sf_dir, "documents", columns=["source", "n_chars"])
        .groupby("source")
        .max("n_chars")
    )
    block = heads.map_batches(
        lambda t: t.filter(
            pc.greater(t.column("max(n_chars)"), pa.scalar(530, pa.int64()))
        ).select(["source"]),
        batch_format="pyarrow",
    )
    return relational.anti_join_broadcast(docs, "source", block)


_RANGE_WINDOWS = [
    ("y1995", "1995-01-01", "1996-01-01"),
    ("y1996", "1996-01-01", "1997-01-01"),
    ("y1997", "1997-01-01", "1998-01-01"),
    ("mid9697", "1996-07-01", "1997-07-01"),
    ("late", "1998-01-01", "2002-01-01"),
    ("q1_99", "1999-01-01", "1999-04-01"),
]


def q_range_join(sf_dir):
    """Interval (range) join: orders joined to OVERLAPPING calendar
    windows — one order can land in several windows, which is what
    separates a range join from bucketing. Broadcast map-side
    evaluation: the window list rides the task closure, one vectorized
    mask per window per batch, zero shuffle (SCALE.md documents the
    large-interval-side variant this deliberately is not)."""
    from datetime import datetime

    iv = [
        (n, datetime.fromisoformat(lo), datetime.fromisoformat(hi))
        for n, lo, hi in _RANGE_WINDOWS
    ]
    return relational.interval_join_broadcast(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]),
        value_col="o_orderdate",
        intervals=iv,
        out_cols=["o_orderkey"],
    )


def q_bm25_scores(sf_dir):
    """BM25 ranking of the corpus against the fixed query-term set
    (k1=1.2, b=0.75) — tfidf_scores plus the document-length
    normalization real retrieval uses. Same two zero-shuffle streaming
    passes: (1) per-batch (df, n, dl_sum) partials — a fixed-size
    vector per batch folded on the driver; (2) per-batch scores with
    (idf, avgdl) closed over. Exact-mirrored float discipline: ln() is
    quantized to integer millis exactly like tfidf_scores, and every
    remaining op (*, /, +) is correctly-rounded IEEE double evaluated
    with the IDENTICAL expression tree in numpy and DuckDB, so each
    per-term contribution quantizes to the same integer on both sides
    and the final score is an order-free integer sum."""
    terms = np.array(_TFIDF_TERMS, dtype=object)
    K1, B = 1.2, 0.75
    ds = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def _tf_dl(df: pd.DataFrame):
        toks = df["text"].str.split(" ")
        dl = toks.str.len().to_numpy().astype(np.int64)
        ex = toks.explode()
        hit = ex[ex.isin(terms)]
        tf = np.zeros((len(df), len(terms)), dtype=np.int64)
        if len(hit):
            ridx = pd.Series(
                np.arange(len(df)), index=df.index
            ).reindex(hit.index).to_numpy()
            tidx = np.searchsorted(terms, hit.to_numpy(dtype=object))
            np.add.at(tf, (ridx, tidx), 1)
        return tf, dl

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tf, dl = _tf_dl(df)
        return pd.DataFrame(
            {
                "df": [(tf > 0).sum(axis=0).astype(np.int64).tobytes()],
                "n": np.array([len(df)], dtype=np.int64),
                "dl_sum": np.array([int(dl.sum())], dtype=np.int64),
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    dfv = np.zeros(len(terms), dtype=np.int64)
    for b in parts["df"]:
        dfv += np.frombuffer(b, dtype=np.int64)
    n_docs = int(parts["n"].sum())
    avgdl = np.float64(int(parts["dl_sum"].sum())) / np.float64(n_docs)
    idf_millis = np.floor(
        np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0) * 1000 + 0.5
    ).astype(np.int64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tf, dl = _tf_dl(df)
        tf_f = tf.astype(np.float64)
        # norm = k1 * (1 - b + b * (dl / avgdl)), shaped (rows, 1); the
        # SQL oracle spells the identical tree so IEEE rounding matches
        norm = (K1 * (0.25 + 0.75 * (dl.astype(np.float64) / avgdl)))[:, None]
        contrib = (idf_millis[None, :] * (tf_f * 2.2)) / (tf_f + norm)
        ci = np.floor(contrib * 1000.0 + 0.5).astype(np.int64)
        ci[tf == 0] = 0
        s = ci.sum(axis=1)
        any_hit = tf.sum(axis=1) > 0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy()[any_hit].astype(np.int64),
                "score": s[any_hit],
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def q_snapshot_diff(sf_dir):
    """Incremental crawl diff: classify every page across two snapshots
    as added / removed / changed / unchanged — the bookkeeping step
    before an incremental re-encode (only 'added'+'changed' need work,
    'removed' become tombstone candidates). The simulated re-crawl is a
    pure function of the old snapshot: ids %7==0 dropped (dead pages),
    ids %3!=0 edited, ids+10^6 for a 5% tail appended as new pages.

    Scale shape: each side ships (doc_id, content_hash128) — 24 B/row,
    never the text — into id-hash partitions; the classify is one
    vectorized merge per partition. The oracle states the same FULL
    OUTER JOIN on doc_id with text equality (exact, since the 128-bit
    content hash stands in for text equality at 2^-64 collision odds)."""
    from ..functions.hashing import content_hash128
    from .dedup import _n_partitions

    n = _nrows(sf_dir, "documents")
    P = _n_partitions(n, 1)
    old = _read_split(sf_dir, "documents", columns=["doc_id", "text"])

    def recrawl(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        text = df["text"].to_numpy().astype(object)
        keep = ids % 7 != 0
        ids_k, text_k = ids[keep], text[keep]
        changed = ids_k % 3 != 0
        out_ids = [ids_k]
        out_text = [np.where(changed, text_k + " v2", text_k)]
        new_mask = ids % 20 == 0
        out_ids.append(ids[new_mask] + 1_000_000)
        out_text.append(text[new_mask] + " fresh page")
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(out_ids),
                "text": np.concatenate(out_text),
            }
        )

    new = _read_split(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        recrawl, batch_format="pandas"
    )

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            ids = df["doc_id"].to_numpy().astype(np.int64)
            h1, _h2 = content_hash128([t.encode() for t in df["text"]])
            return pd.DataFrame(
                {
                    "doc_id": ids,
                    "h": h1.view(np.int64),
                    "side": np.int8(side),
                    "pt": (ids % P).astype(np.int64),
                }
            )

        return fn

    both = old.map_batches(tag(0), batch_format="pandas").union(
        new.map_batches(tag(1), batch_format="pandas")
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["doc_id", "h"]]
        nn = g[g["side"] == 1][["doc_id", "h"]]
        m = o.merge(nn, on="doc_id", how="outer", suffixes=("_o", "_n"))
        status = np.where(
            m["h_o"].isna(),
            "added",
            np.where(
                m["h_n"].isna(),
                "removed",
                np.where(m["h_o"] == m["h_n"], "unchanged", "changed"),
            ),
        )
        return pd.DataFrame(
            {"doc_id": m["doc_id"].astype(np.int64), "status": status}
        )

    return both.groupby("pt").map_groups(classify, batch_format="pandas")


def q_dataset_split(sf_dir):
    """Deterministic train/valid/test split assignment (98/1/1) by a
    hash of the doc id — the split is a pure function of the id, so it
    survives re-crawls, resumes, corpus growth and cluster-size changes
    (rows only ever ADD to a split, never migrate), unlike
    ds.train_test_split whose assignment depends on block layout.
    Map-only, zero shuffle; knuth32 mix so the oracle states the same
    function in portable SQL."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        m = (((ids + 13) * np.int64(2654435761)) % np.int64(1 << 32)) % 100
        split = np.where(m < 98, "train", np.where(m < 99, "valid", "test"))
        return pd.DataFrame({"doc_id": ids, "split": split})

    return ds.map_batches(assign, batch_format="pandas")


def q_weighted_sample(sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis
    A-Res): rank every doc by ln(u)/w with u a hash-derived uniform and
    w = n_chars, keep the global top 100 — longer docs proportionally
    likelier, yet the draw is a PURE FUNCTION of (doc_id, seed): rerun,
    resume, and cluster-size invariant (the deterministic_shuffle
    commitment, applied to importance sampling). u uses the knuth32 mix
    exactly because it is portable SQL — the oracle states the same
    key. Scale shape: per-batch partial top-100 bounds what leaves each
    task to k rows; the final merge sees k*batches rows, never the
    corpus. ln() 1-ulp divergence between numpy and DuckDB can only
    flip the boundary pair if two keys land within ~1e-16 relative —
    negligible even at 10^8 docs."""
    ds = _read_split(sf_dir, "documents", columns=["doc_id", "n_chars"])
    K = 100

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        w = df["n_chars"].to_numpy().astype(np.float64)
        mix = ((ids + 7) * np.int64(2654435761)) % np.int64(1 << 32)
        u = (mix.astype(np.float64) + 1.0) / np.float64((1 << 32) + 1)
        key = np.log(u) / w
        out = pd.DataFrame({"doc_id": ids, "key": key})
        return out.nlargest(K, "key")

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        out = part.nlargest(K, "key")
        return pd.DataFrame({"doc_id": out["doc_id"].to_numpy().astype(np.int64)})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(merge, batch_format="pandas")
    )


def q_cdf_ranks(sf_dir):
    """Within-group rank (score calibration: where does each doc sit in
    its language's length distribution?). Computed WITHOUT a sort
    shuffle: n_chars is bounded-domain, so pass 1 builds per-(lang,
    value) histogram partials (distinct-value-bounded, the
    length_percentiles discipline), the merged per-lang CDF is
    broadcast once, and pass 2 maps each row to rank = CDF(value-1)+1 —
    SQL's RANK() semantics (ties share the smallest rank). Corpus never
    moves; the exchange is the histogram."""
    import ray as _ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    hist = (
        ds.map_batches(hist_partial, batch_format="pandas")
        .to_pandas()
        .groupby(["lang", "n_chars"], as_index=False)["c"]
        .sum()
    )
    # per-lang cumulative counts of STRICTLY smaller values -> rank base
    hist = hist.sort_values(["lang", "n_chars"], kind="stable")
    hist["below"] = hist.groupby("lang")["c"].cumsum() - hist["c"]
    lut = {
        lang: (g["n_chars"].to_numpy(), g["below"].to_numpy())
        for lang, g in hist.groupby("lang")
    }
    lut_ref = _ray.put(lut)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        table = _ray.get(lut_ref)
        ranks = np.empty(len(df), dtype=np.int64)
        langs = df["lang"].to_numpy()
        vals = df["n_chars"].to_numpy()
        for lang in pd.unique(langs):
            m = langs == lang
            v, below = table[lang]
            ranks[m] = below[np.searchsorted(v, vals[m])] + 1
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy().astype(np.int64),
                "lang": langs,
                "len_rank": ranks,
            }
        )

    return ds.map_batches(attach, batch_format="pandas")


def q_group_distinct(sf_dir):
    """Exact distinct-count per group (distinct users per event type):
    per-batch LOCAL dedup first, so the exchange carries distinct
    (event_type, user_id) pairs per batch — bounded by the true distinct
    count times batch overlap, never the event count — then one
    dedup+count over the pair stream. The sketch-sized alternative is
    per-group HLL registers; this is the exact form."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users": np.array([g["user_id"].nunique()], dtype=np.int64),
            }
        )

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby("event_type")
        .map_groups(count, batch_format="pandas")
    )


def q_group_quantile_sketch(sf_dir):
    """Per-group approximate quantiles (value distribution per event
    type) via one KLL sketch per group: batch partials hold a dict of
    group -> sketch bytes (group-count bounded, like the per-group HLL
    alternative), merged associatively. Group cardinality here is
    event-type-sized; web-scale group counts (per-domain) would route
    through the hash-partitioned merge instead — documented at the
    operator. rows-only gate entry (approximate by design; pytest pins
    the per-group 1% rank-error envelope)."""
    from ..functions.sketch import KLLSketch

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            rows.append((et, KLLSketch().update(g["value"].to_numpy()).to_bytes()))
        return pd.DataFrame(rows, columns=["event_type", "sketch"])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged: dict[str, KLLSketch] = {}
    for et, blob in zip(parts["event_type"], parts["sketch"]):
        s = KLLSketch.from_bytes(blob)
        if et in merged:
            merged[et].merge(s)
        else:
            merged[et] = s
    qs = (0.5, 0.9, 0.99)
    out = {
        "event_type": sorted(merged),
        **{
            f"p{int(q * 100)}": [merged[et].quantile(q) for et in sorted(merged)]
            for q in qs
        },
    }
    return pd.DataFrame(out)


def q_quantile_sketch(sf_dir):
    """Approximate quantiles of an UNBOUNDED double column via the
    mergeable KLL sketch (functions/sketch.py::KLLSketch): each task
    folds its batch into ~k*log(n/k) retained doubles, partials merge
    associatively on the driver (sketch bytes only — the value column
    never shuffles). The exact histogram-CDF operator
    (length_percentiles) needs a bounded value domain; this is the
    general-domain path. rows-only gate entry (approximate by design;
    test_quantile_sketch.py pins the <=1% rank-error envelope and
    bit-reproducibility)."""
    from ..functions.sketch import KLLSketch

    ds = _read(sf_dir, "events", columns=["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = KLLSketch().update(df["value"].to_numpy())
        return pd.DataFrame({"sketch": [s.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = KLLSketch()
    for blob in parts["sketch"]:
        merged.merge(KLLSketch.from_bytes(blob))
    qs = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    return pd.DataFrame(
        {
            "q": np.array(qs, dtype=np.float64),
            "value_est": np.array([merged.quantile(q) for q in qs]),
        }
    )


def q_top_revenue_customers(sf_dir):
    """TPC-H Q3/Q10-shaped multi-join analytics: lineitem ⋈ orders ⋈
    customer, revenue per customer over the 1996 ship year, top 10.
    The composition the engine's join/agg primitives exist for, staged
    scale-first: (1) lineitem filtered AND pre-aggregated to
    (orderkey, cents) partials inside each batch BEFORE any exchange;
    (2) a bucket-partitioned join with orders on orderkey (both sides
    large; B sized from row count), each bucket emitting (custkey,
    cents) partials — never row-level join output; (3) a tiny
    groupby-sum over customer count rows; (4) customer names broadcast;
    (5) global top-10 via sort+limit on the already-small aggregate.
    Revenue is exact integer cents — floor(ep * (1 - disc) * 100 + .5)
    with the identical IEEE tree in numpy and the SQL oracle — so sums
    are order-free and the hash compare is exact."""
    import ray as _ray

    li = _read_split(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    n_orders = orders.count()
    B = max(16, -(-n_orders // JOIN_BUCKET_TARGET_ROWS))
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = df["l_shipdate"].to_numpy()
        m = (sd >= lo) & (sd < hi)
        ep = df["l_extendedprice"].to_numpy()[m]
        disc = df["l_discount"].to_numpy()[m]
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        ok = df["l_orderkey"].to_numpy()[m]
        agg = pd.DataFrame({"key": ok, "cents": cents}).groupby(
            "key", sort=False, as_index=False
        )["cents"].sum()
        return pd.DataFrame(
            {
                "key": agg["key"].astype(np.int64),
                "cents": agg["cents"].astype(np.int64),
                "cust": np.int64(-1),
                "bucket": (agg["key"] % B).astype("int32"),
            }
        )

    def o_tag(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "key": k,
                "cents": np.int64(0),
                "cust": df["o_custkey"].to_numpy().astype(np.int64),
                "bucket": (k % B).astype("int32"),
            }
        )

    both = li.map_batches(
        li_partial, batch_format="pandas", batch_size=None
    ).union(orders.map_batches(o_tag, batch_format="pandas", batch_size=None))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        fact = g[g["cust"] < 0][["key", "cents"]]
        dim = g[g["cust"] >= 0][["key", "cust"]].drop_duplicates("key")
        out = fact.merge(dim, on="key", how="inner")
        agg = out.groupby("cust", sort=False, as_index=False)["cents"].sum()
        return pd.DataFrame(
            {
                "cust": agg["cust"].astype(np.int64),
                "cents": agg["cents"].astype(np.int64),
                # second-stage key: ALL of a customer's per-orderkey-
                # bucket partials share cust % B, so one map_groups
                # completes each customer's total exactly
                "bucket2": (agg["cust"] % B).astype("int32"),
            }
        )

    def sum_topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # exact per-customer totals (this bucket owns every partial of
        # its customers), then a top-10 PARTIAL: the global top-10 is a
        # subset of the per-bucket top-10s, so only 10 rows leave
        agg = g.groupby("cust", sort=False, as_index=False)["cents"].sum()
        agg = agg.sort_values(
            ["cents", "cust"], ascending=[False, True], kind="stable"
        ).head(10)
        return pd.DataFrame(
            {
                "o_custkey": agg["cust"].astype(np.int64),
                "revenue_cents": agg["cents"].astype(np.int64),
            }
        )

    if n_orders <= JOIN_BROADCAST_LIMIT_ROWS:
        # broadcast-dim fast path (the MEASURED dim size picks it): the
        # (orderkey -> custkey) map ships once via ray.put and the fact
        # side joins in-map with a vectorized searchsorted probe — the
        # only exchange left is the tiny (cust, cents) partial groupby.
        # Above the limit the general both-sides-large bucket join runs.
        od = orders.to_pandas()
        ok_all = od["o_orderkey"].to_numpy().astype(np.int64)
        order = np.argsort(ok_all, kind="stable")
        dim_ref = _ray.put(
            (ok_all[order], od["o_custkey"].to_numpy().astype(np.int64)[order])
        )

        def li_cust_partial(df: pd.DataFrame) -> pd.DataFrame:
            sd = df["l_shipdate"].to_numpy()
            m = (sd >= lo) & (sd < hi)
            ep = df["l_extendedprice"].to_numpy()[m]
            disc = df["l_discount"].to_numpy()[m]
            cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
            ok = df["l_orderkey"].to_numpy()[m].astype(np.int64)
            keys, custs = _ray.get(dim_ref)
            at = np.searchsorted(keys, ok)
            at[at == len(keys)] = 0
            hit = keys[at] == ok  # inner-join semantics
            agg = pd.DataFrame(
                {"cust": custs[at[hit]], "cents": cents[hit]}
            ).groupby("cust", sort=False, as_index=False)["cents"].sum()
            cust = agg["cust"].to_numpy().astype(np.int64)
            return pd.DataFrame(
                {
                    "cust": cust,
                    "cents": agg["cents"].to_numpy().astype(np.int64),
                    "bucket2": (cust % B).astype("int32"),
                }
            )

        cand = (
            li.map_batches(
                li_cust_partial, batch_format="pandas", batch_size=None
            )
            .groupby("bucket2")
            .map_groups(sum_topk_bucket, batch_format="pandas")
        )
    else:
        cand = (
            both.groupby("bucket")
            .map_groups(join_bucket, batch_format="pandas")
            .groupby("bucket2")
            .map_groups(sum_topk_bucket, batch_format="pandas")
        )
    names = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .to_pandas()
        .drop_duplicates("c_custkey")
    )
    names_ref = _ray.put(names)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        # <= 10*B candidate rows: one vectorized merge, not a sort shuffle
        top = df.sort_values(
            ["revenue_cents", "o_custkey"], ascending=[False, True], kind="stable"
        ).head(10)
        nm = _ray.get(names_ref).rename(columns={"c_custkey": "o_custkey"})
        out = top.merge(nm, on="o_custkey", how="inner")
        return pd.DataFrame(
            {
                "c_custkey": out["o_custkey"].astype(np.int64),
                "c_name": out["c_name"],
                "revenue_cents": out["revenue_cents"].astype(np.int64),
            }
        )

    # batch_size=None: the single repartitioned block arrives whole
    return cand.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


# ------------------------------------------- round-5 relational additions


def q_cube_counts(sf_dir):
    """GROUP BY CUBE(lang, source) in ONE corpus pass (the rollup's
    2-D sibling): fine (lang, source) partials aggregate inside each
    batch, one small exchange sums them, and the three coarser
    granularities — per-lang, per-source, grand total — fold from the
    already-tiny fine table (|langs| x |sources| rows) with NULL
    marking rolled-up levels exactly as SQL does. No second corpus
    read, no extra shuffle."""
    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.TableGroupBy(t, ["lang", "source"])
            .aggregate([("lang", "count")])
            .rename_columns(["lang", "source", "n"])
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("n")
    )

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"sum(n)": "n"})
        by_lang = df.groupby("lang", as_index=False)["n"].sum()
        by_lang["source"] = None
        by_src = df.groupby("source", as_index=False)["n"].sum()
        by_src["lang"] = None
        grand = pd.DataFrame({"lang": [None], "source": [None], "n": [df["n"].sum()]})
        cols = ["lang", "source", "n"]
        out = pd.concat(
            [df[cols], by_lang[cols], by_src[cols], grand[cols]], ignore_index=True
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    # the fine table is group-count sized; fold all CUBE levels in one task
    return fine.repartition(1).map_batches(
        widen, batch_format="pandas", batch_size=None
    )


def q_grouping_sets(sf_dir):
    """GROUP BY GROUPING SETS ((lang), (source)) — the third member of
    the ROLLUP/CUBE family: the same one-pass fine partials as the
    CUBE, but only the two single-column granularities fold from the
    group-count-sized fine table, NULL marking the absent column."""
    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.TableGroupBy(t, ["lang", "source"])
            .aggregate([("lang", "count")])
            .rename_columns(["lang", "source", "n"])
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("n")
    )

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"sum(n)": "n"})
        by_lang = df.groupby("lang", as_index=False)["n"].sum()
        by_lang["source"] = None
        by_src = df.groupby("source", as_index=False)["n"].sum()
        by_src["lang"] = None
        cols = ["lang", "source", "n"]
        out = pd.concat([by_lang[cols], by_src[cols]], ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    return fine.repartition(1).map_batches(
        widen, batch_format="pandas", batch_size=None
    )


def _user_type_bits(sf_dir, a: str, b: str, min_value: float) -> ray.data.Dataset:
    """Shared INTERSECT/EXCEPT core: one corpus pass emits per-batch
    (user_id, in_a, in_b) bit partials (batch-local groupby, so the
    exchange carries at most |distinct users| x batch-overlap rows,
    never the event count), then one groupby folds the bits."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def tag(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        t2 = t.filter(
            pc.and_(
                pc.or_(pc.equal(et, a), pc.equal(et, b)),
                pc.greater(t.column("value"), min_value),
            )
        )
        g = pa.table(
            {
                "user_id": t2.column("user_id"),
                "in_a": pc.cast(pc.equal(t2.column("event_type"), a), pa.int64()),
                "in_b": pc.cast(pc.equal(t2.column("event_type"), b), pa.int64()),
            }
        )
        return (
            pa.TableGroupBy(g, "user_id")
            .aggregate([("in_a", "max"), ("in_b", "max")])
            .rename_columns(["user_id", "in_a", "in_b"])
        )

    n_rows = ds.count()
    B = max(8, -(-n_rows // JOIN_BUCKET_TARGET_ROWS))

    def bucketed(t: pa.Table) -> pa.Table:
        t = tag(t)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((uid % B).astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # per-bucket pandas fold of both bit columns in one C pass —
        # not groupby(...).max([2 cols]), whose per-key-per-column
        # Python cost dominates at high key cardinality
        out = g.groupby("user_id", sort=False, as_index=False)[["in_a", "in_b"]].max()
        out["user_id"] = out["user_id"].astype(np.int64)
        return out

    return (
        ds.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


def q_set_intersect_users(sf_dir):
    """INTERSECT set semantics (distinct users who both clicked AND
    purchased, both on high-value events) as bit-OR partials + one key
    exchange — never a two-sided distinct + join."""
    bits = _user_type_bits(sf_dir, "click", "purchase", 90.0)
    return bits.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t.column("in_a"), 1), pc.equal(t.column("in_b"), 1))
        ).select(["user_id"]),
        batch_format="pyarrow",
    )


def q_set_except_users(sf_dir):
    """EXCEPT set semantics (users who clicked but never purchased) from
    the same bit partials as the INTERSECT — a side-bit anti filter, not
    an anti-join shuffle."""
    bits = _user_type_bits(sf_dir, "click", "purchase", 90.0)
    return bits.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t.column("in_a"), 1), pc.equal(t.column("in_b"), 0))
        ).select(["user_id"]),
        batch_format="pyarrow",
    )


_PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_event_counts(sf_dir):
    """PIVOT to wide columns (per-user count per event type): each batch
    cross-tabs locally into the fixed column set, so the exchange carries
    one row per (user x batch) with 5 int columns — then a single
    groupby-sum folds partials. The column domain is static (schema must
    be, on a Dataset); data-driven domains need a tiny distinct pre-pass."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cols = [f"n_{t}" for t in _PIVOT_EVENT_TYPES]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # one bincount over uid_idx * K + type_code — no per-type pass,
        # no crosstab; unknown event types (code -1) drop out
        code = pd.Categorical(
            df["event_type"], categories=list(_PIVOT_EVENT_TYPES)
        ).codes.astype(np.int64)
        uids, uidx = np.unique(df["user_id"].to_numpy(np.int64), return_inverse=True)
        k = len(_PIVOT_EVENT_TYPES)
        m = code >= 0
        counts = np.bincount(uidx[m] * k + code[m], minlength=len(uids) * k).reshape(
            len(uids), k
        )
        out = {"user_id": uids}
        for j, c in enumerate(cols):
            out[c] = counts[:, j].astype(np.int64)
        return pd.DataFrame(out)

    # fold partials with the bucket map_groups idiom, NOT
    # groupby(...).sum(cols): Ray's multi-column aggregate pays a
    # per-key-per-column Python cost (measured ~6x for 5 columns) while
    # a per-bucket pandas groupby folds all 5 columns in one C pass;
    # each user lands in exactly one bucket so the fold is final
    n_rows = ds.count()
    B = max(8, -(-n_rows // JOIN_BUCKET_TARGET_ROWS))

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = partial(df)
        out["bucket"] = (out["user_id"] % B).astype("int32")
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", sort=False, as_index=False)[cols].sum()
        out["user_id"] = out["user_id"].astype(np.int64)
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ds.map_batches(bucketed, batch_format="pandas", batch_size=None)
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


def q_corr_by_group(sf_dir):
    """Per-group Pearson correlation (quantity vs extended price by
    return flag) as a purely ALGEBRAIC aggregate: each batch folds to
    (n, Σx, Σy, Σxy, Σx², Σy²) per group, one tiny exchange sums the
    six moments, and the final task computes
    (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²)) — the same closed form
    sample/population correlation reduces to. Nothing row-level ever
    crosses the wire."""
    ds = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(dtype=np.float64)
        y = df["l_extendedprice"].to_numpy(dtype=np.float64)
        d = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "n": 1.0,
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
                "syy": y * y,
            }
        )
        return d.groupby("l_returnflag", sort=False, as_index=False).sum()

    mom_cols = ["n", "sx", "sy", "sxy", "sxx", "syy"]
    agg = (
        ds.map_batches(moments, batch_format="pandas")
        .groupby("l_returnflag")
        .sum(mom_cols)
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={f"sum({c})": c for c in mom_cols})
        n = df["n"].to_numpy()
        sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
        sxy, sxx, syy = df["sxy"].to_numpy(), df["sxx"].to_numpy(), df["syy"].to_numpy()
        num = n * sxy - sx * sy
        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "corr_qp": np.round(num / den, 6),
            }
        )

    return agg.map_batches(final, batch_format="pandas")


def q_exists_semi_groupby(sf_dir):
    """EXISTS semi-join aggregate (TPC-H Q4 shape: order priorities with
    at least one line shipped after the order date) in ONE key exchange:
    lineitem folds to per-batch (orderkey, max ship) partials — the only
    reduction EXISTS(ship > odate) needs — orders tag their (odate,
    priority), both streams union and ONE bucket exchange co-locates each
    orderkey; the per-bucket task folds max-ship vs odate, applies the
    predicate and pre-counts priorities, so only (prio_code, n) partials
    leave it. The exchange is ALL-integer: priorities map to dense codes
    via a domain pre-pass (per-batch unique over the pruned priority
    column — O(|domain| x blocks) rows reach the driver). No join
    materializes row-level output."""
    import ray as _ray

    li = _read_split(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    dom = sorted(
        _read(sf_dir, "orders", columns=["o_orderpriority"])
        .map_batches(lambda df: df.drop_duplicates(), batch_format="pandas")
        .to_pandas()["o_orderpriority"]
        .drop_duplicates()
        .tolist()
    )
    dom_ref = _ray.put(dom)

    n_orders = orders.count()
    B = max(8, -(-(5 * n_orders) // JOIN_BUCKET_TARGET_ROWS))
    n_dom = len(dom)

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", sort=False, as_index=False)["l_shipdate"].max()
        key = g["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": key,
                "ship_us": g["l_shipdate"].astype("datetime64[us]").astype(np.int64),
                "odate_us": np.int64(-1),
                "prio_code": np.int64(-1),
                "bucket": (key % B).astype("int32"),
            }
        )

    def ord_tag(df: pd.DataFrame) -> pd.DataFrame:
        code = pd.Categorical(
            df["o_orderpriority"], categories=_ray.get(dom_ref)
        ).codes.astype(np.int64)
        key = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": key,
                "ship_us": np.int64(-1),
                "odate_us": df["o_orderdate"].astype("datetime64[us]").astype(np.int64),
                "prio_code": code,
                "bucket": (key % B).astype("int32"),
            }
        )

    u = li.map_batches(li_partial, batch_format="pandas").union(
        orders.map_batches(ord_tag, batch_format="pandas")
    )

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one C-speed pandas groupby folds all three columns; the
        # predicate + priority count complete INSIDE the bucket task, so
        # only (prio_code, n) partials leave it. NOT groupby(...).max
        # on 3 columns — Ray's multi-column aggregate pays a per-key
        # per-column Python cost (measured 51 s vs 2.4 s single-col on
        # 150k keys at sf0.1)
        m = g.groupby("o_orderkey", sort=False)[
            ["ship_us", "odate_us", "prio_code"]
        ].max()
        # odate >= 0: the order row arrived (guards orphan lineitems)
        keep = (m["odate_us"].to_numpy() >= 0) & (
            m["ship_us"].to_numpy() > m["odate_us"].to_numpy()
        )
        counts = np.bincount(m["prio_code"].to_numpy(np.int64)[keep], minlength=n_dom)
        nz = np.nonzero(counts)[0]
        return pd.DataFrame(
            {"prio_code": nz.astype(np.int64), "n": counts[nz].astype(np.int64)}
        )

    out = (
        u.groupby("bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .groupby("prio_code")
        .sum("n")
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df.columns = ["prio_code", "n"]
        names = _ray.get(dom_ref)
        return pd.DataFrame(
            {
                "o_orderpriority": [names[c] for c in df["prio_code"]],
                "n": df["n"].astype(np.int64),
            }
        )

    return out.map_batches(final, batch_format="pandas")


def q_explode_tokens(sf_dir):
    """flat_map explode (one row per token) fully in Arrow: split to a
    ListArray, flatten the values buffer, gather doc_id by
    list_parent_indices — zero Python per row, zero copies of the token
    bytes beyond the split itself. The inverse of the corpus
    aggregations (vocab/tf-idf) and the building block any
    tokenize-to-rows pipeline needs."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parents = pc.list_parent_indices(toks)
        return pa.table(
            {
                "doc_id": pc.take(t.column("doc_id").combine_chunks(), parents),
                "token": pc.list_flatten(toks),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def q_funnel_steps(sf_dir):
    """Ordered-funnel analytics (view → click-after-view →
    purchase-after-click, earliest qualifying timestamp per step): the
    corpus pass keeps only funnel-step rows (map-only filter), ONE
    exchange co-locates each user's events, and the per-user resolve is
    a three-min scan over that user's handful of rows. Strict event
    ordering is resolved per user, never via a global sort."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    steps = pa.array(["view", "click", "purchase"])

    def pre(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("event_type"), value_set=steps))

    sentinel = np.iinfo(np.int64).max

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized three-step chain per bucket: minimum.reduceat per
        # segment resolves each step's earliest qualifying timestamp for
        # every user at once — no per-user Python call
        s = _Segs(g)
        u, ts, seg_id, start_idx = s.u, s.ts, s.seg_id, s.start_idx
        if len(u) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "view_ts": pd.Series([], dtype="datetime64[us]"),
                    "click_ts": pd.Series([], dtype="datetime64[us]"),
                    "purchase_ts": pd.Series([], dtype="datetime64[us]"),
                }
            )
        et = g["event_type"].to_numpy()[s.order]
        v = np.minimum.reduceat(np.where(et == "view", ts, sentinel), start_idx)
        c = np.minimum.reduceat(
            np.where((et == "click") & (ts > v[seg_id]), ts, sentinel), start_idx
        )
        p = np.minimum.reduceat(
            np.where((et == "purchase") & (ts > c[seg_id]), ts, sentinel), start_idx
        )
        keep = (v < sentinel) & (c < sentinel) & (p < sentinel)
        return pd.DataFrame(
            {
                "user_id": u[start_idx][keep],
                "view_ts": v[keep].astype("datetime64[us]"),
                "click_ts": c[keep].astype("datetime64[us]"),
                "purchase_ts": p[keep].astype("datetime64[us]"),
            }
        )

    return _window_buckets(ds.map_batches(pre, batch_format="pyarrow"), fold)


def q_shipping_priority(sf_dir):
    """TPC-H Q3 (shipping priority): top-10 unshipped-order revenue for
    one market segment at a date cutoff. Staged broadcast-dim style:
    customer filters to the segment's keys (a fixed fraction of a DIM
    table — broadcast once via ray.put), orders filter by date + segment
    membership into a (orderkey → odate, priority) dim, lineitem filters
    by shipdate and pre-aggregates exact integer-cent revenue per
    orderkey INSIDE each batch against the broadcast dim; one tiny
    groupby-sum + a sort-limit on the aggregate finish. For a
    non-selective dim the bucket-join form (q_top_revenue_customers)
    is the fallback — documented, same output contract."""
    import ray as _ray

    cutoff = np.datetime64("1998-01-01")
    seg = "BUILDING"
    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("c_mktsegment"), seg)).select(
                ["c_custkey"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    # an all-empty filtered Dataset loses its schema on to_pandas
    ckeys = (
        np.sort(cust["c_custkey"].to_numpy().astype(np.int64))
        if "c_custkey" in cust.columns
        else np.array([], dtype=np.int64)
    )
    ckeys_ref = _ray.put(ckeys)

    def ord_dim(df: pd.DataFrame) -> pd.DataFrame:
        od = df["o_orderdate"].to_numpy()
        ck = df["o_custkey"].to_numpy().astype(np.int64)
        _at, hit = _dim_lookup(_ray.get(ckeys_ref), ck)
        m = (od < cutoff) & hit
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy()[m].astype(np.int64),
                "o_orderdate": df["o_orderdate"].to_numpy()[m],
                "o_orderpriority": df["o_orderpriority"].to_numpy()[m],
            }
        )

    dim = (
        _read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        )
        .map_batches(ord_dim, batch_format="pandas")
        .to_pandas()
    )
    if "o_orderkey" not in dim.columns:  # empty dim: schema was dropped
        return pd.DataFrame(
            {
                "l_orderkey": pd.Series([], dtype=np.int64),
                "revenue_cents": pd.Series([], dtype=np.int64),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_orderpriority": pd.Series([], dtype=str),
            }
        )
    order = np.argsort(dim["o_orderkey"].to_numpy(), kind="stable")
    dim = dim.iloc[order].reset_index(drop=True)
    dim_keys_ref = _ray.put(dim["o_orderkey"].to_numpy().astype(np.int64))

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = df["l_shipdate"].to_numpy()
        m = sd > cutoff
        ok = df["l_orderkey"].to_numpy()[m].astype(np.int64)
        ep = df["l_extendedprice"].to_numpy()[m]
        disc = df["l_discount"].to_numpy()[m]
        _at, hit = _dim_lookup(_ray.get(dim_keys_ref), ok)
        cents = np.floor(ep[hit] * (1.0 - disc[hit]) * 100 + 0.5).astype(np.int64)
        agg = pd.DataFrame({"l_orderkey": ok[hit], "cents": cents}).groupby(
            "l_orderkey", sort=False, as_index=False
        )["cents"].sum()
        return pd.DataFrame(
            {
                "l_orderkey": agg["l_orderkey"].astype(np.int64),
                "cents": agg["cents"].astype(np.int64),
            }
        )

    li = _read_split(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    dim_ref = _ray.put(dim)
    BQ = max(16, -(-len(dim) // JOIN_BUCKET_TARGET_ROWS))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (df["l_orderkey"].to_numpy(np.int64) % BQ).astype("int32")
        return df

    def fold_topk(g: pd.DataFrame) -> pd.DataFrame:
        # bucket fold + per-bucket top-10 prune: the orderkey aggregate
        # folds in one C-speed pandas pass per bucket (never Ray's
        # per-key aggregate — see the SCALE.md engine rule), and only
        # each bucket's own top-10 reach the final task
        s = g.groupby("l_orderkey", sort=False, as_index=False)["cents"].sum()
        s = s.rename(columns={"cents": "revenue_cents"})
        s["revenue_cents"] = s["revenue_cents"].astype(np.int64)
        return s.sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True], kind="stable"
        ).head(10)

    agg = (
        li.map_batches(li_partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold_topk, batch_format="pandas")
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        top = df.sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True], kind="stable"
        ).head(10)
        d = _ray.get(dim_ref).rename(columns={"o_orderkey": "l_orderkey"})
        out = top.merge(d, on="l_orderkey", how="inner")
        return pd.DataFrame(
            {
                "l_orderkey": out["l_orderkey"].astype(np.int64),
                "revenue_cents": out["revenue_cents"].astype(np.int64),
                "o_orderdate": out["o_orderdate"].astype("datetime64[us]"),
                "o_orderpriority": out["o_orderpriority"],
            }
        )

    return agg.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def q_moving_sum_time(sf_dir):
    """Time-RANGE window frame parity (SUM OVER ... RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW): unlike the ROWS frame
    (q_moving_sum), the window is defined by the ORDER-BY VALUE — all
    events within the trailing hour, peers of the current timestamp
    included, exactly as SQL's RANGE frame does. Per user: one sort,
    one cumsum, two searchsorted — O(n log n) per group, no per-row
    Python."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    hour_us = 3_600_000_000

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u, ts, eid, starts, seg_id, start_idx, cents = _user_segments(g, "value")
        if len(u) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "hour_cents": pd.Series([], dtype=np.int64),
                }
            )
        # composite key: per-segment rebased timestamps separated by
        # gaps > the window, so ONE searchsorted pair serves every user
        # in the bucket and k - window never reaches a previous segment.
        # Magnitude check: cum spans <= n*(span+H) ~ 1e15 << 2^63.
        end_idx = np.concatenate((start_idx[1:], [len(u)])) - 1
        seg_min, seg_max = ts[start_idx], ts[end_idx]
        span = seg_max - seg_min + hour_us + 2
        base = np.concatenate(([0], np.cumsum(span)))[:-1]
        k = ts - seg_min[seg_id] + base[seg_id]
        csum = np.concatenate(([0], np.cumsum(cents)))
        hi = np.searchsorted(k, k, side="right")  # peers included
        lo = np.searchsorted(k, k - hour_us, side="left")  # boundary inclusive
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": u,
                "hour_cents": (csum[hi] - csum[lo]).astype(np.int64),
            }
        )

    return _window_buckets(ds, fold)


def q_latest_event_per_user(sf_dir):
    """Argmax-per-group (the keep-latest-crawl / keep-best-scored-dup
    selection shape): each batch keeps its own per-user latest row, so
    the exchange carries one row per (user x batch); the bucket fold
    repeats the same vectorized tail(1) to finish. Ties on the
    timestamp break to the larger event_id on both sides."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    n_rows = ds.count()
    B = max(8, -(-n_rows // JOIN_BUCKET_TARGET_ROWS))

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["user_id", "ts", "event_id"], kind="stable")
            .groupby("user_id", sort=False)
            .tail(1)
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = keep_latest(df).copy()
        df["bucket"] = (df["user_id"].to_numpy(np.int64) % B).astype("int32")
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return keep_latest(g)[["user_id", "ts", "event_id", "event_type"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


def q_event_transitions(sf_dir):
    """First-order transition counts over per-user event sequences (the
    Markov statistic behind session modeling and bot detection): one
    exchange co-locates each user's events; inside the group a lexsort
    + shift pairs every event with its successor, and the group emits
    (prev, next, n) COUNT partials — the tiny 5x5 transition matrix is
    all that reaches the final groupby, never event rows."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over the whole bucket: successor pairs are adjacent
        # sorted rows with the same user; one pandas size() counts them
        s = _Segs(g)
        if len(s.u) < 2:
            return pd.DataFrame(
                {
                    "prev_type": pd.Series([], dtype=str),
                    "next_type": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        et = g["event_type"].to_numpy()[s.order]
        same = s.u[1:] == s.u[:-1]
        p = (
            pd.DataFrame({"prev_type": et[:-1][same], "next_type": et[1:][same]})
            .groupby(["prev_type", "next_type"], sort=False, as_index=False)
            .size()
        )
        return pd.DataFrame(
            {
                "prev_type": p["prev_type"],
                "next_type": p["next_type"],
                "n": p["size"].astype(np.int64),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["prev_type", "next_type"], sort=False, as_index=False)["n"].sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    # the bucket partials are |types|^2-bounded: fold them in one tiny task
    return (
        _window_buckets(ds, bucket_fold)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def q_orphan_orders(sf_dir):
    """Referential-integrity audit (foreign-key violations — the
    data-quality gate every ingest runs before training joins): a
    one-row summary of orders whose custkey has no customer row, plus
    the totals that contextualize it. The dimension's keys broadcast
    once (sorted array + searchsorted membership, the
    anti_join_broadcast shape); the fact table never shuffles — each
    batch emits 3 ints and one groupby-free fold finishes. A planted
    pytest (tests/test_relational_round5.py) proves violations are
    actually counted."""
    import ray as _ray

    cust = _read(sf_dir, "customer", columns=["c_custkey"]).to_pandas()
    keys = np.sort(cust["c_custkey"].to_numpy().astype(np.int64))
    keys_ref = _ray.put(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ck = df["o_custkey"].to_numpy().astype(np.int64)
        _at, hit = _dim_lookup(_ray.get(keys_ref), ck)
        bad = ~hit
        return pd.DataFrame(
            {
                "n_orphans": [np.int64(bad.sum())],
                "n_orders": [np.int64(len(ck))],
                "n_custkeys": [np.int64(len(pd.unique(ck)))],
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # n_custkeys from partials over-counts across batches; it is
        # recomputed exactly below via a per-batch distinct exchange
        return pd.DataFrame(
            {
                "n_orphans": [np.int64(df["n_orphans"].sum())],
                "n_orders": [np.int64(df["n_orders"].sum())],
            }
        )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    summary = (
        orders.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    # per-batch dedup bounds the exchange at distinct keys x batch
    # overlap; the single fold holds only the dimension-sized key set
    n_ck = np.int64(
        _read(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(lambda df: df.drop_duplicates(), batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda df: pd.DataFrame({"n": [np.int64(df["o_custkey"].nunique())]}),
            batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()["n"]
        .iloc[0]
    )
    return pd.DataFrame(
        {
            "n_orphans": summary["n_orphans"].astype(np.int64),
            "n_orders": summary["n_orders"].astype(np.int64),
            "n_custkeys": [n_ck],
        }
    )


def q_bigram_counts(sf_dir):
    """Adjacent token-pair counting (the first statistic a BPE/WordPiece
    tokenizer trainer needs): bigrams are formed WITHOUT materializing
    per-row Python lists — one Arrow split, then numpy index arithmetic
    over the flat token buffer and list offsets pairs every token with
    its successor inside the same document; per-batch (w1, w2, n)
    partials bound the exchange at distinct-bigrams-per-batch, one
    groupby sums, per-block top-k prunes before the single final task.
    Top-100 by count with lexicographic tiebreak."""
    ds = _read_split(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_pandas().to_numpy(dtype=object)
        offs = toks.offsets.to_numpy()
        starts, ends = offs[:-1], offs[1:]
        keep = np.ones(len(flat), dtype=bool)
        keep[ends[ends > starts] - 1] = False  # last token of each doc
        idx = np.nonzero(keep)[0]
        # single space-joined key: tokens cannot contain the separator
        # (they came from splitting on it), and a ONE-column string key
        # exchanges ~2x faster than a two-column groupby key
        bg = np.char.add(
            np.char.add(flat[idx].astype(str), " "), flat[idx + 1].astype(str)
        )
        g = pd.DataFrame({"bg": bg}).groupby("bg", sort=False, as_index=False).size()
        return pd.DataFrame({"bg": g["bg"], "n": g["size"].astype(np.int64)})

    # hash-partitioned merge (the vocab_topk idiom): the exchange key is
    # a small int partition, each partition folds its bigrams in ONE
    # vectorized pandas groupby and emits only its own top-100 — a
    # direct groupby on the bigram string sorts the whole distinct-
    # bigram table through the exchange instead (measured ~3x slower)
    P = 64

    def add_pt(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import stable_hash_strings

        df = df.copy()
        df["pt"] = (
            stable_hash_strings(df["bg"].to_numpy()) % np.uint64(P)
        ).astype(np.int64)
        return df

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype(np.int64)
        return df.sort_values(
            ["n", "bg"], ascending=[False, True], kind="stable"
        ).head(100)

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("bg", sort=False, as_index=False)["n"].sum()
        return block_topk(g)[["bg", "n"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        top = block_topk(df)
        parts = top["bg"].str.split(" ", n=1, expand=True)
        return pd.DataFrame(
            {"w1": parts[0], "w2": parts[1], "n": top["n"].astype(np.int64)}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .map_batches(add_pt, batch_format="pandas")
        .groupby("pt")
        .map_groups(merge, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def q_local_supplier_revenue(sf_dir):
    """TPC-H Q5 (local supplier volume): revenue per nation where the
    CUSTOMER and the SUPPLIER sit in the same nation of one region, for
    one order year. The deepest join composition in the registry —
    region/nation/customer/supplier are true dimensions (broadcast as
    sorted key arrays once), the two FACTS join on orderkey through ONE
    bucket exchange: lineitem pre-aggregates (orderkey, supp_nation,
    cents) partials inside each batch after the supplier-nation
    broadcast filter, orders carry (orderkey, cust_nation), and each
    bucket's pandas merge applies the same-nation constraint and folds
    to (nation, cents) partials — row-level join output never leaves a
    task."""
    import ray as _ray

    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    rkey = int(region.loc[region["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    asia = nation[nation["n_regionkey"] == rkey]
    asia_keys = np.sort(asia["n_nationkey"].to_numpy(np.int64))
    names = dict(zip(asia["n_nationkey"].astype(int), asia["n_name"]))

    def _dim(table: str, key: str, val: str) -> tuple:
        df = _read(sf_dir, table, columns=[key, val]).to_pandas()
        order = np.argsort(df[key].to_numpy(np.int64), kind="stable")
        return (
            df[key].to_numpy(np.int64)[order],
            df[val].to_numpy(np.int64)[order],
        )

    cust_ref = _ray.put(_dim("customer", "c_custkey", "c_nationkey"))
    supp_ref = _ray.put(_dim("supplier", "s_suppkey", "s_nationkey"))
    asia_ref = _ray.put(asia_keys)
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    n_orders = orders.count()
    B = max(16, -(-n_orders // JOIN_BUCKET_TARGET_ROWS))

    def _lookup(keys: np.ndarray, vals: np.ndarray, k: np.ndarray):
        at, hit = _dim_lookup(keys, k)
        return (vals[at] if len(keys) else np.zeros(len(k), np.int64)), hit

    def ord_tag(df: pd.DataFrame) -> pd.DataFrame:
        od = df["o_orderdate"].to_numpy()
        m = (od >= lo) & (od < hi)
        ok = df["o_orderkey"].to_numpy(np.int64)[m]
        ck = df["o_custkey"].to_numpy(np.int64)[m]
        ckeys, cnats = _ray.get(cust_ref)
        nat, hit = _lookup(ckeys, cnats, ck)
        _at2, in_asia = _dim_lookup(_ray.get(asia_ref), nat)
        keep = hit & in_asia
        return pd.DataFrame(
            {
                "o_orderkey": ok[keep],
                "nat": nat[keep],
                "cents": np.int64(0),
                "side": np.int8(0),
                "bucket": (ok[keep] % B).astype("int32"),
            }
        )

    def li_tag(df: pd.DataFrame) -> pd.DataFrame:
        sk = df["l_suppkey"].to_numpy(np.int64)
        skeys, snats = _ray.get(supp_ref)
        nat, hit = _lookup(skeys, snats, sk)
        _at2, in_asia = _dim_lookup(_ray.get(asia_ref), nat)
        keep = hit & in_asia
        ep = df["l_extendedprice"].to_numpy()[keep]
        disc = df["l_discount"].to_numpy()[keep]
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "o_orderkey": df["l_orderkey"].to_numpy(np.int64)[keep],
                    "nat": nat[keep],
                    "cents": cents,
                }
            )
            .groupby(["o_orderkey", "nat"], sort=False, as_index=False)["cents"]
            .sum()
        )
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].astype(np.int64),
                "nat": g["nat"].astype(np.int64),
                "cents": g["cents"].astype(np.int64),
                "side": np.int8(1),
                "bucket": (g["o_orderkey"].to_numpy(np.int64) % B).astype("int32"),
            }
        )

    li = _read_split(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    u = orders.map_batches(ord_tag, batch_format="pandas").union(
        li.map_batches(li_tag, batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["o_orderkey", "nat"]]
        l = g[g["side"] == 1][["o_orderkey", "nat", "cents"]]
        m = l.merge(o, on="o_orderkey", how="inner", suffixes=("_s", "_c"))
        m = m[m["nat_s"] == m["nat_c"]]  # same-nation constraint
        out = m.groupby("nat_s", sort=False, as_index=False)["cents"].sum()
        return pd.DataFrame(
            {
                "nat": out["nat_s"].astype(np.int64),
                "cents": out["cents"].astype(np.int64),
            }
        )

    agg = (
        u.groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("nat")
        .sum("cents")
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df.columns = ["nat", "revenue_cents"]
        return pd.DataFrame(
            {
                "n_name": [names[int(k)] for k in df["nat"]],
                "revenue_cents": df["revenue_cents"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pandas")


def q_promo_revenue_share(sf_dir):
    """TPC-H Q14 (promotion effect): promo revenue share of one ship
    month as a pure two-scalar fold — the part dimension broadcasts as
    (sorted partkeys, promo-flag bits), each lineitem batch folds to
    (promo_cents, total_cents) int partials, and the single ratio
    divides two identical integer sums on both engines, so the rounded
    double compares exactly."""
    import ray as _ray

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    order = np.argsort(part["p_partkey"].to_numpy(np.int64), kind="stable")
    pkeys = part["p_partkey"].to_numpy(np.int64)[order]
    promo = (part["p_type"].to_numpy() == "PROMO")[order]
    dim_ref = _ray.put((pkeys, promo))
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1996-02-01")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = df["l_shipdate"].to_numpy()
        m = (sd >= lo) & (sd < hi)
        pk = df["l_partkey"].to_numpy(np.int64)[m]
        ep = df["l_extendedprice"].to_numpy()[m]
        disc = df["l_discount"].to_numpy()[m]
        cents = np.floor(ep * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        keys, flags = _ray.get(dim_ref)
        at, hit = _dim_lookup(keys, pk)
        return pd.DataFrame(
            {
                "promo_cents": [np.int64(cents[hit & flags[at]].sum())],
                "total_cents": [np.int64(cents[hit].sum())],
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    p, t = int(parts["promo_cents"].sum()), int(parts["total_cents"].sum())
    if t == 0:  # no revenue in the month: SQL's aggregate row is NULL
        return pd.DataFrame({"promo_pct": [np.nan]})
    # floor-quantize rather than round: round() ties break differently
    # between engines; floor of the identical double is identical
    pct = np.floor(100.0 * p / t * 1e6) / 1e6
    return pd.DataFrame({"promo_pct": [float(pct)]})


def q_urgent_line_counts(sf_dir):
    """TPC-H Q12 shape (priority mix per line status): both facts join
    on orderkey through ONE bucket exchange — lineitem pre-counts
    (orderkey, linestatus) rows for the ship year inside each batch,
    orders carry an urgent bit, each bucket's merge folds to the 2x2
    (status, urgent) cells, and the final groupby sums a handful of
    rows."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    n_orders = orders.count()
    B = max(16, -(-(3 * n_orders) // JOIN_BUCKET_TARGET_ROWS))
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    def ord_tag(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        urgent = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        return pd.DataFrame(
            {
                "o_orderkey": ok,
                "status": "",
                "n": np.int64(0),
                "urgent": urgent.astype(np.int8),
                "side": np.int8(0),
                "bucket": (ok % B).astype("int32"),
            }
        )

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = df["l_shipdate"].to_numpy()
        m = (sd >= lo) & (sd < hi)
        g = (
            pd.DataFrame(
                {
                    "o_orderkey": df["l_orderkey"].to_numpy(np.int64)[m],
                    "status": df["l_linestatus"].to_numpy()[m],
                }
            )
            .groupby(["o_orderkey", "status"], sort=False, as_index=False)
            .size()
        )
        ok = g["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": ok,
                "status": g["status"],
                "n": g["size"].astype(np.int64),
                "urgent": np.int8(0),
                "side": np.int8(1),
                "bucket": (ok % B).astype("int32"),
            }
        )

    u = orders.map_batches(ord_tag, batch_format="pandas").union(
        _read_split(
            sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_shipdate"]
        ).map_batches(li_partial, batch_format="pandas")
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["o_orderkey", "urgent"]]
        l = g[g["side"] == 1][["o_orderkey", "status", "n"]]
        m = l.merge(o, on="o_orderkey", how="inner")
        m["high"] = np.where(m["urgent"] == 1, m["n"], 0)
        m["low"] = np.where(m["urgent"] == 0, m["n"], 0)
        out = m.groupby("status", sort=False, as_index=False)[["high", "low"]].sum()
        return pd.DataFrame(
            {
                "l_linestatus": out["status"],
                "high": out["high"].astype(np.int64),
                "low": out["low"].astype(np.int64),
            }
        )

    agg = (
        u.groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("l_linestatus")
        .sum(["high", "low"])
    )
    # 2 groups x 2 columns: the multi-column aggregate is fine here
    return agg.map_batches(
        lambda df: pd.DataFrame(
            {
                "l_linestatus": df.iloc[:, 0],
                "high_line_count": df.iloc[:, 1].astype(np.int64),
                "low_line_count": df.iloc[:, 2].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )


def q_large_orders(sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose total line
    quantity exceeds a threshold, with customer names, top-10 by order
    value. The HAVING-on-aggregate semi-join shape: per-orderkey
    quantity sums fold from per-batch partials (single-column groupby —
    Ray's fast path), the few survivors broadcast BACK to the orders
    scan (selectivity-bounded by the threshold's design), and customer
    names attach from the dimension broadcast."""
    import ray as _ray

    threshold = 250.0
    li = _read_split(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    n_li = li.count()
    B = max(16, -(-n_li // JOIN_BUCKET_TARGET_ROWS))

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", sort=False, as_index=False)["l_quantity"].sum()
        ok = g["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": ok,
                "qty": g["l_quantity"].astype(np.float64),
                "bucket": (ok % B).astype("int32"),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # bucket fold, NOT groupby(orderkey).sum: Ray's per-key aggregate
        # measured 39.7 s over 147k keys at sf0.1 where this C-speed
        # pandas fold takes the bucket in one pass; survivors only leave
        s = g.groupby("l_orderkey", sort=False, as_index=False)["qty"].sum()
        s = s[s["qty"] > threshold]
        return pd.DataFrame(
            {
                "l_orderkey": s["l_orderkey"].astype(np.int64),
                "qty": s["qty"].astype(np.float64),
            }
        )

    sums = (
        li.map_batches(li_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    empty_out = pd.DataFrame(
        {
            "c_name": pd.Series([], dtype=str),
            "c_custkey": pd.Series([], dtype=np.int64),
            "o_orderkey": pd.Series([], dtype=np.int64),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "o_totalprice": pd.Series([], dtype=np.float64),
            "sum_qty": pd.Series([], dtype=np.int64),
        }
    )
    if len(sums) == 0:  # no order over the threshold (empty Dataset
        return empty_out  # to_pandas drops the schema, so short-circuit)
    surv = np.sort(sums["l_orderkey"].to_numpy(np.int64))
    qty = dict(zip(sums["l_orderkey"].astype(int), sums["qty"]))
    surv_ref = _ray.put(surv)

    def ord_pick(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["o_orderkey"].to_numpy(np.int64)
        _at, m = _dim_lookup(_ray.get(surv_ref), ok)
        return df.loc[m, ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]]

    hits = (
        _read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(ord_pick, batch_format="pandas")
        .to_pandas()
    )
    names = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .to_pandas()
        .rename(columns={"c_custkey": "o_custkey"})
    )
    out = hits.merge(names, on="o_custkey", how="inner")
    out["sum_qty"] = out["o_orderkey"].map(qty).astype(np.int64)
    out = out.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable"
    ).head(10)
    return pd.DataFrame(
        {
            "c_name": out["c_name"],
            "c_custkey": out["o_custkey"].astype(np.int64),
            "o_orderkey": out["o_orderkey"].astype(np.int64),
            "o_orderdate": out["o_orderdate"].astype("datetime64[us]"),
            "o_totalprice": out["o_totalprice"].astype(np.float64),
            "sum_qty": out["sum_qty"],
        }
    )


_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_unpivot_measures(sf_dir):
    """UNPIVOT / melt (wide -> long, the inverse of the pivot): each
    batch concatenates one projection per measure column with a
    constant label — pure Arrow column reuse, zero copies of the id
    column beyond the concat, zero shuffle, output streams. The shape
    every metrics table takes before a generic (key, measure, value)
    aggregation."""
    ds = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", *_UNPIVOT_MEASURES]
    )

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for m in _UNPIVOT_MEASURES:
            parts.append(
                pa.table(
                    {
                        "l_orderkey": t.column("l_orderkey"),
                        "l_linenumber": t.column("l_linenumber"),
                        "measure": pa.array([m] * t.num_rows, pa.string()),
                        "value": pc.cast(t.column(m), pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def q_median_by_group(sf_dir):
    """Exact per-group MEDIAN as distributed selection over value
    counts: each batch folds to (group, value, count) partials, one
    exchange sums them (distinct-value bounded — never the row count),
    and the median is read off the cumulative counts in a single tiny
    task, averaging the two central values on even totals exactly as
    SQL does. The same shape generalizes to any exact percentile; the
    unbounded-domain form is quantile_sketch (KLL)."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["l_returnflag", "l_quantity"], sort=False, as_index=False
        ).size()
        return g.rename(columns={"size": "n"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_quantity"])
        .sum("n")
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"sum(n)": "n"})
        flags, meds = [], []
        for flag, g in df.groupby("l_returnflag"):
            g = g.sort_values("l_quantity")
            c = g["n"].to_numpy().cumsum()
            v = g["l_quantity"].to_numpy(dtype=np.float64)
            total = int(c[-1])
            if total % 2 == 1:
                med = float(v[np.searchsorted(c, total // 2 + 1)])
            else:
                lo = float(v[np.searchsorted(c, total // 2)])
                hi = float(v[np.searchsorted(c, total // 2 + 1)])
                med = (lo + hi) / 2.0
            flags.append(flag)
            meds.append(med)
        return pd.DataFrame({"l_returnflag": flags, "med_qty": meds})

    return counts.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None
    )


def q_p90_by_group(sf_dir):
    """Exact per-group continuous percentile (p90 of quantity by return
    flag) — the general form of q_median_by_group: the same
    distinct-value-bounded (group, value, count) partials, and the
    final task interpolates at rank (n-1)*q between the two bracketing
    values exactly as SQL's quantile_cont does."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    q = 0.9

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["l_returnflag", "l_quantity"], sort=False, as_index=False
        ).size()
        return g.rename(columns={"size": "n"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_quantity"])
        .sum("n")
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"sum(n)": "n"})
        flags, vals = [], []
        for flag, g in df.groupby("l_returnflag"):
            g = g.sort_values("l_quantity")
            c = g["n"].to_numpy().cumsum()
            v = g["l_quantity"].to_numpy(dtype=np.float64)
            total = int(c[-1])
            pos = (total - 1) * q  # 0-based continuous rank
            lo_i, frac = int(np.floor(pos)), pos - np.floor(pos)
            lo = float(v[np.searchsorted(c, lo_i + 1)])
            hi = float(v[np.searchsorted(c, min(lo_i + 1, total - 1) + 1)])
            flags.append(flag)
            vals.append(lo + frac * (hi - lo))
        return pd.DataFrame({"l_returnflag": flags, "p90_qty": vals})

    return counts.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None
    )


def q_above_avg_orders(sf_dir):
    """Correlated-aggregate self-join (orders priced above their own
    customer's average — the 'compare each row to its group statistic'
    shape): pass 1 folds per-batch (custkey, sum, n) partials into the
    customer-count average table; pass 2 re-reads orders map-only
    against the broadcast averages. The fact table never shuffles; the
    broadcast is dimension-sized (documented bucket-join fallback for
    an unbounded group domain)."""
    import ray as _ray

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False, as_index=False).agg(
            s=("o_totalprice", "sum"), n=("o_totalprice", "size")
        )
        return pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].astype(np.int64),
                "s": g["s"].astype(np.float64),
                "n": g["n"].astype(np.int64),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(
            s=("s", "sum"), n=("n", "sum")
        )
        return pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].astype(np.int64),
                "avg": g["s"].to_numpy() / g["n"].to_numpy(),
            }
        )

    avgs = (
        orders.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values("o_custkey")
    )
    keys_ref = _ray.put(
        (avgs["o_custkey"].to_numpy(np.int64), avgs["avg"].to_numpy(np.float64))
    )

    def above(df: pd.DataFrame) -> pd.DataFrame:
        keys, av = _ray.get(keys_ref)
        ck = df["o_custkey"].to_numpy(np.int64)
        at, hit = _dim_lookup(keys, ck)
        cmp = np.zeros(len(ck), dtype=bool)
        if len(keys):
            cmp = df["o_totalprice"].to_numpy() > av[at]
        m = hit & cmp
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy()[m].astype(np.int64),
                "o_custkey": ck[m],
            }
        )

    return _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(above, batch_format="pandas")


def q_multi_distinct(sf_dir):
    """Several COUNT(DISTINCT ...) over different columns in ONE corpus
    pass: each batch emits locally-deduped (group, dim, value) triples
    for every distinct-dimension (here users and active days per event
    type), one exchange co-locates each (group, dim)'s values, and the
    fold is a vectorized nunique. The exchange is distinct-bounded per
    dimension — the row count never moves twice."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "ts"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        ).astype(np.int64)
        a = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "dim": np.int8(0),
                "val": df["user_id"].astype(np.int64),
            }
        )
        b = pd.DataFrame({"event_type": df["event_type"], "dim": np.int8(1), "val": day})
        return pd.concat([a, b], ignore_index=True).drop_duplicates()

    def count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "dim": [g["dim"].iloc[0]],
                "n": np.array([g["val"].nunique()], dtype=np.int64),
            }
        )

    long = (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby(["event_type", "dim"])
        .map_groups(count, batch_format="pandas")
    )

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        p = df.pivot_table(index="event_type", columns="dim", values="n").reset_index()
        return pd.DataFrame(
            {
                "event_type": p["event_type"],
                "n_users": p[0].astype(np.int64),
                "n_days": p[1].astype(np.int64),
            }
        )

    return long.repartition(1).map_batches(
        widen, batch_format="pandas", batch_size=None
    )


def q_group_concat_langs(sf_dir):
    """LISTAGG / string_agg parity (ordered DISTINCT concatenation per
    group): batch-local pair dedup bounds the exchange at distinct
    (group, member) pairs; each group's sorted join happens in its own
    task. Member sets are domain-bounded by contract (languages per
    source) — an unbounded member column would make the concatenated
    string itself the scale problem."""
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "langs": [",".join(sorted(set(g["lang"])))],
            }
        )

    return (
        ds.map_batches(lambda df: df.drop_duplicates(), batch_format="pandas")
        .groupby("source")
        .map_groups(concat, batch_format="pandas")
    )


def q_kmeans_assign(sf_dir):
    """Vector-quantization assignment (the E-step every embedding-space
    curation loop runs — cluster-balanced sampling, SemDeDup bucketing,
    IVF routing): centroids broadcast once via ray.put, each batch
    computes its distance matrix vectorized and takes the argmin; ties
    break to the lowest centroid index, with distances rounded to 1e-6
    on BOTH sides so the oracle comparison is order-stable. Centroids
    here are the 8 smallest vec_ids' embeddings (deterministic stand-in
    for trained centroids; build_ivf_store's trained k-means is the
    production path)."""
    import ray as _ray

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = (
        ds.map_batches(lambda df: df.nsmallest(8, "vec_id"), batch_format="pandas")
        .to_pandas()
        .nsmallest(8, "vec_id")
        .reset_index(drop=True)
    )
    cents = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    cents_ref = _ray.put(cents)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        x = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        c = _ray.get(cents_ref)
        d = np.empty((len(x), len(c)))
        for j in range(len(c)):
            diff = x - c[j]
            d[:, j] = np.sqrt((diff * diff).sum(axis=1))
        d = np.round(d, 6)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].astype(np.int64),
                "cluster": d.argmin(axis=1).astype(np.int64),
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


# --------------------------------------------------------------- registry

QUERIES = {
    "text_index_bm25": q_text_index_bm25,
    "text_index_update": q_text_index_update,
    "spj_join": q_spj_join,
    "spj_groupby": q_spj_groupby,
    "vocab_topk_sketch": q_vocab_topk_sketch,
    "tfidf_scores": q_tfidf_scores,
    "normalize_text": q_normalize_text,
    "chunk_documents": q_chunk_documents,
    "redact_pii": q_redact_pii,
    "agg_stats": q_agg_stats,
    "length_percentiles": q_length_percentiles,
    "dup_clusters": q_dup_clusters,
    "dup_passages": q_dup_passages,
    "passage_dedupe": q_passage_dedupe,
    "decontaminate": q_decontaminate,
    "unigram_logprob": q_unigram_logprob,
    "jaccard_pairs": q_jaccard_pairs,
    "jaccard_dedupe": q_jaccard_dedupe,
    "embedding_cosine_pairs": q_embedding_cosine_pairs,
    "embedding_dedupe": q_embedding_dedupe,
    "extract_text": q_extract_text,
    "source_reputation": q_source_reputation,
    "host_quota": q_host_quota,
    "snapshot_dedupe": q_snapshot_dedupe,
    "canonicalize_urls": q_canonicalize_urls,
    "canonical_url_dedupe": q_canonical_url_dedupe,
    "extract_text_general": q_extract_text_general,
    "search_dict_domain": q_search_dict_domain,
    "shuffle_train_order": q_shuffle_train_order,
    "pack_sequences": q_pack_sequences,
    "encode_decode_zorder": q_encode_decode_zorder,
    "gopher_quality": q_gopher_quality,
    "repetition_scores": q_repetition_scores,
    "stopword_fraction": q_stopword_fraction,
    "topk_per_group": q_topk_per_group,
    "anti_join": q_anti_join,
    "range_join": q_range_join,
    "bm25_scores": q_bm25_scores,
    "top_revenue_customers": q_top_revenue_customers,
    "weighted_sample": q_weighted_sample,
    "cdf_ranks": q_cdf_ranks,
    "group_distinct": q_group_distinct,
    "dataset_split": q_dataset_split,
    "snapshot_diff": q_snapshot_diff,
    "encode_decode_deleted": q_encode_decode_deleted,
    "upsert_snapshot": q_upsert_snapshot,
    "apply_changelog": q_apply_changelog,
    "curate_corpus_full": q_curate_corpus_full,
    "window_edges": q_window_edges,
    "cume_dists": q_cume_dists,
    "curate_corpus": q_curate_corpus,
    "curate_corpus_clusters": q_curate_corpus_clusters,
    "frame_sample": q_frame_sample,
    "image_resize": q_image_resize,
    "image_resize_raw": q_image_resize_raw,
    "video_sample_raw": q_video_sample_raw,
    "text_semantic_pairs": q_text_semantic_pairs,
    "group_quantile_sketch": q_group_quantile_sketch,
    "filter_rows": q_filter_rows,
    "transform_project": q_transform_project,
    "scan_limit": q_scan_limit,
    "sort_rows": q_sort_rows,
    "merge_sorted": q_merge_sorted,
    "merge_sorted_stream": q_merge_sorted_stream,
    "dedupe_rows": q_dedupe_rows,
    "dedupe_consecutive": q_dedupe_consecutive,
    "convert_schema": q_convert_schema,
    "schema_evolution": q_schema_evolution,
    "stats_minmax": q_stats_minmax,
    "distinct_values": q_distinct_values,
    "search_pushdown": q_search_pushdown,
    "bloom_semi_join": q_bloom_semi_join,
    "agg_pricing": q_agg_pricing,
    "windowed_counts": q_windowed_counts,
    "lag_gaps": q_lag_gaps,
    "running_total": q_running_total,
    "moving_sum": q_moving_sum,
    "rollup_counts": q_rollup_counts,
    "dense_ranks": q_dense_ranks,
    "ntile_buckets": q_ntile_buckets,
    "percent_ranks": q_percent_ranks,
    "distinct_count_hll": q_distinct_count_hll,
    "quantile_sketch": q_quantile_sketch,
    "asof_join": q_asof_join,
    "session_windows": q_session_windows,
    "search_pruned_store": q_search_pruned_store,
    "store_group_count": q_store_group_count,
    "store_agg_meta": q_store_agg_meta,
    "store_distinct": q_store_distinct,
    "store_agg_range": q_store_agg_range,
    "text_index_search": q_text_index_search,
    "text_index_phrase": q_text_index_phrase,
    "text_index_near": q_text_index_near,
    "store_pattern_prefix": q_store_pattern_prefix,
    "store_pattern_suffix": q_store_pattern_suffix,
    "store_pattern_regex": q_store_pattern_regex,
    "derived_column": q_derived_column,
    "derived_multi": q_derived_multi,
    "store_merge_sorted": q_store_merge_sorted,
    "merged_groupby": q_merged_groupby,
    "merge_ingest": q_merge_ingest,
    "range_join_copart": q_range_join_copart,
    "family_range_scan": q_family_range_scan,
    "store_take_rows": q_store_take_rows,
    "store_topk": q_store_topk,
    "query_router_membership": q_query_router_membership,
    "query_router_point": q_query_router_point,
    "query_router_derived": q_query_router_derived,
    "audio_features_raw": q_audio_features_raw,
    "store_null_scan": q_store_null_scan,
    "point_lookup_bloom": q_point_lookup_bloom,
    "encode_decode_documents": q_encode_decode_documents,
    "encode_decode_events": q_encode_decode_events,
    "encode_decode_lineitem": q_encode_decode_lineitem,
    "parquet_wire_roundtrip": q_parquet_wire_roundtrip,
    "parquet_native_read": q_parquet_native_read,
    "seek_rows": q_seek_rows,
    "parquet_wire_lists": q_parquet_wire_lists,
    "encode_decode_embeddings": q_encode_decode_embeddings,
    "encode_decode_orders": _mk_roundtrip("orders"),
    "encode_decode_customer": _mk_roundtrip("customer"),
    "encode_decode_part": _mk_roundtrip("part"),
    "encode_decode_supplier": _mk_roundtrip("supplier"),
    "encode_decode_nation": _mk_roundtrip("nation"),
    "encode_decode_region": _mk_roundtrip("region"),
    "encode_decode_nested": q_encode_decode_nested,
    "hash_join": q_hash_join,
    "hash_join_broadcast": q_hash_join_broadcast,
    "wire_page_index_range": q_wire_page_index_range,
    "fingerprint_winnow": q_fingerprint_winnow,
    "wire_bloom_lookup": q_wire_bloom_lookup,
    "json_props_extract": q_json_props_extract,
    "token_counts": q_token_counts,
    "quality_scores": q_quality_scores,
    "fingerprint_docs": q_fingerprint_docs,
    "lang_id": q_lang_id,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_fingerprints": q_simhash_fingerprints,
    "stratified_sample": q_stratified_sample,
    "mix_corpora": q_mix_corpora,
    "perplexity_filter": q_perplexity_filter,
    "vocab_topk": q_vocab_topk,
    "token_counts_bpe": q_token_counts_bpe,
    "simhash_near_pairs": q_simhash_near_pairs,
    "near_dupes_verified": q_near_dupes_verified,
    "dedup_pipeline": q_dedup_pipeline,
    "embedding_topk": q_embedding_topk,
    "embedding_topk_ivf": q_embedding_topk_ivf,
    "embedding_topk_pq": q_embedding_topk_pq,
    "embedding_topk_ivfpq": q_embedding_topk_ivfpq,
    "embedding_near_pairs": q_embedding_near_pairs,
    "multimodal_meta": q_multimodal_meta,
    "media_features": q_media_features,
    "dsir_weights": q_dsir_weights,
    "cube_counts": q_cube_counts,
    "set_intersect_users": q_set_intersect_users,
    "set_except_users": q_set_except_users,
    "pivot_event_counts": q_pivot_event_counts,
    "corr_by_group": q_corr_by_group,
    "exists_semi_groupby": q_exists_semi_groupby,
    "explode_tokens": q_explode_tokens,
    "funnel_steps": q_funnel_steps,
    "shipping_priority": q_shipping_priority,
    "median_by_group": q_median_by_group,
    "multi_distinct": q_multi_distinct,
    "group_concat_langs": q_group_concat_langs,
    "kmeans_assign": q_kmeans_assign,
    "moving_sum_time": q_moving_sum_time,
    "latest_event_per_user": q_latest_event_per_user,
    "bigram_counts": q_bigram_counts,
    "event_transitions": q_event_transitions,
    "orphan_orders": q_orphan_orders,
    "p90_by_group": q_p90_by_group,
    "above_avg_orders": q_above_avg_orders,
    "store_median": q_store_median,
    "store_histogram": q_store_histogram,
    "unpivot_measures": q_unpivot_measures,
    "local_supplier_revenue": q_local_supplier_revenue,
    "group_distinct_hll": q_group_distinct_hll,
    "bpe_merges": q_bpe_merges,
    "bpe_token_counts": q_bpe_token_counts,
    "grouping_sets": q_grouping_sets,
    "promo_revenue_share": q_promo_revenue_share,
    "urgent_line_counts": q_urgent_line_counts,
    "large_orders": q_large_orders,
}

ORACLES = {
    "topk_per_group": (
        "SELECT lang, n_chars, doc_id FROM documents "
        "QUALIFY row_number() OVER "
        "(PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 3"
    ),
    "anti_join": (
        "SELECT * FROM documents WHERE source NOT IN "
        "(SELECT source FROM documents GROUP BY source "
        "HAVING max(n_chars) > 530)"
    ),
    "range_join": (
        "SELECT o_orderkey, w.window_name FROM orders JOIN (VALUES "
        + ", ".join(
            f"('{n}', TIMESTAMP '{lo}', TIMESTAMP '{hi}')"
            for n, lo, hi in _RANGE_WINDOWS
        )
        + ") AS w(window_name, lo, hi) "
        "ON o_orderdate >= w.lo AND o_orderdate < w.hi"
    ),
    "snapshot_diff": (
        "WITH new AS ("
        "SELECT doc_id, CASE WHEN doc_id % 3 <> 0 THEN text || ' v2' "
        "ELSE text END AS text FROM documents WHERE doc_id % 7 <> 0 "
        "UNION ALL "
        "SELECT doc_id + 1000000 AS doc_id, text || ' fresh page' AS text "
        "FROM documents WHERE doc_id % 20 = 0) "
        "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, "
        "CASE WHEN o.doc_id IS NULL THEN 'added' "
        "WHEN n.doc_id IS NULL THEN 'removed' "
        "WHEN o.text = n.text THEN 'unchanged' ELSE 'changed' END AS status "
        "FROM documents o FULL OUTER JOIN new n ON o.doc_id = n.doc_id"
    ),
    "dataset_split": (
        "SELECT doc_id, CASE "
        "WHEN (((doc_id + 13) * 2654435761) % 4294967296) % 100 < 98 THEN 'train' "
        "WHEN (((doc_id + 13) * 2654435761) % 4294967296) % 100 < 99 THEN 'valid' "
        "ELSE 'test' END AS split FROM documents"
    ),
    "weighted_sample": (
        "SELECT doc_id FROM (SELECT doc_id, "
        "ln((((doc_id + 7) * 2654435761) % 4294967296 + 1.0) / 4294967297.0) "
        "/ n_chars AS key FROM documents) "
        "ORDER BY key DESC LIMIT 100"
    ),
    "cdf_ranks": (
        "SELECT doc_id, lang, CAST(rank() OVER "
        "(PARTITION BY lang ORDER BY n_chars) AS BIGINT) AS len_rank "
        "FROM documents"
    ),
    "group_distinct": (
        "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY event_type"
    ),
    "top_revenue_customers": (
        "WITH li AS (SELECT l_orderkey, CAST(floor(l_extendedprice * "
        "(1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01'), "
        "agg AS (SELECT o_custkey, SUM(cents) AS revenue FROM li "
        "JOIN orders ON l_orderkey = o_orderkey GROUP BY o_custkey) "
        "SELECT c_custkey, c_name, CAST(revenue AS BIGINT) AS revenue_cents "
        "FROM agg JOIN customer ON o_custkey = c_custkey "
        "ORDER BY revenue_cents DESC, c_custkey LIMIT 10"
    ),
    "bm25_scores": (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token "
        "FROM documents), "
        "dls AS (SELECT doc_id, len(string_split(text, ' ')) AS dl "
        "FROM documents), "
        "tf AS (SELECT doc_id, token, count(*) AS c FROM toks "
        "WHERE token IN ('column','join','merge','order','scan') GROUP BY 1, 2), "
        "df AS (SELECT token, count(DISTINCT doc_id) AS d FROM tf GROUP BY token), "
        "n AS (SELECT count(*) AS nn, sum(dl) AS dl_sum FROM dls), "
        "idf AS (SELECT token, CAST(floor(ln((nn - d + 0.5)/(d + 0.5) + 1) * 1000 "
        "+ 0.5) AS BIGINT) AS idf_millis FROM df, n) "
        "SELECT tf.doc_id, CAST(sum(CAST(floor("
        "idf.idf_millis * (tf.c * 2.2) / (tf.c + "
        "(1.2 * (0.25 + 0.75 * (dls.dl / (n.dl_sum / nn))))) "
        "* 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score "
        "FROM tf JOIN idf USING (token) JOIN dls USING (doc_id), n "
        "GROUP BY tf.doc_id ORDER BY doc_id"
    ),
    "filter_rows": "SELECT * FROM documents WHERE lang = 'en' AND n_chars > 300",
    "transform_project": (
        "SELECT doc_id, n_chars * 2 AS n_chars_2x, upper(lang) AS lang_uc "
        "FROM documents"
    ),
    "scan_limit": "SELECT * FROM documents ORDER BY doc_id LIMIT 100",
    "sort_rows": "SELECT * FROM documents ORDER BY lang, doc_id LIMIT 200",
    "merge_sorted": "SELECT * FROM events ORDER BY ts, event_id LIMIT 1000",
    "merge_sorted_stream": (
        "SELECT * FROM events ORDER BY ts, event_id LIMIT 1000"
    ),
    "dedupe_rows": (
        "SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, "
        "CAST(count(*) AS BIGINT) AS n_dups FROM documents GROUP BY text"
    ),
    "dedupe_consecutive": "SELECT DISTINCT lang, source FROM documents",
    "convert_schema": (
        "SELECT l_orderkey, CAST(l_quantity AS INTEGER) AS l_quantity, "
        "CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS l_shipdate FROM lineitem"
    ),
    "schema_evolution": (
        "SELECT l_orderkey, CAST(l_linenumber AS VARCHAR) AS l_linenumber, "
        "CAST(l_quantity AS INTEGER) AS l_quantity, "
        "CAST(NULL AS VARCHAR) AS l_comment FROM lineitem"
    ),
    "stats_minmax": (
        "SELECT lang, CAST(min(n_chars) AS BIGINT) AS min_v, "
        "CAST(max(n_chars) AS BIGINT) AS max_v, "
        "CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang"
    ),
    "distinct_values": "SELECT DISTINCT lang FROM documents",
    "search_pushdown": (
        "SELECT event_id, event_type, value FROM events "
        "WHERE event_type = 'click' AND value > 50"
    ),
    "bloom_semi_join": "SELECT * FROM documents WHERE lang IN ('en','de','fr')",
    "agg_pricing": (
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_price, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "windowed_counts": (
        "SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n, SUM(value) AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
    "lag_gaps": (
        "SELECT event_id, user_id, CAST(COALESCE("
        "epoch_us(ts) - LAG(epoch_us(ts)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), -1) AS BIGINT) "
        "AS gap_us FROM events"
    ),
    "running_total": (
        "SELECT event_id, user_id, CAST(SUM(CAST(floor(value * 100 + 0.5) "
        "AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents FROM events"
    ),
    "moving_sum": (
        "SELECT event_id, user_id, CAST(SUM(CAST(floor(value * 100 + 0.5) "
        "AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS win3_cents FROM events"
    ),
    "rollup_counts": (
        "WITH e AS (SELECT event_type, "
        "CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS bucket FROM events) "
        "SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n "
        "FROM e GROUP BY ROLLUP (event_type, bucket)"
    ),
    "dense_ranks": (
        "SELECT event_id, event_type, CAST(DENSE_RANK() OVER "
        "(PARTITION BY event_type ORDER BY CAST(floor(value * 100 + 0.5) "
        "AS BIGINT)) AS BIGINT) AS rnk FROM events"
    ),
    "ntile_buckets": (
        "SELECT event_id, event_type, CAST(NTILE(4) OVER "
        "(PARTITION BY event_type ORDER BY CAST(floor(value * 100 + 0.5) "
        "AS BIGINT), event_id) AS BIGINT) AS tile FROM events"
    ),
    "percent_ranks": (
        "SELECT event_id, event_type, CAST(floor(PERCENT_RANK() OVER "
        "(PARTITION BY event_type ORDER BY CAST(floor(value * 100 + 0.5) "
        "AS BIGINT)) * 1000 + 0.5) AS BIGINT) AS pr_milli FROM events"
    ),
    "window_edges": (
        "SELECT event_id, user_id, "
        "CAST(COALESCE(LEAD(event_id) OVER w, -1) AS BIGINT) AS next_event, "
        "CAST(FIRST_VALUE(event_id) OVER w AS BIGINT) AS first_event, "
        "CAST(LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY "
        "ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED "
        "FOLLOWING) AS BIGINT) AS last_event "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
    "cume_dists": (
        "SELECT event_id, event_type, CAST(floor(CUME_DIST() OVER "
        "(PARTITION BY event_type ORDER BY CAST(floor(value * 100 + 0.5) "
        "AS BIGINT)) * 1000 + 0.5) AS BIGINT) AS cd_milli FROM events"
    ),
    "session_windows": (
        "WITH d AS ("
        "  SELECT user_id, epoch_us(ts) AS t,"
        "    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER "
        "      (PARTITION BY user_id ORDER BY ts) > 1800000000 "
        "      OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
        "    THEN 1 ELSE 0 END AS new_s"
        "  FROM events"
        "), s AS ("
        "  SELECT user_id, SUM(new_s) OVER "
        "    (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid"
        "  FROM d"
        ") "
        "SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions, "
        "CAST(MAX(cnt) AS BIGINT) AS max_session_events FROM ("
        "  SELECT user_id, sid, COUNT(*) AS cnt FROM s GROUP BY user_id, sid"
        ") GROUP BY user_id"
    ),
    "asof_join": (
        "WITH marks AS ("
        "  SELECT event_type, CAST(min(epoch_us(ts)) AS BIGINT) AS mark_us"
        "  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000"
        ") "
        "SELECT e.event_id, m.mark_us FROM events e ASOF JOIN marks m "
        "ON e.event_type = m.event_type "
        "AND CAST(epoch_us(e.ts) AS BIGINT) >= m.mark_us"
    ),
    "search_pruned_store": (
        "SELECT * FROM documents WHERE n_chars >= 100 AND n_chars <= 300"
    ),
    "store_group_count": (
        "SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang"
    ),
    "store_distinct": "SELECT DISTINCT lang FROM documents",
    "store_agg_range": (
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(n_chars) AS BIGINT) AS vsum FROM documents, "
        "(SELECT count(*) AS total FROM documents) t "
        "WHERE doc_id BETWEEN t.total // 10 AND (t.total * 9) // 10"
    ),
    "store_agg_meta": (
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(*) - count(n_chars) AS BIGINT) AS n_nulls, "
        "CAST(min(n_chars) AS BIGINT) AS vmin, "
        "CAST(max(n_chars) AS BIGINT) AS vmax, "
        "CAST(sum(n_chars) AS BIGINT) AS vsum FROM documents"
    ),
    "text_index_search": (
        "SELECT doc_id FROM documents "
        "WHERE (' ' || text || ' ') LIKE '% scan %' "
        "AND (' ' || text || ' ') LIKE '% column %'"
    ),
    "text_index_phrase": (
        "SELECT doc_id FROM documents "
        "WHERE (' ' || text || ' ') LIKE '% part filter %'"
    ),
    "text_index_near": (
        "WITH p AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token, "
        "generate_subscripts(string_split(text, ' '), 1) AS pos "
        "FROM documents), "
        "a AS (SELECT doc_id, pos FROM p WHERE token = 'scan'), "
        "b AS (SELECT doc_id, pos FROM p WHERE token = 'filter') "
        "SELECT DISTINCT a.doc_id FROM a JOIN b USING (doc_id) "
        "WHERE abs(a.pos - b.pos) <= 3"
    ),
    "store_pattern_prefix": (
        "SELECT doc_id, source FROM documents WHERE source LIKE 'src1%'"
    ),
    "store_pattern_suffix": (
        "SELECT doc_id, source FROM documents WHERE source LIKE '%3'"
    ),
    "store_pattern_regex": (
        "SELECT doc_id, source FROM documents "
        "WHERE regexp_matches(source, '^src1[0-9]$')"
    ),
    "derived_column": (
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
        "AS n_tokens FROM documents"
    ),
    "store_merge_sorted": "SELECT * FROM documents",
    "derived_multi": (
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
        "AS tok_cnt, CAST(length(text) - length(replace(text, ' ', '')) "
        "AS BIGINT) AS space_cnt FROM documents"
    ),
    "merged_groupby": (
        "SELECT n_chars, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(doc_id) AS BIGINT) AS sum_ids FROM documents "
        "GROUP BY n_chars"
    ),
    "range_join_copart": (
        "SELECT o_orderkey, o_custkey, c_name FROM orders "
        "JOIN customer ON o_custkey = c_custkey"
    ),
    "merge_ingest": "SELECT * FROM documents",
    "family_range_scan": (
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
        "AS n_tokens FROM documents "
        "WHERE len(string_split(text, ' ')) BETWEEN 40 AND 60"
    ),
    "store_take_rows": (
        "SELECT doc_id AS _row, doc_id, lang, n_chars FROM documents "
        "WHERE doc_id IN (0, 17, 99, 123, 250, 333, 401, 499)"
    ),
    "query_router_membership": (
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE lang IN ('fr', 'zh')"
    ),
    "store_topk": (
        "SELECT doc_id, n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id LIMIT 100"
    ),
    "query_router_point": "SELECT * FROM documents WHERE doc_id = 123",
    "query_router_derived": (
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
        "AS n_tokens FROM documents "
        "WHERE len(string_split(text, ' ')) BETWEEN 30 AND 50"
    ),
    "store_null_scan": (
        "SELECT doc_id FROM documents WHERE doc_id % 7 = 0"
    ),
    # BM25 over the UPDATED corpus (the q_text_index_update increment
    # expressed as SQL), proving incremental maintenance == rebuild
    "text_index_update": (
        "WITH documents2 AS ("
        "SELECT * FROM documents WHERE doc_id % 5 != 0 "
        "UNION ALL SELECT * REPLACE (text || ' v2 scan' AS text) "
        "FROM documents WHERE doc_id % 5 = 0 "
        "UNION ALL SELECT * REPLACE (doc_id + 1000000 AS doc_id, "
        "text || ' fresh page column' AS text) "
        "FROM documents WHERE doc_id % 20 = 0), "
        "toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token "
        "FROM documents2), "
        "dls AS (SELECT doc_id, len(string_split(text, ' ')) AS dl "
        "FROM documents2), "
        "tf AS (SELECT doc_id, token, count(*) AS c FROM toks "
        "WHERE token IN ('column','join','merge','order','scan') GROUP BY 1, 2), "
        "df AS (SELECT token, count(DISTINCT doc_id) AS d FROM tf GROUP BY token), "
        "n AS (SELECT count(*) AS nn, sum(dl) AS dl_sum FROM dls), "
        "idf AS (SELECT token, CAST(floor(ln((nn - d + 0.5)/(d + 0.5) + 1) * 1000 "
        "+ 0.5) AS BIGINT) AS idf_millis FROM df, n) "
        "SELECT tf.doc_id, CAST(sum(CAST(floor("
        "idf.idf_millis * (tf.c * 2.2) / (tf.c + "
        "(1.2 * (0.25 + 0.75 * (dls.dl / (n.dl_sum / nn))))) "
        "* 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score "
        "FROM tf JOIN idf USING (token) JOIN dls USING (doc_id), n "
        "GROUP BY tf.doc_id ORDER BY doc_id"
    ),
    # identical statement to bm25_scores: the index-derived statistics
    # must reproduce the corpus-wide computation integer-exactly
    "text_index_bm25": (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token "
        "FROM documents), "
        "dls AS (SELECT doc_id, len(string_split(text, ' ')) AS dl "
        "FROM documents), "
        "tf AS (SELECT doc_id, token, count(*) AS c FROM toks "
        "WHERE token IN ('column','join','merge','order','scan') GROUP BY 1, 2), "
        "df AS (SELECT token, count(DISTINCT doc_id) AS d FROM tf GROUP BY token), "
        "n AS (SELECT count(*) AS nn, sum(dl) AS dl_sum FROM dls), "
        "idf AS (SELECT token, CAST(floor(ln((nn - d + 0.5)/(d + 0.5) + 1) * 1000 "
        "+ 0.5) AS BIGINT) AS idf_millis FROM df, n) "
        "SELECT tf.doc_id, CAST(sum(CAST(floor("
        "idf.idf_millis * (tf.c * 2.2) / (tf.c + "
        "(1.2 * (0.25 + 0.75 * (dls.dl / (n.dl_sum / nn))))) "
        "* 1000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score "
        "FROM tf JOIN idf USING (token) JOIN dls USING (doc_id), n "
        "GROUP BY tf.doc_id ORDER BY doc_id"
    ),
    "point_lookup_bloom": "SELECT * FROM documents WHERE doc_id IN (5, 105, 205)",
    "search_dict_domain": (
        "SELECT doc_id, lang, n_chars FROM documents "
        "WHERE lang IN ('en', 'de')"
    ),
    "shuffle_train_order": (
        "SELECT doc_id, source, "
        "((doc_id + 7) * 2654435761) % 4294967296 AS shuffle_key "
        "FROM documents"
    ),
    "mix_corpora": (
        "WITH r AS (SELECT doc_id, source, "
        "CASE source WHEN 'src0' THEN 2.5 WHEN 'src13' THEN 0.25 ELSE 1.0 END AS rate, "
        "(((doc_id + 29) * 2654435761) % 4294967296) / 4294967296.0 AS u FROM documents) "
        "SELECT r.doc_id, r.source, CAST(e.epoch AS BIGINT) AS epoch "
        "FROM r CROSS JOIN (SELECT unnest([0, 1, 2]) AS epoch) e "
        "WHERE e.epoch < CAST(floor(r.rate) AS BIGINT) "
        "OR (e.epoch = CAST(floor(r.rate) AS BIGINT) AND r.u < r.rate - floor(r.rate))"
    ),
    "pack_sequences": (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) "
        "AS BIGINT) AS n_tokens FROM documents"
    ),
    "encode_decode_documents": "SELECT * FROM documents",
    "encode_decode_deleted": "SELECT * FROM documents WHERE doc_id % 10 <> 3",
    "upsert_snapshot": (
        "SELECT * FROM documents WHERE doc_id % 5 <> 0 "
        "UNION ALL "
        "SELECT doc_id, text || ' v2' AS text, lang, source, n_chars "
        "FROM documents WHERE doc_id % 5 = 0 "
        "UNION ALL "
        "SELECT doc_id + 1000000 AS doc_id, text || ' fresh page' AS text, "
        "lang, source, n_chars FROM documents WHERE doc_id % 20 = 0"
    ),
    "apply_changelog": (
        "SELECT * FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 10 <> 7 "
        "UNION ALL "
        "SELECT doc_id, text || ' v2' AS text, lang, source, n_chars "
        "FROM documents WHERE doc_id % 5 = 0 "
        "UNION ALL "
        "SELECT doc_id + 1000000 AS doc_id, text || ' fresh page' AS text, "
        "lang, source, n_chars FROM documents WHERE doc_id % 20 = 0"
    ),
    "encode_decode_zorder": "SELECT * FROM documents",
    "encode_decode_events": "SELECT * FROM events",
    "encode_decode_lineitem": "SELECT * FROM lineitem",
    "parquet_wire_roundtrip": "SELECT * FROM lineitem",
    "parquet_native_read": "SELECT * FROM lineitem",
    "seek_rows": "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id BETWEEN 100 AND 349",
    "stratified_sample": "SELECT doc_id, lang FROM documents QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 20",
    "vocab_topk": "SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) WHERE token <> '' GROUP BY token ORDER BY cnt DESC, token LIMIT 100",
    "vocab_topk_sketch": "SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) WHERE token <> '' GROUP BY token ORDER BY cnt DESC, token LIMIT 100",
    "tfidf_scores": (
        "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token "
        "FROM documents), "
        "tf AS (SELECT doc_id, token, count(*) AS c FROM toks "
        "WHERE token IN ('column','join','merge','order','scan') GROUP BY 1, 2), "
        "df AS (SELECT token, count(DISTINCT doc_id) AS d FROM tf GROUP BY token), "
        "n AS (SELECT count(*) AS nn FROM documents), "
        "idf AS (SELECT token, CAST(floor(ln((nn - d + 0.5)/(d + 0.5) + 1) * 1000 "
        "+ 0.5) AS BIGINT) AS idf_millis FROM df, n) "
        "SELECT tf.doc_id, CAST(sum(tf.c * idf.idf_millis) AS BIGINT) AS score "
        "FROM tf JOIN idf USING (token) GROUP BY tf.doc_id ORDER BY doc_id"
    ),
    "parquet_wire_lists": "SELECT * FROM embeddings",
    "encode_decode_embeddings": "SELECT * FROM embeddings",
    "encode_decode_orders": "SELECT * FROM orders",
    "encode_decode_customer": "SELECT * FROM customer",
    "encode_decode_part": "SELECT * FROM part",
    "encode_decode_supplier": "SELECT * FROM supplier",
    "encode_decode_nation": "SELECT * FROM nation",
    "encode_decode_region": "SELECT * FROM region",
    "encode_decode_nested": (
        "SELECT event_id, event_type, value, user_id FROM events"
    ),
    "hash_join": (
        "SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice, "
        "c_name FROM orders JOIN customer ON o_custkey = c_custkey"
    ),
    "hash_join_broadcast": (
        "SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice, "
        "c_name FROM orders JOIN customer ON o_custkey = c_custkey"
    ),
    "spj_join": (
        "SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice, "
        "c_name FROM orders JOIN customer ON o_custkey = c_custkey"
    ),
    "spj_groupby": (
        "SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, "
        "min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok "
        "FROM orders GROUP BY o_custkey"
    ),
    "wire_page_index_range": (
        "SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice "
        "FROM orders WHERE o_orderkey BETWEEN 1000 AND 1999"
    ),
    "wire_bloom_lookup": (
        "SELECT doc_id, n_chars FROM documents "
        "WHERE doc_id IN (5, 105, 205, 99999999)"
    ),
    "json_props_extract": (
        "SELECT event_id, CAST(coalesce(regexp_extract(props, '\"k\":\\s*(\\d+)', 1), "
        "'-1') AS BIGINT) AS k FROM events"
    ),
    "length_percentiles": "SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50, CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90, CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99 FROM documents GROUP BY lang",
    "agg_stats": "SELECT event_type, CAST(count(*) AS BIGINT) AS n, ROUND(avg(value),2) AS avg_v, ROUND(stddev_samp(value),2) AS sd_v FROM events GROUP BY event_type",
    "token_counts_bpe": (
        "SELECT doc_id, CAST(length(regexp_extract_all(text, '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+| +')) "
        "AS BIGINT) AS tokens FROM documents"
    ),
    "token_counts": (
        "SELECT doc_id, CAST(length(regexp_extract_all(text, '[a-zA-Z0-9]+')) "
        "AS BIGINT) AS tokens FROM documents"
    ),
    "quality_scores": (
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS chars, "
        "CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS spaces, "
        "CAST(length(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS punct, "
        "CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digits "
        "FROM documents"
    ),
    "fingerprint_docs": "SELECT doc_id, md5(text) AS fp FROM documents",
    "dup_clusters": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(min(doc_id) OVER (PARTITION BY source) AS BIGINT) AS cluster_id "
        "FROM documents"
    ),
    "extract_text": "SELECT doc_id, text FROM documents",
    "extract_text_general": "SELECT doc_id, text FROM documents",
    "source_reputation": (
        "SELECT doc_id, source FROM documents WHERE source IN ("
        "SELECT source FROM documents GROUP BY source "
        "HAVING sum(n_chars) >= 280 * count(*))"
    ),
    "canonicalize_urls": (
        "WITH b AS (SELECT doc_id, " + _URL_BUILD_SQL + " AS u FROM documents), "
        "s AS (SELECT doc_id, " + _URL_C3_SQL + " AS c3 FROM b) "
        "SELECT doc_id, " + _URL_CANON_SQL + " AS url FROM s"
    ),
    "canonical_url_dedupe": (
        "WITH b AS (SELECT doc_id, " + _URL_BUILD_SQL + " AS u FROM documents), "
        "s AS (SELECT doc_id, " + _URL_C3_SQL + " AS c3 FROM b), "
        "c AS (SELECT doc_id, " + _URL_CANON_SQL + " AS url FROM s) "
        "SELECT CAST(min(doc_id) AS BIGINT) AS keep_id, "
        "CAST(count(*) AS BIGINT) AS n_dups FROM c GROUP BY url"
    ),
    "host_quota": (
        "SELECT doc_id, source FROM ("
        "SELECT doc_id, source, "
        "row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn "
        "FROM documents) WHERE rn <= 3"
    ),
    "snapshot_dedupe": (
        "WITH new AS (SELECT doc_id + 1000000 AS doc_id, "
        "CASE WHEN doc_id % 3 = 0 THEN text ELSE text || ' v2' END AS text "
        "FROM documents) "
        "SELECT CAST(n.doc_id AS BIGINT) AS doc_id, n.text FROM new n "
        "WHERE NOT EXISTS (SELECT 1 FROM documents o WHERE o.text = n.text)"
    ),
    "dup_passages": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents), "
        "s AS (SELECT doc_id, array_to_string(words[i.i : i.i + 7], ' ') AS passage "
        "FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(words) - 7, 0))) AS i) i), "
        "g AS (SELECT passage FROM s GROUP BY passage HAVING COUNT(DISTINCT doc_id) >= 2) "
        "SELECT CAST(s.doc_id AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_passages "
        "FROM s JOIN g USING (passage) GROUP BY s.doc_id"
    ),
    "perplexity_filter": (
        "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
        "FROM documents WHERE length(text) > 0), "
        "cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t), "
        "n AS (SELECT COUNT(*) AS total FROM tok), "
        "scores AS (SELECT CAST(tok.doc_id AS BIGINT) AS doc_id, "
        "CAST(floor(avg(ln(n.total) - ln(cnt.c)) * 1e4 + 0.5) AS BIGINT) AS nll_e4 "
        "FROM tok JOIN cnt USING (t) CROSS JOIN n GROUP BY tok.doc_id), "
        "thr AS (SELECT min(nll_e4) AS v FROM (SELECT nll_e4, "
        "count(*) OVER (ORDER BY nll_e4) AS cum, "
        "(SELECT count(*) FROM scores) AS nn FROM scores) "
        "WHERE cum >= CAST(ceil(0.75 * nn) AS BIGINT)) "
        "SELECT s.doc_id, s.nll_e4 FROM scores s, thr WHERE s.nll_e4 <= thr.v"
    ),
    "unigram_logprob": (
        "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
        "FROM documents WHERE length(text) > 0), "
        "cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t), "
        "n AS (SELECT COUNT(*) AS total FROM tok) "
        "SELECT CAST(tok.doc_id AS BIGINT) AS doc_id, "
        "CAST(floor(avg(ln(n.total) - ln(cnt.c)) * 1e4 + 0.5) AS BIGINT) AS nll_e4 "
        "FROM tok JOIN cnt USING (t) CROSS JOIN n GROUP BY tok.doc_id"
    ),
    "dsir_weights": (
        "WITH tok AS (SELECT doc_id, source, "
        "unnest(string_split(text, ' ')) AS t "
        "FROM documents WHERE length(text) > 0), "
        "tokd AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t), "
        "cnt AS (SELECT t, COUNT(*) AS cs, "
        "COUNT(*) FILTER (WHERE source = 'src0') AS ct FROM tok GROUP BY t), "
        "n AS (SELECT COUNT(*) AS ns, "
        "COUNT(*) FILTER (WHERE source = 'src0') AS nt FROM tok) "
        "SELECT CAST(tokd.doc_id AS BIGINT) AS doc_id, "
        "CAST(floor((SUM(tokd.c * (ln(cnt.ct + 1.0) - ln(cnt.cs + 1.0))) "
        "/ SUM(tokd.c) "
        "+ (SELECT ln(ns + 1.0) - ln(nt + 1.0) FROM n)) * 1e4 + 0.5) "
        "AS BIGINT) AS logw_e4 "
        "FROM tokd JOIN cnt USING (t) GROUP BY tokd.doc_id"
    ),
    "decontaminate": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents), "
        "s AS (SELECT doc_id, array_to_string(words[i.i : i.i + 7], ' ') AS passage "
        "FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(words) - 7, 0))) AS i) i), "
        "b AS (SELECT DISTINCT passage FROM s WHERE doc_id < 32), "
        "c AS (SELECT s.doc_id, COUNT(*) AS n FROM s JOIN b USING (passage) "
        "WHERE s.doc_id >= 32 GROUP BY s.doc_id) "
        "SELECT CAST(d.doc_id AS BIGINT) AS doc_id, "
        "CAST(COALESCE(c.n, 0) AS BIGINT) AS n_contaminated "
        "FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id WHERE d.doc_id >= 32"
    ),
    "normalize_text": (
        "SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g')) AS text FROM documents"
    ),
    "redact_pii": (
        "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace("
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || "
        "'.7 call 555-123-4567 now', "
        "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'), "
        "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[IP]', 'g'), "
        "'\\+?\\d[\\d\\- ]{7,}\\d', '[PHONE]', 'g') AS text FROM documents"
    ),
    "chunk_documents": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS words "
        "FROM documents WHERE length(text) > 0) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST((i.i - 1) / 64 AS BIGINT) AS chunk_idx, "
        "array_to_string(words[i.i : i.i + 63], ' ') AS chunk "
        "FROM w, LATERAL (SELECT unnest(generate_series(1, len(words), 64)) AS i) i"
    ),
    "passage_dedupe": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS words "
        "FROM documents WHERE length(text) > 0), "
        "s AS (SELECT doc_id, CAST((i.i - 1) / 8 AS BIGINT) AS b, "
        "array_to_string(words[i.i : i.i + 7], ' ') AS blk "
        "FROM w, LATERAL (SELECT unnest(generate_series(1, len(words), 8)) AS i) i), "
        "k AS (SELECT doc_id, b, blk, "
        "ROW_NUMBER() OVER (PARTITION BY blk ORDER BY doc_id, b) AS rn FROM s) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "string_agg(blk, ' ' ORDER BY b) AS text "
        "FROM k WHERE rn = 1 GROUP BY doc_id"
    ),
    "stopword_fraction": (
        "WITH f AS (SELECT doc_id, "
        "CAST(length(list_filter(string_split(text, ' '), "
        "x -> x IN ('the','a','of','to','and','in','is','it'))) AS BIGINT) AS n_stop, "
        "CAST(length(string_split(text, ' ')) AS BIGINT) AS total "
        "FROM documents) "
        "SELECT doc_id, n_stop, "
        "ROUND(CAST(n_stop AS DOUBLE) / greatest(total, 1), 4) AS stop_ratio, "
        "n_stop >= 2 AS enough_stopwords FROM f"
    ),
    "repetition_scores": (
        "SELECT doc_id, "
        "CAST(length(string_split(text, ' ')) AS BIGINT) AS total_tokens, "
        "CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_tokens, "
        "ROUND(1.0 - CAST(length(list_distinct(string_split(text, ' '))) AS DOUBLE) "
        "/ greatest(length(string_split(text, ' ')), 1), 4) AS rep_ratio "
        "FROM documents"
    ),
    "gopher_quality": (
        "WITH f AS (SELECT doc_id, "
        "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words, "
        "CAST(length(regexp_extract_all(text, '\\s')) AS BIGINT) AS n_ws, "
        "CAST(length(text) AS BIGINT) AS chars, "
        "CAST(length(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS alpha "
        "FROM documents) "
        "SELECT doc_id, n_words, "
        "ROUND((chars - n_ws) * 1.0 / greatest(n_words, 1), 4) AS mean_word_len, "
        "ROUND(alpha * 1.0 / greatest(chars, 1), 4) AS alpha_ratio, "
        "(n_words BETWEEN 10 AND 100000 "
        " AND ROUND((chars - n_ws) * 1.0 / greatest(n_words, 1), 4) BETWEEN 2.0 AND 12.0 "
        " AND ROUND(alpha * 1.0 / greatest(chars, 1), 4) > 0.6) AS keep "
        "FROM f"
    ),
    "multimodal_meta": (
        "SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nbytes, "
        "octet_length(CAST(text AS BLOB)) > 0 AS non_empty FROM documents"
    ),
    "jaccard_pairs": (
        "WITH grams AS ("
        "SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 4) AS gram "
        "FROM (SELECT doc_id, text, unnest(range(1, length(text) - 2)) AS i "
        "FROM documents)), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS m "
        "FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2) "
        "SELECT id_a, id_b FROM inter "
        "JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b "
        "WHERE 1000 * m >= 500 * (sa.n + sb.n - m) ORDER BY id_a, id_b"
    ),
    "jaccard_dedupe": (
        "WITH grams AS ("
        "SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 4) AS gram "
        "FROM (SELECT doc_id, text, unnest(range(1, length(text) - 2)) AS i "
        "FROM documents)), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS m "
        "FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id "
        "GROUP BY 1, 2), "
        "drops AS (SELECT DISTINCT id_b FROM inter "
        "JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b "
        "WHERE 1000 * m >= 500 * (sa.n + sb.n - m)) "
        "SELECT doc_id FROM documents WHERE doc_id NOT IN "
        "(SELECT id_b FROM drops) ORDER BY doc_id"
    ),
    "embedding_cosine_pairs": (
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])) >= 0.4 "
        "ORDER BY id_a, id_b"
    ),
    "embedding_dedupe": (
        "SELECT e.vec_id FROM embeddings e WHERE NOT EXISTS ("
        "SELECT 1 FROM embeddings o WHERE o.vec_id < e.vec_id "
        "AND list_cosine_similarity(CAST(o.embedding AS DOUBLE[]), "
        "CAST(e.embedding AS DOUBLE[])) >= 0.4) "
        "ORDER BY e.vec_id"
    ),
    "embedding_topk": (
        "SELECT vec_id, CAST(row_number() OVER "
        "(ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings ORDER BY vec_id LIMIT 1)) "
        "DESC, vec_id) AS BIGINT) AS rank "
        "FROM embeddings "
        "ORDER BY rank LIMIT 10"
    ),
    "cube_counts": (
        "SELECT lang, source, count(*) AS n FROM documents "
        "GROUP BY CUBE(lang, source)"
    ),
    "set_intersect_users": (
        "SELECT user_id FROM events WHERE event_type = 'click' AND value > 90 "
        "INTERSECT "
        "SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90"
    ),
    "set_except_users": (
        "SELECT user_id FROM events WHERE event_type = 'click' AND value > 90 "
        "EXCEPT "
        "SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90"
    ),
    "pivot_event_counts": (
        "SELECT user_id, "
        "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click, "
        "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error, "
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase, "
        "CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup, "
        "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view "
        "FROM events GROUP BY user_id"
    ),
    "corr_by_group": (
        "SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) "
        "AS corr_qp FROM lineitem GROUP BY l_returnflag"
    ),
    "exists_semi_groupby": (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n FROM orders o "
        "WHERE EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate) "
        "GROUP BY o_orderpriority"
    ),
    "explode_tokens": (
        "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"
    ),
    "funnel_steps": (
        "WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, min(e.ts) AS click_ts FROM events e "
        "JOIN v USING (user_id) WHERE e.event_type = 'click' "
        "AND e.ts > v.view_ts GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM events e "
        "JOIN c USING (user_id) WHERE e.event_type = 'purchase' "
        "AND e.ts > c.click_ts GROUP BY e.user_id) "
        "SELECT user_id, view_ts, click_ts, purchase_ts "
        "FROM v JOIN c USING (user_id) JOIN p USING (user_id)"
    ),
    "shipping_priority": (
        "WITH co AS (SELECT o_orderkey, o_orderdate, o_orderpriority "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-01-01'), "
        "li AS (SELECT l_orderkey, CAST(floor(l_extendedprice * "
        "(1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents FROM lineitem "
        "WHERE l_shipdate > TIMESTAMP '1998-01-01') "
        "SELECT l_orderkey, CAST(sum(cents) AS BIGINT) AS revenue_cents, "
        "o_orderdate, o_orderpriority "
        "FROM li JOIN co ON l_orderkey = o_orderkey "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue_cents DESC, l_orderkey LIMIT 10"
    ),
    "median_by_group": (
        "SELECT l_returnflag, median(l_quantity) AS med_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "multi_distinct": (
        "SELECT event_type, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
        "CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days "
        "FROM events GROUP BY event_type"
    ),
    "group_concat_langs": (
        "SELECT source, string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs "
        "FROM documents GROUP BY source"
    ),
    "store_median": (
        "SELECT median(n_chars) AS med_chars FROM documents"
    ),
    "grouping_sets": (
        "SELECT lang, source, count(*) AS n FROM documents "
        "GROUP BY GROUPING SETS ((lang), (source))"
    ),
    "promo_revenue_share": (
        "SELECT floor(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN cents "
        "ELSE 0 END) / sum(cents) * 1000000) / 1000000 AS promo_pct FROM "
        "(SELECT l_partkey, CAST(floor(l_extendedprice * (1 - l_discount) "
        "* 100 + 0.5) AS BIGINT) AS cents FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-02-01') "
        "JOIN part ON l_partkey = p_partkey"
    ),
    "urgent_line_counts": (
        "SELECT l_linestatus, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "GROUP BY l_linestatus"
    ),
    "large_orders": (
        "WITH s AS (SELECT l_orderkey, sum(l_quantity) AS q FROM lineitem "
        "GROUP BY l_orderkey HAVING sum(l_quantity) > 250) "
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, "
        "CAST(q AS BIGINT) AS sum_qty "
        "FROM s JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "local_supplier_revenue": (
        "SELECT n_name, CAST(sum(CAST(floor(l_extendedprice * "
        "(1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM customer, orders, lineitem, supplier, nation, region "
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
        "AND r_name = 'ASIA' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name"
    ),
    "unpivot_measures": (
        "SELECT l_orderkey, l_linenumber, measure, value FROM ("
        "SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, "
        "CAST(l_quantity AS DOUBLE) AS value FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', "
        "CAST(l_extendedprice AS DOUBLE) FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', "
        "CAST(l_discount AS DOUBLE) FROM lineitem "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', "
        "CAST(l_tax AS DOUBLE) FROM lineitem)"
    ),
    "store_histogram": (
        "SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n FROM documents "
        "WHERE n_chars IS NOT NULL GROUP BY bucket"
    ),
    "p90_by_group": (
        "SELECT l_returnflag, quantile_cont(l_quantity, 0.9) AS p90_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    "above_avg_orders": (
        "WITH m AS (SELECT o_custkey, avg(o_totalprice) AS a FROM orders "
        "GROUP BY o_custkey) "
        "SELECT o_orderkey, o_custkey FROM orders JOIN m USING (o_custkey) "
        "WHERE o_totalprice > m.a"
    ),
    "event_transitions": (
        "WITH s AS (SELECT event_type, lag(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type "
        "FROM events) "
        "SELECT prev_type, event_type AS next_type, "
        "CAST(count(*) AS BIGINT) AS n FROM s "
        "WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type"
    ),
    "orphan_orders": (
        "SELECT CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT) "
        "AS n_orphans, CAST(count(*) AS BIGINT) AS n_orders, "
        "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkeys "
        "FROM orders LEFT JOIN customer ON o_custkey = c_custkey"
    ),
    "bigram_counts": (
        "WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents), "
        "z AS (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p "
        "FROM toks WHERE len(t) >= 2) "
        "SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS n "
        "FROM z GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 100"
    ),
    "moving_sum_time": (
        "SELECT event_id, user_id, CAST(SUM(CAST(floor(value * 100 + 0.5) "
        "AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS hour_cents FROM events"
    ),
    "latest_event_per_user": (
        "SELECT user_id, ts, event_id, event_type FROM events "
        "QUALIFY row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) = 1"
    ),
    "kmeans_assign": (
        "WITH c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, "
        "embedding FROM (SELECT vec_id, embedding FROM embeddings "
        "ORDER BY vec_id LIMIT 8)), "
        "d AS (SELECT e.vec_id, c.cidx, "
        "round(list_distance(CAST(e.embedding AS DOUBLE[]), "
        "CAST(c.embedding AS DOUBLE[])), 6) AS dist "
        "FROM embeddings e CROSS JOIN c) "
        "SELECT vec_id, CAST(cidx AS BIGINT) AS cluster FROM d "
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cidx) = 1"
    ),
    # lang_id, minhash_lsh_pairs, simhash_fingerprints, near_dupes_verified,
    # embedding_near_pairs, media_features: non-SQL-expressible -> rows-only
}
