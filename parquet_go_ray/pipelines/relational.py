"""Row-stream combinators (reference §2.5 parity), Ray-Data-first.

Each mirrors a parquet-go row-stream operator re-expressed as Dataset
transforms (citations are to /root/reference):

- filter_expr        <- FilterRowReader (filter.go:5-90)
- transform          <- TransformRowReader (transform.go:9-143)
- scan_limit         <- ScanRowReader (scan.go:7-33)
- dedupe_consecutive <- DedupeRowReader (dedupe.go:8-111) — global via
                         sort+distinct (the shuffle makes 'consecutive'
                         global, SURVEY §2.5)
- merge_sorted       <- MergeRowGroups (merge.go:20-99): union of sorted
                         streams + global sort
- sorted_rows        <- SortingWriter (sorting.go:24-133): ds.sort is
                         Ray's sample-based range-partitioned sort
- convert_schema     <- ConvertRowGroup (convert.go:243-580): projection
                         + casts per batch
- column_stats       <- ColumnIndexer min/max/null-count
                         (column_index.go:259-272)
- bloom_semi_join    <- BloomFilter.Check (bloom.go:16-55): broadcast
                         filter probe + exact verify
- windowed_agg       — streaming-shaped tumbling window as
                         groupby(key, bucket) aggregate
"""

from __future__ import annotations

from ..util import autoscale_concurrency

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import BloomFilter, stable_hash_strings


def filter_expr(ds: ray.data.Dataset, predicate) -> ray.data.Dataset:
    """predicate: pa.Table -> BooleanArray (vectorized, never per-row)."""
    return ds.map_batches(
        lambda t: t.filter(predicate(t)), batch_format="pyarrow", zero_copy_batch=True
    )


def transform(ds: ray.data.Dataset, fn) -> ray.data.Dataset:
    """fn: pa.Table -> pa.Table (may drop/add rows and columns)."""
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def scan_limit(ds: ray.data.Dataset, order_cols: list[str], k: int) -> ray.data.Dataset:
    return ds.sort(order_cols).limit(k)


def sorted_rows(ds: ray.data.Dataset, keys: list[str], descending=False) -> ray.data.Dataset:
    return ds.sort(keys, descending=descending)


def merge_sorted(streams: list[ray.data.Dataset], keys: list[str]) -> ray.data.Dataset:
    """k-way merge of sorted streams = union + range-partitioned sort.
    This is the DISTRIBUTED form (all-to-all); for a single consumer of
    already-sorted runs, merge_sorted_iter streams the heap merge in
    O(n log k) without re-sorting (merge.go:84-99 parity)."""
    out = streams[0]
    for s in streams[1:]:
        out = out.union(s)
    return out.sort(keys)


def merge_sorted_iter(
    streams: list[ray.data.Dataset],
    keys: list[str],
    batch_size: int = 8192,
    max_rows: int = 2_000_000,
):
    """Streaming k-way heap merge of globally sorted Datasets: yields
    merged pyarrow Tables of ~batch_size rows in O(n log k), holding at
    most one in-flight batch per stream (constant memory) — the
    reference's MergeRowGroups/CopyRows read path (merge.go:84-99,
    sorting.go:79-133). Each input must already be sorted by `keys`
    (e.g. the output of sorted_rows / a sorted chunk store); consumption
    is driver-side streaming, exactly like any iter_batches sink.

    Inputs are materialized first: interleaved partial iteration of
    several LIVE streaming executors deadlocks (each pull blocks on the
    paused peers), whereas materialized blocks sit in the object store
    (spillable) and iterate independently — faithful to the reference,
    which heap-merges already-written sorted runs.

    This is a DRIVER-SIDE sink: every merged row flows through one
    process. max_rows caps that — above it the call REFUSES and points
    at merge_store.merge_sorted_stores, the distributed range-merge
    that never funnels rows through the driver."""
    import heapq

    import numpy as np

    # iter() is load-bearing: iter_batches returns a RE-ITERABLE, and a
    # bare `for` over it would restart the stream from the beginning on
    # every refill
    mats = [s.materialize() for s in streams]
    total = sum(m.count() for m in mats)  # metadata-only on materialized
    if total > max_rows:
        raise ValueError(
            f"merge_sorted_iter: {total} rows would stream through the "
            f"driver (> max_rows={max_rows}). Use "
            "merge_store.merge_sorted_stores for a distributed "
            "range-partitioned merge, or raise max_rows explicitly for "
            "a deliberate driver-side consume."
        )
    iters = [
        iter(m.iter_batches(batch_size=batch_size, batch_format="pyarrow"))
        for m in mats
    ]

    import bisect

    def batch_keys(batch: pa.Table) -> list[tuple]:
        # one key list per batch, built column-wise (no per-row .as_py());
        # nulls map to (True, sentinel) so they compare deterministically
        # (nulls-last) instead of raising TypeError against non-null keys
        cols = [batch.column(k).to_pylist() for k in keys]
        return [
            tuple((v is None, 0 if v is None else v) for v in row)
            for row in zip(*cols)
        ]

    def next_nonempty(it):
        for batch in it:
            if batch.num_rows:
                return batch, batch_keys(batch)
        return None, None

    heap = []  # (key, stream_idx, row_idx, batch, keys_list, iterator)
    for si, it in enumerate(iters):
        batch, bkeys = next_nonempty(it)
        if batch is not None:
            heapq.heappush(heap, (bkeys[0], si, 0, batch, bkeys, it))

    out_rows: list[pa.Table] = []
    n_out = 0
    while heap:
        key, si, ri, batch, bkeys, it = heapq.heappop(heap)
        # take the whole run of rows from this batch that stay <= the
        # next heap head: binary search on the batch's precomputed key
        # list — O(log batch) per run, not a per-row python scan
        if heap:
            hi = bisect.bisect_right(bkeys, heap[0][0], lo=ri + 1)
        else:
            hi = batch.num_rows
        out_rows.append(batch.slice(ri, hi - ri))
        n_out += hi - ri
        if hi < batch.num_rows:
            heapq.heappush(heap, (bkeys[hi], si, hi, batch, bkeys, it))
        else:
            nb, nk = next_nonempty(it)
            if nb is not None:
                heapq.heappush(heap, (nk[0], si, 0, nb, nk, it))
        if n_out >= batch_size:
            yield pa.concat_tables(out_rows)
            out_rows, n_out = [], 0
    if out_rows:
        yield pa.concat_tables(out_rows)


def dedupe_consecutive(ds: ray.data.Dataset, keys: list[str]) -> ray.data.Dataset:
    """Drop duplicates under the sort comparator (global semantics)."""

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return ds.groupby(keys).map_groups(first_per_group, batch_format="pandas")


def convert_schema(ds: ray.data.Dataset, conversions: dict[str, pa.DataType], keep: list[str] | None = None) -> ray.data.Dataset:
    def conv(t: pa.Table) -> pa.Table:
        cols, names = [], []
        for name in keep or t.column_names:
            arr = t.column(name)
            if name in conversions:
                arr = pc.cast(arr, conversions[name])
            cols.append(arr)
            names.append(name)
        return pa.table(dict(zip(names, cols)))

    return ds.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)


def column_stats(ds: ray.data.Dataset, group_col: str, value_col: str) -> ray.data.Dataset:
    """Per-group min/max/count (the column-index stats builder), computed
    with per-batch partial aggregation before the tiny groupby."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([group_col, value_col]).to_pandas()
        g = df.groupby(group_col)[value_col].agg(["min", "max", "count"]).reset_index()
        return pa.table(
            {
                group_col: g[group_col],
                "pmin": g["min"],
                "pmax": g["max"],
                "pcount": g["count"].astype("int64"),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "min_v": [g["pmin"].min()],
                "max_v": [g["pmax"].max()],
                "n": [int(g["pcount"].sum())],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
    )


def bloom_semi_join(
    ds: ray.data.Dataset, col: str, keys: list, exact: bool = True
) -> ray.data.Dataset:
    """Keep rows whose `col` is in `keys`: broadcast Bloom probe first
    (cheap, false-positive-prone), exact verify after. Equivalent to an
    IN-list semi-join without shuffling the big side."""
    bloom_ref = ray.put(BloomFilter(keys))
    key_set_ref = ray.put(set(keys))

    class Probe:
        def __init__(self):
            self.bloom = ray.get(bloom_ref)
            self.keys = ray.get(key_set_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            vals = df[col].to_numpy(dtype=object)
            maybe = self.bloom.contains(vals)
            out = df[maybe]
            if exact and len(out):
                out = out[out[col].isin(self.keys)]
            return out

    return ds.map_batches(Probe, batch_format="pandas", concurrency=autoscale_concurrency())


def asof_join_broadcast(
    ds: ray.data.Dataset,
    marks: pd.DataFrame,
    key_col: str,
    ts_col: str,
    mark_ts_col: str,
) -> ray.data.Dataset:
    """As-of join against a broadcast small side (no shuffle): for each
    row, the greatest mark timestamp <= row ts within its key. The big
    side streams; each batch does a per-key searchsorted against the
    broadcast sorted marks (`ray.put` once). This is the custom-operator
    pattern from the north rule: composition of map_batches + broadcast
    state, documented partitioning assumption = marks fit in memory."""
    by_key = {
        k: np.sort(g[mark_ts_col].to_numpy())
        for k, g in marks.groupby(key_col)
    }
    marks_ref = ray.put(by_key)

    class AsOf:
        def __init__(self):
            self.marks = ray.get(marks_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ts = df[ts_col].to_numpy()
            out = np.full(len(df), np.nan, dtype=np.float64)
            keys = df[key_col].to_numpy()
            for k in pd.unique(keys):
                m = self.marks.get(k)
                if m is None or not len(m):
                    continue
                sel = keys == k
                idx = np.searchsorted(m, ts[sel], side="right") - 1
                vals = np.where(idx >= 0, m[np.maximum(idx, 0)], np.nan)
                out[sel] = vals
            res = df.copy()
            res[mark_ts_col] = out
            return res[~np.isnan(out)]

    return ds.map_batches(AsOf, batch_format="pandas", concurrency=autoscale_concurrency())


def windowed_agg(
    ds: ray.data.Dataset,
    ts_col: str,
    key_col: str,
    value_col: str,
    window_us: int,
    parts: int = 32,
) -> ray.data.Dataset:
    """Tumbling event-time window: (key, window_start) -> count/sum.
    Partial per batch, then hash-partitioned merge: one vectorized
    pandas groupby per PARTITION, never a Python call per group (a
    per-group map_groups costs ~0.5 ms x groups — seconds at a few
    thousand windows)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bucket = (df[ts_col].astype("int64") // window_us).astype("int64")
        g = (
            df.assign(bucket=bucket)
            .groupby([key_col, "bucket"])[value_col]
            .agg(["count", "sum"])
            .reset_index()
        )
        g = g.rename(columns={"count": "pn", "sum": "psum"})
        from ..functions.hashing import stable_hash_strings

        h = stable_hash_strings(g[key_col].astype(str).to_numpy())
        g["pt"] = (
            (h ^ g["bucket"].to_numpy().view(np.uint64)) % np.uint64(parts)
        ).astype(np.int64)
        return g

    def final_part(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby([key_col, "bucket"], as_index=False).agg(
            n=("pn", "sum"), sum_value=("psum", "sum")
        )
        g["bucket"] = g["bucket"].astype("int64")
        g["n"] = g["n"].astype("int64")
        g["sum_value"] = g["sum_value"].astype(float)
        return g[[key_col, "bucket", "n", "sum_value"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("pt")
        .map_groups(final_part, batch_format="pandas")
    )


def deterministic_shuffle(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    seed: int = 0,
    key: str = "splitmix",
) -> ray.data.Dataset:
    """Reproducible global shuffle for training-order preparation: sort
    by a keyed hash of the id column.

    Unlike `ds.random_shuffle()`, whose output depends on the block
    layout of the moment, this order is a pure function of (ids, seed):
    a re-run, a resumed run, or a differently-sized cluster produces the
    IDENTICAL row order — the property training reproducibility and
    mid-epoch resume both need. New epochs = new seeds. The exchange is
    Ray's sample-partitioned range sort (the same machinery as
    SortingWriter), so the shuffle scales exactly like any other sort.

    key="splitmix" uses the 64-bit splitmix finalizer (full avalanche);
    key="knuth32" uses (id * 2654435761) % 2^32 — a weaker mix kept
    because it is expressible in portable SQL for cross-engine
    verification (the gate oracle). Ties (possible under knuth32)
    break on the id so the order stays total and deterministic."""
    import numpy as np

    from ..functions import hashing

    def add_key(df):
        ids = df[id_col].to_numpy().astype(np.int64)
        if key == "splitmix":
            k = hashing.splitmix64(
                ids.view(np.uint64) ^ np.uint64(seed)
            ).view(np.int64)
        elif key == "knuth32":
            k = (
                (ids + np.int64(seed)) * np.int64(2654435761)
            ) % np.int64(1 << 32)
        else:
            raise ValueError(f"unknown shuffle key {key!r}")
        df = df.copy()
        df["shuffle_key"] = k
        return df

    return ds.map_batches(add_key, batch_format="pandas").sort(
        ["shuffle_key", id_col]
    )


def topk_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    score_col: str,
    id_col: str,
    k: int,
    n_rows_hint: int | None = None,
) -> ray.data.Dataset:
    """Group-wise top-k by score (highest `score_col` wins, `id_col`
    ascending breaks ties) — the 'best k examples per language /
    domain / cluster' selection every curation pipeline ends with.

    Scale shape (the host_quota discipline): a batch partial keeps at
    most k rows per group per batch BEFORE any exchange, so the shuffle
    carries <= k * n_batches rows per group of (group, score, id)
    triples — never the corpus, never the payload. The merge side is
    hash-partitioned on the group value with ONE vectorized
    sort+groupby-head per partition (no per-group Python at web-scale
    group cardinalities). Rebuilding full rows for the winners is the
    caller's id-join if needed; emitting ids keeps the exchange k-bounded.
    """
    from .dedup import _n_partitions

    kk = int(k)
    P = _n_partitions(n_rows_hint, 1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = (
            df[[group_col, score_col, id_col]]
            .sort_values(
                [score_col, id_col], ascending=[False, True], kind="stable"
            )
            .groupby(group_col, sort=False)
            .head(kk)
        )
        g = sub[group_col].to_numpy()
        h = stable_hash_strings(g.astype(object))
        return pd.DataFrame(
            {
                group_col: g,
                score_col: sub[score_col].to_numpy(),
                id_col: sub[id_col].to_numpy().astype(np.int64),
                "pt": (h % np.uint64(P)).astype(np.int64),
            }
        )

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        out = (
            part.sort_values(
                [score_col, id_col], ascending=[False, True], kind="stable"
            )
            .groupby(group_col, sort=False)
            .head(kk)
        )
        return out[[group_col, score_col, id_col]].reset_index(drop=True)

    return (
        ds.select_columns([group_col, score_col, id_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("pt")
        .map_groups(merge, batch_format="pandas")
    )


def anti_join_broadcast(
    ds: ray.data.Dataset,
    key_col: str,
    keys_small: ray.data.Dataset,
) -> ray.data.Dataset:
    """Broadcast ANTI join: keep rows of `ds` whose `key_col` does NOT
    appear in `keys_small` (a blocklist join — banned hosts, revoked
    licenses, opted-out domains).

    The small side is materialized ONCE into the object store
    (`ray.put`) and probed zero-copy inside every task — the corpus
    never shuffles, the exchange is |blocklist| bytes total. This is
    the complement of bloom_semi_join, but EXACT and inverted: a false
    positive here would silently drop a kept row, so no filter
    approximation is admissible (same reasoning as the curation
    chain's exact anti-join, dedup.py::anti_join_ids)."""
    import pyarrow.compute as _pc

    small = pa.concat_tables(
        ray.get(keys_small.to_arrow_refs()), promote_options="default"
    )
    block_ref = ray.put(small.column(0).combine_chunks())

    def drop(t: pa.Table) -> pa.Table:
        block = ray.get(block_ref)
        mask = _pc.is_in(t.column(key_col), value_set=block)
        return t.filter(_pc.invert(mask))

    return ds.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)


def interval_join_broadcast(
    ds: ray.data.Dataset,
    value_col: str,
    intervals: list[tuple],
    out_cols: list[str],
    name_col: str = "window_name",
) -> ray.data.Dataset:
    """Broadcast INTERVAL (range) join: each row joins every interval
    `(name, lo, hi)` with lo <= value < hi — overlapping intervals fan
    a row out to multiple matches (calendar windows, SLA bands,
    retention tiers). Ray Data has no native range join; against a
    SMALL interval table the right shape is a broadcast map-side join:
    the interval list rides the closure (bytes), each task evaluates
    all intervals against its batch with one vectorized mask per
    interval, and NOTHING shuffles. The per-interval loop is over
    |intervals| (small by precondition), never over rows; a large
    interval side would instead need the sorted-endpoint partition
    strategy documented in SCALE.md."""

    def fan(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        parts = []
        for name, lo, hi in intervals:
            mask = pc.and_(
                pc.greater_equal(v, pa.scalar(lo)), pc.less(v, pa.scalar(hi))
            )
            sub = t.filter(mask).select(out_cols)
            parts.append(
                sub.append_column(
                    name_col, pa.array([name] * sub.num_rows, pa.string())
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)
