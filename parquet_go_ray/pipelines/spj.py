"""Storage-partitioned join: zero-shuffle equi-join over co-bucketed
encode stores.

Two stores written with ``encode_job(mode="bucket")`` and the same
bucketing spec (bucket count, hash version, key kind — recorded in each
store's job meta) are co-partitioned BY CONSTRUCTION: equal join keys
hash to equal bucket indexes on both sides. The join therefore needs no
exchange at any scale: one task per bucket decodes that bucket's chunk
files from both stores and hash-joins them locally (pyarrow Acero).
This is the classic storage-partitioned-join pattern from modern
lakehouse engines, re-expressed as a Ray Data pipeline; the reference
has no join operator at all (SURVEY §2.5), so like hash_join this is a
beyond-reference scale feature.

Scale notes (100 TB): the driver touches only the two manifests (shard
-> file lists, ~1e-5 of data) to build one (bucket, left files, right
files) row per bucket; payloads never move between nodes — each task
reads its own bucket's files from shared storage. Skewed keys are
bounded by the bucket count chosen at WRITE time (size buckets so the
largest fits a worker's heap: rows/B per side per task). Tombstones on
either store are applied in-task before the join.
"""

from __future__ import annotations

import re
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

# optional "+g<hex>" generation suffix: incremental appends land as new
# shards of the same bucket (textindex.update_text_index)
_BUCKET_RE = re.compile(r"^bucket=(\d+)(?:\+g[0-9a-f]+)?$")


def _bucket_spec(store: str) -> dict:
    from ..state import manifest

    meta = manifest.load_job_meta(store) or {}
    spec = meta.get("bucketing")
    if not spec:
        raise ValueError(
            f"{store} is not a bucketed store (encode with mode='bucket')"
        )
    return spec


def _bucket_files(store: str) -> dict[int, list[str]]:
    """bucket index -> chunk-file paths, from the manifest (metadata
    only; the authoritative file list, stale files ignored)."""
    from ..state import manifest

    t = manifest.lineage_table(store, columns=["shard", "file"])
    root = Path(store) / "data"
    out: dict[int, set[str]] = {}
    if t is None:
        return {}
    for s, f in zip(t.column("shard").to_pylist(), t.column("file").to_pylist()):
        m = _BUCKET_RE.match(s)
        if not m:
            continue
        out.setdefault(int(m.group(1)), set()).add(
            str(root / s / f"{f}.parquet")
        )
    return {b: sorted(fs) for b, fs in out.items()}


def check_cobucketed(left: str, right: str) -> int:
    """Validate the co-partitioning contract; returns the shared bucket
    count. Joining stores with differing specs would silently drop every
    cross-bucket match, so this is a hard error, not a fallback."""
    ls, rs = _bucket_spec(left), _bucket_spec(right)
    for field in ("num_buckets", "hash", "kind"):
        if ls.get(field) != rs.get(field):
            raise ValueError(
                "stores are not co-bucketed: "
                f"{field}={ls.get(field)!r} vs {rs.get(field)!r} "
                f"({left} vs {right})"
            )
    return int(ls["num_buckets"])


def _decode_files(
    files: list[str],
    columns: list[str] | None,
    tombs: dict[str, pa.Array],
) -> pa.Table:
    """Decode one bucket's chunk files inside the task (projected read:
    non-selected columns' payloads never leave storage), then apply any
    surviving tombstones."""
    from ..stages.decode import decode_chunk_table

    decode_cols = columns
    if tombs and columns is not None:
        decode_cols = list(dict.fromkeys(list(columns) + list(tombs)))
    filters = [("column", "in", decode_cols)] if decode_cols else None
    parts = []
    for path in files:
        chunks = pq.read_table(path, filters=filters)
        if chunks.num_rows:
            parts.append(decode_chunk_table(chunks))
    if not parts:
        return pa.table({})
    t = pa.concat_tables(parts)
    for col, vals in tombs.items():
        if col in t.column_names:
            t = t.filter(pc.invert(pc.is_in(t.column(col), value_set=vals)))
    if columns is not None:
        t = t.select([c for c in columns if c in t.column_names])
    return t


def storage_partitioned_join(
    left: str,
    right: str,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    right_suffix: str = "_r",
) -> ray.data.Dataset:
    """Join two co-bucketed encode stores on their bucket keys with zero
    shuffle: one task per bucket, local Acero hash join inside the task.

    `left_on` / `right_on` default to each store's recorded bucket key;
    passing a different column is an error (only the bucket key is
    co-partitioned). Column projections push into the chunk-file reads.
    """
    from ..state import manifest
    from .tombstone import load_tombstones

    manifest.check_format_version(left, "join")
    manifest.check_format_version(right, "join")
    num_buckets = check_cobucketed(left, right)
    ls, rs = _bucket_spec(left), _bucket_spec(right)
    right_on = right_on or rs["key"]
    if left_on != ls["key"] or right_on != rs["key"]:
        raise ValueError(
            f"join keys must be the stores' bucket keys "
            f"({ls['key']!r}, {rs['key']!r}); got ({left_on!r}, {right_on!r})"
        )
    if left_columns is not None and left_on not in left_columns:
        left_columns = [left_on] + list(left_columns)
    if right_columns is not None and right_on not in right_columns:
        right_columns = [right_on] + list(right_columns)

    lf, rf = _bucket_files(left), _bucket_files(right)
    # tombstones are KB-scale; load once on the driver, ship in the items
    ltombs, rtombs = load_tombstones(left), load_tombstones(right)
    keep_left = how in ("left outer", "full outer")
    keep_right = how in ("right outer", "full outer")
    items = []
    for b in range(num_buckets):
        lfs, rfs = lf.get(b, []), rf.get(b, [])
        if how == "inner" and not (lfs and rfs):
            continue
        if not lfs and not keep_right:
            continue
        if not rfs and not keep_left:
            continue
        if not lfs and not rfs:
            continue
        items.append({"bucket": b, "left_files": lfs, "right_files": rfs})
    if not items:
        raise FileNotFoundError("no populated buckets to join")

    # outer joins may meet buckets populated on one side only; the empty
    # side still needs its schema for Acero. One small chunk file per
    # store is decoded driver-side to capture it (zero rows shipped).
    lschema = rschema = None
    if keep_left or keep_right:
        first_l = next((fs[0] for fs in lf.values() if fs), None)
        first_r = next((fs[0] for fs in rf.values() if fs), None)
        if first_l:
            lschema = _decode_files([first_l], left_columns, ltombs).schema
        if first_r:
            rschema = _decode_files([first_r], right_columns, rtombs).schema

    def join_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            lt = (
                _decode_files(row["left_files"], left_columns, ltombs)
                if row["left_files"]
                else pa.table(
                    {f.name: pa.array([], f.type) for f in lschema}
                )
            )
            rt = (
                _decode_files(row["right_files"], right_columns, rtombs)
                if row["right_files"]
                else pa.table(
                    {f.name: pa.array([], f.type) for f in rschema}
                )
            )
            out = lt.join(
                rt,
                keys=left_on,
                right_keys=right_on,
                join_type=how,
                right_suffix=right_suffix,
            )
            outs.append(out)
        return pa.concat_tables(outs, promote_options="default")

    ds = ray.data.from_items(items, override_num_blocks=len(items))
    return ds.map_batches(
        join_bucket, batch_format="pyarrow", batch_size=None
    )


def storage_partitioned_groupby(
    store: str,
    aggregations: list[tuple[str, str]],
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """GROUP BY the store's bucket key with ZERO shuffle: the bucketed
    layout puts every occurrence of a key in exactly one bucket, so each
    bucket task decodes its files and computes COMPLETE groups locally
    (pyarrow hash aggregate) — no combiner/merge stage exists at all.
    The pre-aggregation-then-small-groupby pattern collapses to just
    the pre-aggregation.

    `aggregations` is a list of (column, arrow_fn) pairs, e.g.
    [("o_totalprice", "sum"), ("o_orderkey", "count")]; output columns
    follow Arrow naming (`o_totalprice_sum`). Tombstones apply in-task
    before grouping."""
    from ..state import manifest
    from .tombstone import load_tombstones

    manifest.check_format_version(store, "groupby")
    spec = _bucket_spec(store)
    key = spec["key"]
    need = list(
        dict.fromkeys(
            [key]
            + [c for c, _ in aggregations if c != key]
            + (columns or [])
        )
    )
    tombs = load_tombstones(store)
    by_bucket = _bucket_files(store)
    if not by_bucket:
        raise FileNotFoundError(f"no bucket shards under {store}")
    items = [
        {"bucket": b, "files": fs} for b, fs in sorted(by_bucket.items())
    ]

    def agg_bucket(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            t = _decode_files(row["files"], need, tombs)
            if t.num_rows == 0:
                continue
            outs.append(
                pa.TableGroupBy(t, key).aggregate(
                    [(c, f) for c, f in aggregations]
                )
            )
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_items(
        items, override_num_blocks=len(items)
    ).map_batches(agg_bucket, batch_format="pyarrow", batch_size=None)
