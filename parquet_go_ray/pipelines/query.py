"""One query entry point over the encode store: route each predicate
to the cheapest access path the store's layout and metadata support —
what the per-operator API leaves to the caller, `scan` decides from
the predicate shape and the store itself (the reference's analogue is
the caller hand-picking Search/BloomFilter.Check/page-skip; here the
planner is explicit and inspectable via `explain`).

Routing table:

| predicate | path | why |
|---|---|---|
| `("==", v)` / `("in", vs)` with bloom sidecars on the column | `point_lookup` | probes read only (column, bloom) rows; payloads untouched |
| `("==", v)` / `("in", vs)` otherwise | `search_dict_domain` | O(dict) compares + int code tests; zero-match groups skip |
| `("between", lo, hi)` / `("<=",)` / `(">=",)` | `decode_dataset_pruned` | [vmin, vmax] stats prune chunk groups driver-side |
| `("prefix"/"suffix"/"contains"/"regex", s)` | `search_pattern` | dictionary-domain pattern kernel; prefix adds stats pruning |
| `("is_null",)` | `isnull_scan` | (n, n_null) stats + header validity bitmaps; no payload decode |
| `None` | `decode_dataset` | full projected scan |

`explain` returns the chosen path plus the driver-side prune counts
(files admitted / total) without executing anything.
"""

from __future__ import annotations

from pathlib import Path

import ray.data


def _has_bloom(encoded_dir: str, column: str) -> bool:
    """Does the store carry bloom sidecars for `column`? One chunk
    file's (column, bloom) rows answer it — column-pruned, driver-side,
    KB-scale."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .decode import chunk_files

    files = chunk_files(encoded_dir)
    if not files:
        return False
    t = pq.read_table(files[0], columns=["column", "bloom"])
    t = t.filter(pc.equal(t.column("column"), column))
    return t.num_rows > 0 and t.column("bloom").null_count < t.num_rows


_PATTERN_OPS = ("prefix", "suffix", "contains", "regex")


def _route(encoded_dir: str, column: str | None, pred: tuple | None) -> str:
    if pred is None:
        return "full_scan"
    op = pred[0]
    if op == "is_null":
        return "null_stats"
    if op in _PATTERN_OPS:
        return "dict_pattern"
    if op in ("between", "<=", ">="):
        return "stats_range"
    if op in ("==", "in"):
        return "bloom_probe" if _has_bloom(encoded_dir, column) else "dict_domain"
    raise ValueError(f"unknown predicate op {op!r}")


def explain(
    encoded_dir: str,
    column: str | None = None,
    pred: tuple | None = None,
) -> dict:
    """The plan `scan` would run, with driver-side prune counts. Pure
    metadata — nothing decodes."""
    from .decode import chunk_files, chunk_groups_pruned

    path = _route(encoded_dir, column, pred)
    total = len(chunk_files(encoded_dir))
    out = {"path": path, "files_total": total, "files_admitted": total}
    if path == "stats_range":
        lo, hi = _range_of(pred)
        files, ids = chunk_groups_pruned(encoded_dir, column, lo, hi)
        out["files_admitted"] = len(files)
        out["chunks_admitted"] = len(ids)
    elif path == "dict_pattern" and pred[0] == "prefix":
        needle = pred[1]
        if needle and ord(needle[-1]) < 0x10FFFF:
            hi = needle[:-1] + chr(ord(needle[-1]) + 1)
            files, ids = chunk_groups_pruned(encoded_dir, column, needle, hi)
            out["files_admitted"] = len(files)
            out["chunks_admitted"] = len(ids)
    elif path == "null_stats":
        from ..state import manifest

        t = manifest.lineage_table(
            encoded_dir,
            columns=["shard", "file", "n_null"],
            filters=[("column", "==", column)],
        )
        root = Path(encoded_dir) / "data"
        hit = {
            str(root / r["shard"] / f"{r['file']}.parquet")
            for r in (t.to_pylist() if t is not None else [])
            if r["n_null"]
        }
        out["files_admitted"] = len(hit)
    return out


def _range_of(pred: tuple):
    if pred[0] == "between":
        return pred[1], pred[2]
    if pred[0] == "<=":
        return None, pred[1]
    return pred[1], None  # >=


def scan(
    encoded_dir: str,
    column: str | None = None,
    pred: tuple | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Run the routed plan. Predicates: ("==", v), ("in", [vs]),
    ("between", lo, hi), ("<=", hi), (">=", lo), ("prefix"/"suffix"/
    "contains"/"regex", s), ("is_null",), or None for a full scan."""
    from .decode import (
        decode_dataset,
        decode_dataset_pruned,
        isnull_scan,
        point_lookup,
        search_dict_domain,
        search_pattern,
    )

    path = _route(encoded_dir, column, pred)
    if path == "full_scan":
        return decode_dataset(encoded_dir, columns=columns)
    if path == "null_stats":
        return isnull_scan(encoded_dir, column, columns=columns)
    if path == "dict_pattern":
        return search_pattern(
            encoded_dir, column, pred[0], pred[1], columns=columns
        )
    if path == "stats_range":
        lo, hi = _range_of(pred)
        ds = decode_dataset_pruned(encoded_dir, column, lo, hi)
        if columns is not None:
            want = list(columns)
            ds = ds.map_batches(
                lambda t: t.select([c for c in want if c in t.column_names]),
                batch_format="pyarrow",
            )
        return ds
    values = [pred[1]] if pred[0] == "==" else list(pred[1])
    if path == "bloom_probe":
        ds = point_lookup(encoded_dir, column, values)
        if columns is not None:
            want = list(columns)
            ds = ds.map_batches(
                lambda t: t.select([c for c in want if c in t.column_names]),
                batch_format="pyarrow",
            )
        return ds
    return search_dict_domain(encoded_dir, column, values, columns=columns)
