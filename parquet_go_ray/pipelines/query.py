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


def _family_of(encoded_dir: str, column: str) -> str | None:
    """The family holding `column`, if the column is DERIVED (lives in
    a family, not the base store). Base columns win a name clash."""
    from ..state import manifest

    t = manifest.lineage_table(
        encoded_dir,
        columns=["column"],
        filters=[("column", "==", column)],
    )
    if t is not None and t.num_rows:
        return None  # base column
    from .derive import list_families

    for fam, cols in list_families(encoded_dir).items():
        if column in cols:
            return fam
    return None


def _route(encoded_dir: str, column: str | None, pred: tuple | None) -> str:
    if pred is None:
        return "full_scan"
    op = pred[0]
    fam = _family_of(encoded_dir, column) if column else None
    if fam is not None:
        # derived column: range predicates prune via the FAMILY's own
        # manifest stats; everything else zips + residual-filters
        if op in ("between", "<=", ">="):
            return "family_stats"
        if op in ("==", "in", "is_null") or op in _PATTERN_OPS:
            return "family_zip"
        raise ValueError(f"unknown predicate op {op!r}")
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
    elif path == "family_stats":
        import json

        from ..state import manifest
        from .derive import family_dir as _fd

        fam = _family_of(encoded_dir, column)
        lo, hi = _range_of(pred)
        t = manifest.lineage_table(
            _fd(encoded_dir, fam),
            columns=["shard", "file", "column", "vmin", "vmax"],
            filters=[("column", "==", column)],
        )
        hit = set()
        for r in t.to_pylist() if t is not None else []:
            vmin = json.loads(r["vmin"]) if r.get("vmin") else None
            vmax = json.loads(r["vmax"]) if r.get("vmax") else None
            if lo is not None and vmax is not None and vmax < lo:
                continue
            if hi is not None and vmin is not None and vmin > hi:
                continue
            hit.add((r["shard"], r["file"]))
        out["family"] = fam
        out["files_admitted"] = len(hit)
    elif path == "family_zip":
        out["family"] = _family_of(encoded_dir, column)
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
    "contains"/"regex", s), ("is_null",), or None for a full scan.
    Derived (family) columns route transparently: range predicates
    prune via the family's stats, the rest zip + residual-filter."""
    import pyarrow as pa
    import pyarrow.compute as pc

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
    if path == "family_stats":
        from .derive import search_family_range

        lo, hi = _range_of(pred)
        return search_family_range(
            encoded_dir,
            _family_of(encoded_dir, column),
            lo=lo,
            hi=hi,
            columns=columns,
            column=column,
        )
    if path == "family_zip":
        from .derive import decode_with_family

        need = columns
        if columns is not None and column not in columns:
            need = list(columns) + [column]
        ds = decode_with_family(
            encoded_dir,
            families=[_family_of(encoded_dir, column)],
            columns=need,
        )
        op = pred[0]
        want = list(columns) if columns is not None else None

        def residual(t):
            c = t.column(column)
            if op == "is_null":
                keep = pc.is_null(c)
            elif op == "==":
                keep = pc.equal(c, pa.scalar(pred[1]))
            elif op == "in":
                keep = pc.is_in(c, value_set=pa.array(list(pred[1])))
            else:
                kern = {
                    "prefix": pc.starts_with,
                    "suffix": pc.ends_with,
                    "contains": pc.match_substring,
                    "regex": pc.match_substring_regex,
                }[op]
                keep = pc.fill_null(kern(c, pattern=pred[1]), False)
            t = t.filter(keep)
            if want is not None:
                t = t.select([x for x in want if x in t.column_names])
            return t

        return ds.map_batches(residual, batch_format="pyarrow")
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
