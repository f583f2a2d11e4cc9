"""Ray Data source backed by OUR wire-level parquet reader.

`read_parquet_native(paths)` distributes foreign parquet files across
Ray tasks, each parsed and decoded entirely by
codecs/parquet_wire_read (no pyarrow parquet in the loop) — the
Ray-native shape of the reference's file reader (file_.go /
reader.go). Planning is ROW-GROUP granular: the driver reads only
each file's footer (a tail read, ~KBs against TB-scale data) and
fans one task out per row group, so a few huge files still saturate
the cluster; single-row-group shards degrade to one task per file.
Column projection pushes into the page reads.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


def _parallel_footer_probe(paths, fn):
    """Footer probes are independent tail reads — run them in a driver
    thread pool so planning over many files doesn't serialize on
    storage round-trips."""
    if len(paths) <= 4:
        return [fn(p) for p in paths]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=16) as ex:
        return list(ex.map(fn, paths))


def read_parquet_native(
    paths: list[str],
    columns: list[str] | None = None,
    row_group_granular: bool = True,
    range_filter: tuple[str, object, object] | None = None,
    point_filter: tuple[str, list] | None = None,
    row_range: tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Distributed native read. With `range_filter=(col, lo, hi)`, each
    task answers the predicate through the file's own
    ColumnIndex/OffsetIndex (read_table_pruned): only pages whose
    [min, max] intersects the range are decoded, and files/row groups
    the index excludes are skipped entirely — the distributed form of
    the reference's Search page pruning (search.go:6-116). With
    `point_filter=(col, values)`, each task probes the file's standard
    split-block bloom filters first (bloom.go:16-55): a file whose
    filters exclude every probe value is never read past the footer."""
    if isinstance(paths, str):
        paths = [paths]
    paths = sorted(paths)
    if not paths:
        raise ValueError("read_parquet_native: no input files")
    if sum(x is not None for x in (range_filter, point_filter, row_range)) > 1:
        raise ValueError("range_filter / point_filter / row_range are exclusive")
    # a projection that omits the predicate column is widened for the
    # read and narrowed back after filtering
    pred_col = (range_filter or point_filter or (None,))[0]
    read_cols = columns
    if columns is not None and pred_col is not None and pred_col not in columns:
        read_cols = list(columns) + [pred_col]

    if row_range is not None:
        # SeekToRow, distributed: files in sorted order form one logical
        # table; the driver tail-reads footers for row counts and fans
        # out only files intersecting [start, stop) — in-task, the
        # OffsetIndex narrows the read to intersecting pages
        from ..codecs.parquet_wire_read import read_footer

        start, stop = row_range
        counts = _parallel_footer_probe(
            paths, lambda p: sum(rg[3] for rg in read_footer(p).get(4, []))
        )
        g0, plan = 0, []
        for p, n in zip(paths, counts):
            ls, le = max(start - g0, 0), min(stop - g0, n)
            if ls < le:
                plan.append({"path": p, "start": ls, "stop": le})
            g0 += n

        def load_rows(batch: pa.Table) -> pa.Table:
            from ..codecs.parquet_wire_read import read_table_rows

            tables = [
                read_table_rows(p, s, e, columns=columns)[0]
                for p, s, e in zip(
                    batch.column("path").to_pylist(),
                    batch.column("start").to_pylist(),
                    batch.column("stop").to_pylist(),
                )
            ]
            if not tables:
                from ..codecs.parquet_wire_read import empty_table

                return empty_table(batch.column("path")[0].as_py(), columns)
            return pa.concat_tables(tables, promote_options="default")

        if not plan:
            plan = [{"path": paths[0], "start": 0, "stop": 0}]
        ds = ray.data.from_items(plan, override_num_blocks=max(1, len(plan)))
        return ds.map_batches(load_rows, batch_format="pyarrow", batch_size=None)

    items = []
    if row_group_granular and range_filter is None and point_filter is None:
        from ..codecs.parquet_wire_read import num_row_groups

        for p, n in zip(paths, _parallel_footer_probe(paths, num_row_groups)):
            if n <= 1:
                items.append({"path": p, "rg": -1})
            else:
                items.extend({"path": p, "rg": g} for g in range(n))
    else:
        # pruned reads plan per FILE: the page index makes row-group
        # selection an in-task footer decision, no driver probing needed
        items = [{"path": p, "rg": -1} for p in paths]

    def load(batch: pa.Table) -> pa.Table:
        from ..codecs.parquet_wire_read import (
            bloom_may_contain,
            read_table,
            read_table_pruned,
        )

        tables = []
        for p, rg in zip(
            batch.column("path").to_pylist(), batch.column("rg").to_pylist()
        ):
            if range_filter is not None:
                col, lo, hi = range_filter
                t, _info = read_table_pruned(p, col, lo, hi, columns=read_cols)
                tables.append(t.select(columns) if read_cols is not columns else t)
            elif point_filter is not None:
                import pyarrow.compute as pc

                col, values = point_filter
                if not bloom_may_contain(p, col, values).any():
                    continue  # provably absent: footer-only read
                t = read_table(p, columns=read_cols)
                t = t.filter(pc.is_in(t.column(col), value_set=pa.array(values)))
                tables.append(t.select(columns) if read_cols is not columns else t)
            else:
                tables.append(
                    read_table(
                        p, columns=columns, row_groups=None if rg < 0 else [rg]
                    )
                )
        if not tables:
            from ..codecs.parquet_wire_read import empty_table

            # bloom-pruned everything in this task: typed empty result
            # from a footer-only tail read
            return empty_table(batch.column("path")[0].as_py(), columns)
        return pa.concat_tables(tables, promote_options="default")

    ds = ray.data.from_items(items, override_num_blocks=max(1, len(items)))
    return ds.map_batches(load, batch_format="pyarrow", batch_size=None)
