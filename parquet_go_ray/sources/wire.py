"""Ray Data source backed by OUR wire-level parquet reader.

`read_parquet_native(paths)` distributes foreign parquet files across
Ray tasks, each parsed and decoded entirely by
codecs/parquet_wire_read (no pyarrow parquet in the loop) — the
Ray-native shape of the reference's file reader (file_.go /
reader.go): one task per file, streaming blocks, column projection
pushed into the page reads.

At scale the unit of parallelism is the file (shards >> cores in a
real corpus); row-group-level splitting inside one file is the chunk
engine's job, not this interop reader's.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


def read_parquet_native(
    paths: list[str], columns: list[str] | None = None
) -> ray.data.Dataset:
    if isinstance(paths, str):
        paths = [paths]
    paths = sorted(paths)

    def load(batch: pa.Table) -> pa.Table:
        from ..codecs.parquet_wire_read import read_table

        tables = [
            read_table(p, columns=columns)
            for p in batch.column("path").to_pylist()
        ]
        return pa.concat_tables(tables, promote_options="default")

    ds = ray.data.from_items(
        [{"path": p} for p in paths], override_num_blocks=len(paths)
    )
    return ds.map_batches(load, batch_format="pyarrow", batch_size=None)
