"""Wire-level parquet export job: shards -> real ``.parquet`` files
written by this repo's own encoders (codecs/parquet_wire), readable by
pyarrow / DuckDB / the reference itself.

Ray-Data-first and shard-aligned like the encode job: one task per
input shard writes one output parquet file (atomic tmp+rename), so a
failed run resumes by skipping outputs that already exist — file count
tracks shard count, never chunk count. Only tiny summary rows return
to the driver.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import pyarrow as pa

import ray
import ray.data

SUMMARY_SCHEMA = pa.schema(
    [
        pa.field("shard", pa.string()),
        pa.field("file", pa.string()),
        pa.field("rows", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("skipped", pa.bool_()),
    ]
)


def _reconcile_outputs(output_dir: str, summary) -> int:
    """Delete .parquet files in `output_dir` not produced (or skipped) by
    THIS run. Split-block shards carry content-hash-derived names; if Ray
    batches blocks differently on a rerun, a prior run's differently-named
    files would otherwise remain alongside the new ones and duplicate
    rows. At successful completion the summary covers every current input
    row exactly once, so anything else in the directory is stale."""
    expected = set(summary["file"]) if len(summary) else set()
    removed = 0
    for p in Path(output_dir).glob("*.parquet"):
        if p.name not in expected:
            p.unlink()
            removed += 1
    return removed


class _WireExporter:
    """map_batches callable: each call owns whole input shards (blocks
    are shard-aligned) and writes one wire parquet file per shard."""

    def __init__(
        self,
        output_dir: str,
        compression: str | None = None,
        encodings: dict[str, str] | None = None,
        # bounded row groups: flat/list columns page-slice internally,
        # but nested (Dremel-shredded) leaves write one page per row
        # group — a bounded group caps page size for every column kind
        rows_per_group: int | None = 65536,
        page_rows: int = 8192,
        resume: bool = True,
        sorting_columns: list[tuple[str, bool, bool]] | None = None,
        bloom_columns: tuple[str, ...] = (),
        data_page_version: int = 1,
    ):
        self.output_dir = output_dir
        self.compression = compression
        self.encodings = encodings
        self.rows_per_group = rows_per_group
        self.page_rows = page_rows
        self.resume = resume
        self.sorting_columns = sorting_columns
        self.bloom_columns = bloom_columns
        self.data_page_version = data_page_version

    @staticmethod
    def _is_whole_shard(source_path, n_rows: int) -> bool:
        if source_path is None:
            return False
        try:
            import pyarrow.parquet as pq

            return pq.read_metadata(source_path).num_rows == n_rows
        except Exception:
            return False

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs.parquet_wire import write_table
        from ..stages.encode import chunk_id_for, split_by_shard

        out = Path(self.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        rows = []
        for shard, source_path, group in split_by_shard(batch, "export"):
            if not self._is_whole_shard(source_path, group.num_rows):
                # shuffled input or a block-split shard slice: a
                # deterministic content-derived name keeps retries
                # idempotent and two tasks holding slices of the same
                # shard writing DISTINCT files (never a silent skip)
                shard = f"{shard}-{chunk_id_for(group)}"
            path = out / f"{shard}.parquet"
            if self.resume and path.exists():
                rows.append(
                    {
                        "shard": shard,
                        "file": path.name,
                        "rows": group.num_rows,
                        "bytes": 0,
                        "skipped": True,
                    }
                )
                continue
            tmp = str(path) + f".tmp{os.getpid()}"
            info = write_table(
                group,
                tmp,
                compression=self.compression,
                rows_per_group=self.rows_per_group,
                encodings=self.encodings,
                page_rows=self.page_rows,
                sorting_columns=self.sorting_columns,
                bloom_columns=self.bloom_columns,
                data_page_version=self.data_page_version,
            )
            os.replace(tmp, path)
            rows.append(
                {
                    "shard": shard,
                    "file": path.name,
                    "rows": info["rows"],
                    "bytes": info["bytes"],
                    "skipped": False,
                }
            )
        if not rows:
            return pa.table({f.name: [] for f in SUMMARY_SCHEMA}, schema=SUMMARY_SCHEMA)
        return pa.Table.from_pylist(rows, schema=SUMMARY_SCHEMA)


def export_parquet_job(
    input_files: list[str],
    output_dir: str,
    compression: str | None = None,
    encodings: dict[str, str] | None = None,
    rows_per_group: int | None = 65536,
    page_rows: int = 8192,
    resume: bool = True,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
    sorting_columns: list[tuple[str, bool, bool]] | None = None,
    bloom_columns: tuple[str, ...] = (),
    data_page_version: int = 1,
) -> dict:
    """Export parquet shards through the wire writer; returns a summary.

    Built (and executed) under the small encode-style streaming
    runahead: the wire encode is compute/bandwidth bound like the chunk
    encode, and the large read-side runahead peaks contention — A/B at
    sf0.1/32 CPUs: buffer 4 = 0.71-0.76 s, 32 = 1.12 s, 2 = 1.52 s."""
    from ..tuning import ENCODE_RUNAHEAD, runahead

    with runahead(ENCODE_RUNAHEAD):
        return _export_parquet_job_impl(
            input_files, output_dir, compression, encodings, rows_per_group,
            page_rows, resume, columns, override_num_blocks,
            sorting_columns, bloom_columns, data_page_version,
        )


def _export_parquet_job_impl(
    input_files: list[str],
    output_dir: str,
    compression: str | None = None,
    encodings: dict[str, str] | None = None,
    rows_per_group: int | None = 65536,
    page_rows: int = 8192,
    resume: bool = True,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
    sorting_columns: list[tuple[str, bool, bool]] | None = None,
    bloom_columns: tuple[str, ...] = (),
    data_page_version: int = 1,
) -> dict:
    t0 = time.time()
    input_files = sorted(input_files)
    nblocks = override_num_blocks or len(input_files)
    ds = ray.data.read_parquet(
        input_files,
        columns=columns,
        include_paths=True,
        override_num_blocks=nblocks,
    )
    exporter = _WireExporter(
        output_dir,
        compression=compression,
        encodings=encodings,
        rows_per_group=rows_per_group,
        page_rows=page_rows,
        resume=resume,
        sorting_columns=sorting_columns,
        bloom_columns=bloom_columns,
        data_page_version=data_page_version,
    )
    summary = ds.map_batches(
        exporter, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()
    stale = _reconcile_outputs(output_dir, summary)
    return {
        "rows": int(summary["rows"].sum()) if len(summary) else 0,
        "bytes": int(summary["bytes"].sum()) if len(summary) else 0,
        "files": int((~summary["skipped"]).sum()) if len(summary) else 0,
        "files_skipped": int(summary["skipped"].sum()) if len(summary) else 0,
        "files_stale_removed": stale,
        "sec": time.time() - t0,
    }


def export_store(
    store_dir: str,
    output_dir: str,
    compression: str | None = None,
    **kwargs,
) -> dict:
    """Decode an encoded chunk store and re-emit it as wire parquet
    (chunk store -> interchange format for external readers)."""
    from .decode import decode_dataset

    t0 = time.time()
    ds = decode_dataset(store_dir)
    exporter = _WireExporter(output_dir, compression=compression, **kwargs)
    summary = ds.map_batches(
        exporter, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()
    stale = _reconcile_outputs(output_dir, summary)
    return {
        "rows": int(summary["rows"].sum()) if len(summary) else 0,
        "bytes": int(summary["bytes"].sum()) if len(summary) else 0,
        "files": int((~summary["skipped"]).sum()) if len(summary) else 0,
        "files_stale_removed": stale,
        "sec": time.time() - t0,
    }
