"""Encode stage: Arrow batches -> encoded column chunks (+ lineage).

The unit of output is a *chunk group*: all columns of one row-slice,
stored as one parquet file of (column, codec, payload) rows — the
Ray-native analogue of a row group's column chunks in the reference
(writer.go:568-692). Chunk ids are content-derived (sha1 of the first
column's buffers + row count), so task retries are idempotent and a
resumed run reproduces identical ids for identical input slices.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..codecs import chunk as chunk_mod
from ..codecs import registry as R

CHUNK_SCHEMA = pa.schema(
    [
        pa.field("chunk_id", pa.string()),
        pa.field("shard", pa.string()),
        pa.field("col_idx", pa.int32()),
        pa.field("column", pa.string()),
        pa.field("codec", pa.string()),
        pa.field("n", pa.int64()),
        pa.field("n_null", pa.int64()),
        pa.field("raw_nbytes", pa.int64()),
        pa.field("enc_nbytes", pa.int64()),
        pa.field("crc32", pa.int64()),
        # per-chunk column statistics (ColumnIndexer parity,
        # column_index.go:259-272): JSON-encoded min/max of the non-null
        # values (numbers as numbers, timestamps as epoch micros,
        # strings truncated to 64 chars), null for binary/nested
        pa.field("vmin", pa.string()),
        pa.field("vmax", pa.string()),
        # optional split-block-style bloom sidecar for key columns
        # (bloom.go:99-117 parity): probe before decode
        pa.field("bloom", pa.large_binary()),
        pa.field("payload", pa.large_binary()),
    ]
)

_STAT_TRUNC = 64


def _stat_bounds(arr: pa.Array):
    """(vmin, vmax) as JSON strings, or (None, None) if not applicable."""
    import json

    import pyarrow.compute as pc

    ty = arr.type
    if len(arr) == arr.null_count:
        return None, None
    try:
        if pa.types.is_timestamp(ty):
            ints = arr.view(pa.int64()) if ty.bit_width == 64 else arr
            mm = pc.min_max(ints)
            return json.dumps(mm["min"].as_py()), json.dumps(mm["max"].as_py())
        if (
            pa.types.is_integer(ty)
            or pa.types.is_floating(ty)
            or pa.types.is_date(ty)
            or pa.types.is_boolean(ty)
        ):
            mm = pc.min_max(arr)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if pa.types.is_date(ty):
                lo, hi = str(lo), str(hi)
            return json.dumps(lo), json.dumps(hi)
        if pa.types.is_string(ty) or pa.types.is_large_string(ty):
            mm = pc.min_max(arr)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            lo = lo[:_STAT_TRUNC]  # truncated min is still a lower bound
            if len(hi) > _STAT_TRUNC:
                hi = hi[:_STAT_TRUNC] + "￿"  # keep it an upper bound
            return json.dumps(lo), json.dumps(hi)
    except Exception:
        pass
    return None, None


def chunk_id_for(table: pa.Table) -> str:
    """Deterministic content-derived chunk id."""
    h = hashlib.sha1()
    col = table.column(0).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks else pa.array([], type=col.type)
    for buf in col.buffers():
        if buf is not None:
            h.update(buf)
    h.update(str(table.num_rows).encode())
    return h.hexdigest()[:16]


def encode_table(
    table: pa.Table,
    shard: str = "mem",
    codec_overrides: dict[str, int] | None = None,
    compression: str | None = None,
    bloom_columns: tuple[str, ...] = ("url",),
    column_ctx: dict[str, dict] | None = None,
) -> pa.Table:
    """Encode all columns of a table slice into a chunk-record table.

    column_ctx maps column name -> shared codec state (e.g. a cached
    FSST symbol table held by a per-partition actor)."""
    cid = chunk_id_for(table)
    rows = {k: [] for k in CHUNK_SCHEMA.names}
    for i, name in enumerate(table.column_names):
        arr = table.column(name).combine_chunks()
        codec = (codec_overrides or {}).get(name)
        ctx = column_ctx.setdefault(name, {}) if column_ctx is not None else None
        blob = chunk_mod.encode_array(arr, codec, compression, ctx)
        vmin, vmax = _stat_bounds(arr)
        bloom = None
        if name in bloom_columns and table.num_rows:
            from ..functions.hashing import BloomFilter

            vals = arr.drop_null().to_numpy(zero_copy_only=False)
            if len(vals):
                bloom = BloomFilter(vals).bits.tobytes()
        rows["chunk_id"].append(cid)
        rows["shard"].append(shard)
        rows["col_idx"].append(i)
        rows["column"].append(name)
        rows["codec"].append(R.CODEC_NAMES[blob[4]])
        rows["n"].append(len(arr))
        rows["n_null"].append(arr.null_count)
        rows["raw_nbytes"].append(arr.nbytes)
        rows["enc_nbytes"].append(len(blob))
        rows["crc32"].append(zlib.crc32(blob))
        rows["vmin"].append(vmin)
        rows["vmax"].append(vmax)
        rows["bloom"].append(bloom)
        rows["payload"].append(blob)
    return pa.table(rows, schema=CHUNK_SCHEMA)


def lineage_of(chunks: pa.Table) -> pa.Table:
    """Chunk records minus payloads/blooms (the manifest rows; blooms
    stay in the chunk files and are probed with column-pruned reads)."""
    return chunks.drop_columns(["payload", "bloom"])


def write_chunk_file(chunks: pa.Table, output_dir: str) -> str:
    """Write one chunk group atomically; returns the file path."""
    shard = chunks.column("shard")[0].as_py()
    cid = chunks.column("chunk_id")[0].as_py()
    d = Path(output_dir) / "data" / shard
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{cid}.parquet"
    tmp = str(path) + f".tmp{os.getpid()}"
    # payloads are already encoded — store uncompressed
    pq.write_table(chunks, tmp, compression="NONE")
    os.replace(tmp, path)
    return str(path)


class ChunkEncoder:
    """map_batches callable for the distributed encode stage. Passed as
    an INSTANCE -> stateless Ray tasks (elastic, no pool startup); see
    CachedStateEncoder for the actor-pool variant with cross-batch
    symbol-table state.

    output_dir=None  -> emit full chunk records (in-memory mode)
    output_dir=str   -> write chunk files, emit lineage records only
    """

    def __init__(
        self,
        output_dir: str | None = None,
        codec_overrides: dict[str, str] | None = None,
        rows_per_chunk: int = 4096,
        skip_completed: bool = True,
        compression: str | None = None,
        bloom_columns: tuple[str, ...] = ("url",),
        default_shard: str = "mem",
        max_chunk_bytes: int = 64 << 20,
    ):
        self.default_shard = default_shard
        self.output_dir = output_dir
        self.rows_per_chunk = rows_per_chunk
        # wide-row guard: a chunk is capped by BYTES as well as rows, so
        # MB-scale html/media payloads cannot blow a worker's heap
        # (the analogue of the reference's page-size cut, writer.go:1074-1087)
        self.max_chunk_bytes = max_chunk_bytes
        self.skip_completed = skip_completed
        self.compression = compression
        self.bloom_columns = tuple(bloom_columns)
        self.codec_overrides = {
            k: R.CODEC_IDS[v] for k, v in (codec_overrides or {}).items()
        }
        self._completed: set[str] | None = None

    def _shard_done(self, shard: str) -> bool:
        if not (self.output_dir and self.skip_completed):
            return False
        if self._completed is None:
            from ..state import manifest

            self._completed = manifest.completed_shards(self.output_dir)
        return shard in self._completed

    def _chunk_rows(self, table: pa.Table) -> int:
        if table.num_rows == 0:
            return self.rows_per_chunk
        row_bytes = max(1, table.nbytes // table.num_rows)
        return max(1, min(self.rows_per_chunk, self.max_chunk_bytes // row_bytes))

    def __call__(self, batch: pa.Table) -> pa.Table:
        outputs = []
        for shard, group in split_by_shard(batch, self.default_shard):
            if self._shard_done(shard):
                continue
            step = self._chunk_rows(group)
            for start in range(0, group.num_rows, step):
                piece = group.slice(start, step)
                chunks = encode_table(piece, shard, self.codec_overrides, self.compression, self.bloom_columns)
                if self.output_dir:
                    write_chunk_file(chunks, self.output_dir)
                    outputs.append(lineage_of(chunks))
                else:
                    outputs.append(chunks)
        if not outputs:
            empty = CHUNK_SCHEMA if not self.output_dir else _lineage_schema()
            return pa.table({f.name: [] for f in empty}, schema=empty)
        return pa.concat_tables(outputs)


class CachedStateEncoder(ChunkEncoder):
    """Actor-pool encode stage holding per-partition symbol-table state
    (the north star's 'actor pools holding per-partition FSST/dict
    symbol-table state'; analogue of the reference's per-writerColumn
    dictionary state, writer.go:340-347).

    Each actor caches the trained FSST table per column and reuses it
    across batches — training cost is paid once per actor instead of
    once per chunk. The output compression ratio per column is
    monitored; if it degrades more than `retrain_slack` relative to the
    ratio observed when the table was fresh, the cache is dropped and
    the next batch retrains (data drift guard).
    """

    def __init__(self, *args, retrain_slack: float = 0.15, **kwargs):
        super().__init__(*args, **kwargs)
        self.retrain_slack = retrain_slack
        self._ctx: dict[str, dict] = {}
        self._baseline: dict[str, float] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        outputs = []
        for shard, group in split_by_shard(batch, self.default_shard):
            if self._shard_done(shard):
                continue
            step = self._chunk_rows(group)
            for start in range(0, group.num_rows, step):
                piece = group.slice(start, step)
                chunks = encode_table(
                    piece,
                    shard,
                    self.codec_overrides,
                    self.compression,
                    self.bloom_columns,
                    column_ctx=self._ctx,
                )
                self._monitor(chunks)
                if self.output_dir:
                    write_chunk_file(chunks, self.output_dir)
                    outputs.append(lineage_of(chunks))
                else:
                    outputs.append(chunks)
        if not outputs:
            empty = CHUNK_SCHEMA if not self.output_dir else _lineage_schema()
            return pa.table({f.name: [] for f in empty}, schema=empty)
        return pa.concat_tables(outputs)

    def _monitor(self, chunks: pa.Table) -> None:
        cols = chunks.column("column").to_pylist()
        raw = chunks.column("raw_nbytes").to_pylist()
        enc = chunks.column("enc_nbytes").to_pylist()
        for name, r, e in zip(cols, raw, enc):
            if name not in self._ctx or "fsst_table" not in self._ctx[name]:
                continue
            ratio = e / max(1, r)
            base = self._baseline.get(name)
            if base is None:
                self._baseline[name] = ratio
            elif ratio > base * (1 + self.retrain_slack):
                del self._ctx[name]["fsst_table"]
                del self._baseline[name]


def _lineage_schema() -> pa.Schema:
    return pa.schema([f for f in CHUNK_SCHEMA if f.name != "payload"])


def split_by_shard(batch: pa.Table, default_shard: str = "mem"):
    """Yield (shard, subtable) groups; uses the read_parquet `path` column
    when present (one group per input file), else one default group."""
    if "path" not in batch.column_names:
        yield default_shard, batch
        return
    paths = batch.column("path").to_numpy(zero_copy_only=False)
    data = batch.drop_columns(["path"])
    if len(paths) == 0:
        return
    stems = np.array([Path(p).stem for p in paths])
    change = np.nonzero(stems[1:] != stems[:-1])[0] + 1
    starts = np.concatenate(([0], change, [len(stems)]))
    for a, b in zip(starts[:-1], starts[1:]):
        yield stems[a], data.slice(int(a), int(b - a))
