"""The encode job: web-page parquet -> encoded chunk store + manifest.

Ray-Data-first: `read_parquet` (column-pruned at the source) ->
`map_batches(ChunkEncoder)` (stateless tasks; per-chunk dictionary/FSST
state lives in the chunk payloads) -> lineage records -> per-shard
manifest written by a tiny `groupby("shard").map_groups` over lineage
rows only (the data itself never shuffles in the direct path).

Modes:
- "direct" (default): input-shard-aligned, no shuffle; resume skips
  whole completed shards.
- "lang_local": skew-aware layout with ZERO shuffle — each task sorts
  its own shard by (lang, warc_ts) before chunking, so chunks are
  language-homogeneous runs and the per-run selection caches hold
  per-language FSST/dict tables. Measured at sf0.1: ratio 0.334 at
  ~1.2x direct wall time (direct 0.339, lang_salted 0.329 at ~8x) —
  most of the salted ratio win without moving any payload.
- "lang_salted" (north-rule skew handling): explicit
  `groupby(lang, salt)` shuffle before encoding, salt = hash(url) %
  salts, so hot languages (en is ~40% of rows) split into bounded
  partitions; each (lang, salt) group is a deterministic shard with
  denser per-language dictionaries/FSST tables; resumed runs re-shuffle
  but skip the encode+write work of durable partitions.
- "actor_cached": actor pool holding per-partition FSST/dict
  symbol-table state across batches (stages/encode.CachedStateEncoder).
- "sorted": global url sample-sort before encoding (front-coding case).
- "zorder": global sample-sort on a Morton key over two int-like
  columns — range predicates on EITHER column prune chunk stats
  (Z-ORDER BY clustering; single-column sort helps only its own column).

At 100 TB: lineage rows are ~1e-5 of the data volume; the manifest
groupby moves only those. Chunk files land under one directory per
shard, so a failed run resumes by skipping manifested shards.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np
import pyarrow as pa

import ray
import ray.data

# per-worker, per-language codec-selection caches for lang_salted mode
_SALTED_CACHES: dict[str, dict] = {}

from ..codecs.registry import FORMAT_VERSION as _FORMAT_VERSION
from ..stages.encode import ChunkEncoder, encode_table, lineage_of, write_chunk_file
from ..state import manifest

DEFAULT_ROWS_PER_CHUNK = 4096
DEFAULT_SALTS = 8


def _add_salt_arrow(batch: pa.Table, salt_map: dict[str, int]) -> pa.Table:
    """Append the salt column zero-copy: only the url column is hashed
    (numpy over the string values), the payload columns are untouched —
    no pandas conversion of MB-scale html anywhere near this stage.
    salt_map gives each language its salt count (proportional to its
    frequency: hot keys split into bounded partitions, rare keys stay
    whole — cold languages shredded into tiny partitions would encode
    worse, not better)."""
    from ..functions.hashing import stable_hash_strings

    urls = batch.column("url").to_numpy(zero_copy_only=False)
    langs = batch.column("lang").to_numpy(zero_copy_only=False)
    mods = np.array([salt_map.get(l, 1) for l in langs], dtype=np.uint64)
    salt = (stable_hash_strings(urls) % np.maximum(mods, 1)).astype(np.int32)
    return batch.append_column("_salt", pa.array(salt, type=pa.int32()))


def _salt_counts(
    ds, salts: int, rows_per_partition: int = 50_000
) -> dict[str, int]:
    """Per-language salt counts from a tiny count aggregation: a
    language gets ceil(count / rows_per_partition) partitions, capped at
    `salts` (the skew bound for the hottest key). Only (lang, count)
    pairs reach the driver."""
    counts = ds.groupby("lang").count().to_pandas()
    out = {}
    for lang, n in zip(counts["lang"], counts["count()"]):
        out[str(lang)] = int(min(salts, max(1, -(-int(n) // rows_per_partition))))
    return out


def encode_job(*args, **kwargs) -> dict:
    """Run the encode job; returns a summary dict (rows, bytes, seconds).

    Pipelines here are built (and executed) under a SMALL streaming
    runahead (tuning.ENCODE_RUNAHEAD): the encode kernel is memory-
    bandwidth bound and a large per-task runahead maximizes concurrent
    bus pressure — measured 0.197 s at buffer 4 vs 0.303 s at 32 on
    the sf0.1 headline. See tuning.runahead for the measurements."""
    from ..tuning import ENCODE_RUNAHEAD, runahead

    with runahead(ENCODE_RUNAHEAD):
        return _encode_job_impl(*args, **kwargs)


def _encode_job_impl(
    input_files: list[str],
    output_dir: str,
    mode: str = "direct",
    rows_per_chunk: int = DEFAULT_ROWS_PER_CHUNK,
    salts: int = DEFAULT_SALTS,
    resume: bool = True,
    concurrency: int | None = None,
    columns: list[str] | None = None,
    compression: str | None = None,
    override_num_blocks: int | None = None,
    bloom_columns: tuple[str, ...] = ("url",),
    codec_overrides: dict[str, str] | None = None,
    plan: str = "paths",
    zorder_cols: tuple[str, str] = ("warc_ts", "n_chars"),
    bucket_key: str = "url",
    num_buckets: int = 32,
) -> dict:
    t0 = time.time()
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 2)
    input_files = sorted(input_files)
    if resume:
        # refuse to mix chunk formats in one store (ADVICE r2): a store
        # written at another FORMAT_VERSION must not be extended
        manifest.check_format_version(output_dir, "resume into")
    done = manifest.completed_shards(output_dir) if resume else set()
    # job meta (incl. format_version) goes down BEFORE any chunk is
    # written so even a crashed run leaves a version-stamped store
    job_meta = {
        "mode": mode,
        "compression": compression,
        "rows_per_chunk": rows_per_chunk,
        "salts": salts,
        "input_files": len(input_files),
        "format_version": _FORMAT_VERSION,
        # persisted so rewrites (purge/compact/upsert) keep the SAME
        # bloom sidecar config — a purge must never silently drop the
        # store's point-lookup capability (ADVICE r4 #2)
        "bloom_columns": list(bloom_columns),
    }
    if mode == "bucket":
        # the co-partitioning contract: storage_partitioned_join pairs
        # two stores only when these specs agree (same bucket count,
        # same hash version, same key kind)
        from ..functions.hashing import BUCKET_HASH_VERSION, bucket_kind
        import pyarrow.parquet as _pq

        key_field = _pq.read_schema(input_files[0]).field(bucket_key)
        job_meta["bucketing"] = {
            "key": bucket_key,
            "num_buckets": int(num_buckets),
            "hash": BUCKET_HASH_VERSION,
            "kind": bucket_kind(key_field.type),
        }
    manifest.write_job_meta(output_dir, job_meta)

    if mode in ("direct", "lang_local"):
        pending = [f for f in input_files if Path(f).stem not in done]
        skipped = len(input_files) - len(pending)
        if not pending:
            return {"rows": 0, "shards_skipped": skipped, "sec": 0.0}
        # shard-aligned blocks: one task per input file, so every task
        # owns a whole shard and commits its manifest in-task (at scale,
        # shards >> cores; oversized shards still split dynamically and
        # fall back to the driver-side lineage merge)
        nblocks = override_num_blocks or len(pending)
        # stateless tasks (not an actor pool): encode state is per-chunk by
        # design, tasks schedule elastically and reuse warm workers — no
        # pool-startup serialization (measured 7.6s vs 13.7s at 32 CPUs)
        encoder = ChunkEncoder(
            output_dir=output_dir,
            rows_per_chunk=rows_per_chunk,
            skip_completed=resume,
            compression=compression,
            bloom_columns=bloom_columns,
            codec_overrides=codec_overrides,
            # lang_local: the skew-aware layout WITHOUT a shuffle — each
            # task sorts its own shard by (lang, warc_ts) before
            # chunking: language-homogeneous chunks specialize the
            # per-language FSST/dict tables AND timestamps stay
            # delta-packable ((lang, url) keys lose the ts ordering —
            # measured 0.3257 vs 0.3226 per-chunk ratio)
            local_sort=("lang", "warc_ts") if mode == "lang_local" else None,
        )
        # whole blocks as batches: each task encodes a block's worth of
        # chunk groups and packs them into ONE parquet file per shard
        # (file count tracks task count, not chunk count — at 100 TB
        # this is the difference between 10^6 and 10^8 output files)
        if plan == "paths":
            # plan from the file LIST: read_parquet's planning probes
            # every footer on the driver (~2 ms/file — minutes at 10^5
            # shards); PathPlanEncoder reads shards inside the tasks
            from ..stages.encode import PathPlanEncoder

            ds = ray.data.from_items(
                [{"path": f} for f in pending],
                override_num_blocks=max(1, min(nblocks, len(pending))),
            )
            lineage = ds.map_batches(
                PathPlanEncoder(encoder, columns=columns),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
        else:
            ds = ray.data.read_parquet(
                pending,
                columns=columns,
                include_paths=True,
                override_num_blocks=nblocks,
            )
            lineage = ds.map_batches(
                encoder,
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
    elif mode == "actor_cached":
        # actor pool with per-partition FSST/dict symbol-table state:
        # each actor trains once and reuses its tables across batches
        # (ChunkEncoder state semantics, SURVEY §2.6)
        from ..stages.encode import CachedStateEncoder

        pending = [f for f in input_files if Path(f).stem not in done]
        skipped = len(input_files) - len(pending)
        if not pending:
            return {"rows": 0, "shards_skipped": skipped, "sec": 0.0}
        nblocks = override_num_blocks or len(pending)
        pool = max(2, min(16, concurrency))
        cached_kwargs = {
            "output_dir": output_dir,
            "rows_per_chunk": rows_per_chunk,
            "skip_completed": resume,
            "compression": compression,
            "bloom_columns": bloom_columns,
            "codec_overrides": codec_overrides,
        }
        if plan == "paths":
            # same driver-footer-free planning as the direct path; each
            # ACTOR wraps its own CachedStateEncoder, so symbol-table
            # state still lives and amortizes per actor
            from ..stages.encode import PathPlanEncoder

            ds = ray.data.from_items(
                [{"path": f} for f in pending],
                override_num_blocks=max(1, min(nblocks, len(pending))),
            )
            lineage = ds.map_batches(
                PathPlanEncoder,
                fn_constructor_kwargs={
                    "encoder": CachedStateEncoder(**cached_kwargs),
                    "columns": columns,
                },
                batch_format="pyarrow",
                batch_size=None,
                concurrency=pool,
                zero_copy_batch=True,
            )
        else:
            ds = ray.data.read_parquet(
                pending,
                columns=columns,
                include_paths=True,
                override_num_blocks=nblocks,
            )
            lineage = ds.map_batches(
                CachedStateEncoder,
                fn_constructor_kwargs=cached_kwargs,
                batch_format="pyarrow",
                batch_size=None,
                concurrency=pool,
                zero_copy_batch=True,
            )
    elif mode == "sorted":
        # global sort by url before encoding (SURVEY §7.2 milestone 8):
        # one range-partitioned sample sort (the explicit wide shuffle),
        # after which DELTA_BYTE_ARRAY front-coding on url and denser
        # text locality improve the ratio
        from ..sources.pathwise import read_parquet_pathwise

        ds = read_parquet_pathwise(input_files, columns=columns)
        encoder = ChunkEncoder(
            output_dir=output_dir,
            rows_per_chunk=rows_per_chunk,
            skip_completed=False,
            compression=compression,
            bloom_columns=bloom_columns,
            default_shard="sorted",
        )
        # post-shuffle batches have no source file: name each call's
        # shard by content hash so every task commits its own manifest
        encoder.shard_per_call = True
        lineage = ds.sort("url").map_batches(
            encoder,
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
        skipped = 0
    elif mode == "zorder":
        # Z-ORDER BY clustering: one global sample sort on the Morton
        # interleave of two int-like columns, then encode. Chunk
        # [vmin, vmax] stats on BOTH columns become tight, so
        # decode_dataset_pruned range queries on either column prune —
        # the multi-column locality a single-column sort can't give.
        import pyarrow.compute as _pc

        from ..functions.hashing import morton_key
        from ..sources.pathwise import read_parquet_pathwise

        ca, cb = zorder_cols

        def _as_i64(col):
            return _pc.cast(col, pa.int64())

        # bounds pass: 32 bytes per batch reach the driver, columns
        # pruned at the read (the quantizer needs global min/max)
        def _bounds(t: pa.Table) -> pa.Table:
            va = _as_i64(t.column(ca).combine_chunks())
            vb = _as_i64(t.column(cb).combine_chunks())
            return pa.table(
                {
                    "a_min": [_pc.min(va).as_py()],
                    "a_max": [_pc.max(va).as_py()],
                    "b_min": [_pc.min(vb).as_py()],
                    "b_max": [_pc.max(vb).as_py()],
                }
            )

        bp = (
            ray.data.read_parquet(input_files, columns=[ca, cb])
            .map_batches(_bounds, batch_format="pyarrow")
            .to_pandas()
        )
        a_min, a_max = int(bp["a_min"].min()), int(bp["a_max"].max())
        b_min, b_max = int(bp["b_min"].min()), int(bp["b_max"].max())

        def _quant(v: np.ndarray, lo: int, hi: int) -> np.ndarray:
            span = hi - lo
            v = v.astype(np.int64) - lo
            if span >= (1 << 31):
                v = (v.astype(np.float64) * (((1 << 31) - 1) / span)).astype(
                    np.int64
                )
            return v

        def add_zkey(t: pa.Table) -> pa.Table:
            va = _as_i64(t.column(ca).combine_chunks()).to_numpy(
                zero_copy_only=False
            )
            vb = _as_i64(t.column(cb).combine_chunks()).to_numpy(
                zero_copy_only=False
            )
            key = morton_key(_quant(va, a_min, a_max), _quant(vb, b_min, b_max))
            return t.append_column("_zkey", pa.array(key, type=pa.int64()))

        def drop_zkey(t: pa.Table) -> pa.Table:
            return t.drop_columns(["_zkey"])

        ds = read_parquet_pathwise(input_files, columns=columns)
        encoder = ChunkEncoder(
            output_dir=output_dir,
            rows_per_chunk=rows_per_chunk,
            skip_completed=False,
            compression=compression,
            bloom_columns=bloom_columns,
            default_shard="zorder",
        )
        encoder.shard_per_call = True
        lineage = (
            ds.map_batches(add_zkey, batch_format="pyarrow")
            .sort("_zkey")
            .map_batches(drop_zkey, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(
                encoder,
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
        )
        skipped = 0
    elif mode == "bucket":
        # hash-bucketed layout (the storage-partitioned-join producer):
        # one explicit groupby shuffle on bucket = hash(key) % B, after
        # which every bucket is a deterministic shard of the store.
        # The payoff is not this job but every DOWNSTREAM equi-join on
        # the key: two co-bucketed stores join with zero shuffle forever
        # (pipelines/spj.py), amortizing one shuffle across all joins —
        # at 100 TB that trades one all-to-all now for none later.
        from ..functions.hashing import bucket_ids
        from ..sources.pathwise import read_parquet_pathwise

        ds = read_parquet_pathwise(input_files, columns=columns)
        job_epoch = t0

        def add_bucket(batch: pa.Table) -> pa.Table:
            b = bucket_ids(batch.column(bucket_key), num_buckets)
            return batch.append_column("_bucket", pa.array(b, type=pa.int32()))

        def encode_bucket(group: pa.Table) -> pa.Table:
            from ..codecs.registry import CODEC_IDS
            from ..stages.encode import (
                SUMMARY_SCHEMA,
                _COLUMN_CACHE,
                _dict_page_rows,
                _namespace_cache,
                summary_row,
            )

            bucket = group.column("_bucket")[0].as_py()
            shard = f"bucket={bucket:05d}"
            if resume and shard in manifest.completed_shards_cached(
                output_dir, job_epoch
            ):
                return pa.table(
                    {f.name: [] for f in SUMMARY_SCHEMA}, schema=SUMMARY_SCHEMA
                )
            group = group.drop_columns(["_bucket"])
            # buckets are hash-mixed (no per-bucket content skew), so one
            # per-store selection namespace serves every bucket a worker
            # encodes; other stores on the same reused worker stay invisible
            cache = _namespace_cache(_COLUMN_CACHE, f"bucket|{output_dir}")
            overrides = {
                k: CODEC_IDS[v] for k, v in (codec_overrides or {}).items()
            }
            shared: dict | None = {} if group.num_rows > rows_per_chunk else None
            groups = []
            for start in range(0, group.num_rows, rows_per_chunk):
                piece = group.slice(start, rows_per_chunk)
                groups.append(
                    encode_table(
                        piece,
                        shard,
                        codec_overrides=overrides,
                        compression=compression,
                        bloom_columns=bloom_columns,
                        cache=cache,
                        shared_dicts=shared,
                    )
                )
            if shared:
                groups.append(_dict_page_rows(shared, shard, compression))
            chunks = write_chunk_file(pa.concat_tables(groups), output_dir)
            lin = lineage_of(chunks)
            # one map_groups call owns its bucket entirely: manifest
            # committed in-task, nothing further shuffles
            manifest.record_shard_table(output_dir, shard, lin)
            return pa.Table.from_pylist(
                [summary_row(shard, lin, True)], schema=SUMMARY_SCHEMA
            )

        lineage = (
            ds.map_batches(
                add_bucket, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("_bucket")
            .map_groups(encode_bucket, batch_format="pyarrow")
        )
        skipped = 0
    elif mode == "lang_salted":
        from ..sources.pathwise import read_parquet_pathwise

        ds = read_parquet_pathwise(input_files, columns=columns)
        job_epoch = t0  # keys the workers' completed-shard cache per run

        def encode_group(group: pa.Table) -> pa.Table:
            from ..codecs.registry import CODEC_IDS
            from ..stages.encode import (
                SUMMARY_SCHEMA,
                _dict_page_rows,
                summary_row,
            )

            lang = group.column("lang")[0].as_py()
            salt = group.column("_salt")[0].as_py()
            shard = f"lang={lang}-s{salt:02d}"
            # per-language selection cache (per worker): FSST tables
            # specialize to the language whose partitions this worker
            # encodes — the point of the salted layout — instead of one
            # mixed-language table for all groups
            cache = _SALTED_CACHES.setdefault(lang, {})
            if resume and shard in manifest.completed_shards_cached(output_dir, job_epoch):
                # resumed run: the shuffle re-ran but this partition's
                # chunks are durable — skip the encode + write work
                return pa.table(
                    {f.name: [] for f in SUMMARY_SCHEMA}, schema=SUMMARY_SCHEMA
                )
            group = group.drop_columns(["_salt"])
            overrides = {
                k: CODEC_IDS[v] for k, v in (codec_overrides or {}).items()
            }
            # per-language shared dict pages: the whole (lang, salt)
            # partition lands in ONE packed file, so dict-winning string
            # columns write their accumulated per-language dictionary
            # once per file instead of once per 4096-row chunk — the
            # compression payoff that justifies the salted shuffle
            shared: dict | None = {} if group.num_rows > rows_per_chunk else None
            groups = []
            for start in range(0, group.num_rows, rows_per_chunk):
                piece = group.slice(start, rows_per_chunk)
                groups.append(
                    encode_table(
                        piece,
                        shard,
                        codec_overrides=overrides,
                        compression=compression,
                        bloom_columns=bloom_columns,
                        cache=cache,
                        shared_dicts=shared,
                    )
                )
            if shared:
                groups.append(_dict_page_rows(shared, shard, compression))
            chunks = write_chunk_file(pa.concat_tables(groups), output_dir)
            lin = lineage_of(chunks)
            # a map_groups call owns its (lang, salt) partition entirely:
            # commit the manifest here — no further shuffle needed
            manifest.record_shard_table(output_dir, shard, lin)
            return pa.Table.from_pylist(
                [summary_row(shard, lin, True)], schema=SUMMARY_SCHEMA
            )

        # adaptive salting: one tiny count-by-lang pass sizes each key's
        # partition count (hot keys split, rare keys stay whole)
        salt_map = _salt_counts(
            read_parquet_pathwise(input_files, columns=["lang"]), salts
        )
        lineage = (
            ds.map_batches(
                _add_salt_arrow,
                fn_kwargs={"salt_map": salt_map},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby(["lang", "_salt"])
            .map_groups(encode_group, batch_format="pyarrow")
        )
        skipped = 0
    else:
        raise ValueError(f"unknown mode {mode!r}")

    # Manifest commit: complete shards already wrote their manifests
    # inside the encode tasks (no shuffle); only block-split shards ride
    # back as tiny lineage blobs and are merged here. The collected
    # summary is one row per (shard, task) — metadata, ~1e-5 of data.
    summary = lineage.to_pandas()
    incomplete = summary[~summary["complete"]] if len(summary) else summary
    if len(incomplete):
        from ..stages.encode import _table_from_ipc

        for shard, grp in incomplete.groupby("shard"):
            parts = [_table_from_ipc(b) for b in grp["lineage_ipc"]]
            manifest.record_shard_table(output_dir, shard, pa.concat_tables(parts))
    sec = time.time() - t0
    return {
        "rows": int(summary["rows"].sum()) if len(summary) else 0,
        "raw_nbytes": int(summary["raw_nbytes"].sum()) if len(summary) else 0,
        "enc_nbytes": int(summary["enc_nbytes"].sum()) if len(summary) else 0,
        "shards_written": int(summary["shard"].nunique()) if len(summary) else 0,
        "shards_skipped": skipped,
        "sec": sec,
    }
