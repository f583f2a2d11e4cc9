"""The encode job: web-page parquet -> encoded chunk store + manifest.

Ray-Data-first: `read_parquet` (column-pruned at the source) ->
`map_batches(ChunkEncoder)` (stateless tasks; per-chunk dictionary/FSST
state lives in the chunk payloads) -> lineage records -> per-shard
manifest written by a tiny `groupby("shard").map_groups` over lineage
rows only (the data itself never shuffles in the direct path).

Modes:
- "direct" (default): input-shard-aligned, no shuffle; resume skips
  whole completed shards.
- "lang_salted" (north-rule skew handling): explicit
  `groupby(lang, salt)` shuffle before encoding, salt = hash(url) %
  salts, so hot languages (en is ~40% of rows) split into bounded
  partitions; each (lang, salt) group is a deterministic shard with
  denser per-language dictionaries/FSST tables; resumed runs re-shuffle
  but skip the encode+write work of durable partitions.
- "actor_cached": actor pool holding per-partition FSST/dict
  symbol-table state across batches (stages/encode.CachedStateEncoder).
- "sorted": global url sample-sort before encoding (front-coding case).

At 100 TB: lineage rows are ~1e-5 of the data volume; the manifest
groupby moves only those. Chunk files land under one directory per
shard, so a failed run resumes by skipping manifested shards.
"""

from __future__ import annotations

import time
from pathlib import Path

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..stages.encode import ChunkEncoder, encode_table, lineage_of, write_chunk_file
from ..state import manifest

DEFAULT_ROWS_PER_CHUNK = 4096
DEFAULT_SALTS = 8


def _salt_of(urls: pd.Series, salts: int):
    return (pd.util.hash_array(urls.to_numpy(dtype=object)) % salts).astype("int32")


def encode_job(
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
) -> dict:
    """Run the encode job; returns a summary dict (rows, bytes, seconds)."""
    t0 = time.time()
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) - 2)
    input_files = sorted(input_files)
    done = manifest.completed_shards(output_dir) if resume else set()

    if mode == "direct":
        pending = [f for f in input_files if Path(f).stem not in done]
        skipped = len(input_files) - len(pending)
        if not pending:
            return {"rows": 0, "shards_skipped": skipped, "sec": 0.0}
        nblocks = override_num_blocks or max(len(pending), concurrency * 2)
        ds = ray.data.read_parquet(
            pending,
            columns=columns,
            include_paths=True,
            override_num_blocks=nblocks,
        )
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
        )
        lineage = ds.map_batches(
            encoder,
            batch_format="pyarrow",
            batch_size=rows_per_chunk,
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
        nblocks = override_num_blocks or max(len(pending), concurrency * 2)
        ds = ray.data.read_parquet(
            pending, columns=columns, include_paths=True, override_num_blocks=nblocks
        )
        pool = max(2, min(16, concurrency))
        lineage = ds.map_batches(
            CachedStateEncoder,
            fn_constructor_kwargs={
                "output_dir": output_dir,
                "rows_per_chunk": rows_per_chunk,
                "skip_completed": resume,
                "compression": compression,
                "bloom_columns": bloom_columns,
                "codec_overrides": codec_overrides,
            },
            batch_format="pyarrow",
            batch_size=rows_per_chunk,
            concurrency=pool,
            zero_copy_batch=True,
        )
    elif mode == "sorted":
        # global sort by url before encoding (SURVEY §7.2 milestone 8):
        # one range-partitioned sample sort (the explicit wide shuffle),
        # after which DELTA_BYTE_ARRAY front-coding on url and denser
        # text locality improve the ratio
        ds = ray.data.read_parquet(input_files, columns=columns)
        encoder = ChunkEncoder(
            output_dir=output_dir,
            rows_per_chunk=rows_per_chunk,
            skip_completed=False,
            compression=compression,
            bloom_columns=bloom_columns,
            default_shard="sorted",
        )
        lineage = ds.sort("url").map_batches(
            encoder,
            batch_format="pyarrow",
            batch_size=rows_per_chunk,
            zero_copy_batch=True,
        )
        skipped = 0
    elif mode == "lang_salted":
        ds = ray.data.read_parquet(input_files, columns=columns)

        def add_salt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_salt"] = _salt_of(df["url"], salts)
            return df

        def encode_group(group: pa.Table) -> pa.Table:
            from ..stages.encode import _lineage_schema

            lang = group.column("lang")[0].as_py()
            salt = group.column("_salt")[0].as_py()
            shard = f"lang={lang}-s{salt:02d}"
            if resume and shard in manifest.completed_shards(output_dir):
                # resumed run: the shuffle re-ran but this partition's
                # chunks are durable — skip the encode + write work
                sch = _lineage_schema()
                return pa.table({f.name: [] for f in sch}, schema=sch)
            group = group.drop_columns(["_salt"])
            outs = []
            for start in range(0, group.num_rows, rows_per_chunk):
                piece = group.slice(start, rows_per_chunk)
                from ..codecs.registry import CODEC_IDS

                chunks = encode_table(
                    piece,
                    shard,
                    codec_overrides={
                        k: CODEC_IDS[v] for k, v in (codec_overrides or {}).items()
                    },
                    compression=compression,
                    bloom_columns=bloom_columns,
                )
                write_chunk_file(chunks, output_dir)
                outs.append(lineage_of(chunks))
            return pa.concat_tables(outs)

        lineage = (
            ds.map_batches(add_salt, batch_format="pandas")
            .groupby(["lang", "_salt"])
            .map_groups(encode_group, batch_format="pyarrow")
        )
        skipped = 0
    else:
        raise ValueError(f"unknown mode {mode!r}")

    # manifest stage: group tiny lineage rows by shard, write manifests
    def write_manifest(group: pd.DataFrame) -> pd.DataFrame:
        shard = group["shard"].iloc[0]
        manifest.record_shard(output_dir, shard, group.to_dict("records"))
        return pd.DataFrame(
            {
                "shard": [shard],
                "rows": [int(group[group.col_idx == 0]["n"].sum())],
                "raw_nbytes": [int(group["raw_nbytes"].sum())],
                "enc_nbytes": [int(group["enc_nbytes"].sum())],
            }
        )

    summary_ds = lineage.groupby("shard").map_groups(
        write_manifest, batch_format="pandas"
    )
    summary = summary_ds.to_pandas()  # tiny: one row per shard
    manifest.write_job_meta(
        output_dir,
        {
            "mode": mode,
            "compression": compression,
            "rows_per_chunk": rows_per_chunk,
            "salts": salts,
            "input_files": len(input_files),
        },
    )
    sec = time.time() - t0
    return {
        "rows": int(summary["rows"].sum()) if len(summary) else 0,
        "raw_nbytes": int(summary["raw_nbytes"].sum()) if len(summary) else 0,
        "enc_nbytes": int(summary["enc_nbytes"].sum()) if len(summary) else 0,
        "shards_written": len(summary),
        "shards_skipped": skipped,
        "sec": sec,
    }
