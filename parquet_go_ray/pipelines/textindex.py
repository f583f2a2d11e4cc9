"""Distributed inverted text index over a document corpus, stored AS an
encode-store so every store trick applies to the postings themselves.

Build: tokenize (vectorized Arrow split, per-doc distinct) ->
(token, doc_id) pairs -> ONE groupby shuffle into hash(token) % B
buckets -> each bucket task sorts its postings by (token, doc_id) and
encodes them with the ordinary chunk pipeline (token dictionary/FSST +
doc_id delta-packing — posting lists compress the way they do in real
search engines) and commits its shard manifest in-task.

Query: the bucket layout makes lookups HASH-PRUNED I/O — a query for k
tokens opens only those tokens' buckets (≤ k of B), and within a bucket
the encoded-domain membership test (stages/decode.search_chunk_table)
touches dictionary codes, decoding only chunks that contain a queried
token; chunk [vmin, vmax] stats on the sorted token column prune the
rest. AND-search is a doc_id count aggregate over the matching
postings — tiny keyed rows, never text.

Scale: the only all-to-all is the build's (token, doc_id) pair shuffle
(≈ 16 B + token bytes per posting). Queries move posting rows for the
queried tokens only. The tokenizer (split on single spaces, empties
dropped) deliberately matches the vocab_topk oracle so results stay
SQL-checkable.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

TOKENIZER = "space-split-v1"


def build_text_index(
    input_files: list[str],
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 32,
    rows_per_chunk: int = 8192,
) -> dict:
    """Build the inverted index store; returns the encode summary."""
    from ..codecs.registry import FORMAT_VERSION
    from ..functions.hashing import BUCKET_HASH_VERSION, bucket_ids
    from ..sources.pathwise import read_parquet_pathwise
    from ..stages.encode import (
        SUMMARY_SCHEMA,
        _COLUMN_CACHE,
        _namespace_cache,
        encode_table,
        lineage_of,
        summary_row,
        write_chunk_file,
    )
    from ..state import manifest

    manifest.write_job_meta(
        out_dir,
        {
            "mode": "text_index",
            "tokenizer": TOKENIZER,
            "text_col": text_col,
            "id_col": id_col,
            "format_version": FORMAT_VERSION,
            "bucketing": {
                "key": "token",
                "num_buckets": int(num_buckets),
                "hash": BUCKET_HASH_VERSION,
                "kind": "str",
            },
        },
    )

    def pairs(batch: pa.Table) -> pa.Table:
        """(token, doc_id) per DISTINCT token per doc — all Arrow
        kernels: split -> flatten with parent indices -> distinct."""
        toks = pc.split_pattern(
            batch.column(text_col).combine_chunks(), pattern=" "
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = batch.column(id_col).combine_chunks().take(parent)
        t = pa.table({"token": flat, "doc_id": ids})
        t = t.filter(pc.not_equal(t.column("token"), ""))
        t = pa.TableGroupBy(t, ["token", "doc_id"]).aggregate([])
        b = bucket_ids(t.column("token"), num_buckets)
        return t.append_column("_bucket", pa.array(b, type=pa.int32()))

    def encode_bucket(group: pa.Table) -> pa.Table:
        bucket = group.column("_bucket")[0].as_py()
        shard = f"bucket={bucket:05d}"
        group = group.drop_columns(["_bucket"]).sort_by(
            [("token", "ascending"), ("doc_id", "ascending")]
        )
        cache = _namespace_cache(_COLUMN_CACHE, f"textindex|{out_dir}")
        parts = []
        for start in range(0, group.num_rows, rows_per_chunk):
            parts.append(
                encode_table(
                    group.slice(start, rows_per_chunk),
                    shard,
                    bloom_columns=(),
                    cache=cache,
                )
            )
        chunks = write_chunk_file(pa.concat_tables(parts), out_dir)
        lin = lineage_of(chunks)
        manifest.record_shard_table(out_dir, shard, lin)
        return pa.Table.from_pylist(
            [summary_row(shard, lin, True)], schema=SUMMARY_SCHEMA
        )

    ds = read_parquet_pathwise(input_files, columns=[id_col, text_col])
    summary = (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(encode_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    return {
        "postings": int(summary["rows"].sum()),
        "buckets": int(summary["shard"].nunique()),
        "enc_nbytes": int(summary["enc_nbytes"].sum()),
    }


def _index_meta(index_dir: str) -> dict:
    from ..state import manifest

    meta = manifest.load_job_meta(index_dir) or {}
    if meta.get("mode") != "text_index":
        raise ValueError(f"{index_dir} is not a text index store")
    return meta


def lookup_postings(index_dir: str, tokens: list[str]) -> ray.data.Dataset:
    """(token, doc_id) postings for the queried tokens. I/O is pruned
    twice: only the tokens' hash buckets open at all, and inside a
    bucket the encoded-domain membership test decodes only chunks whose
    dictionary (or stats range) can contain a queried token."""
    from ..functions.hashing import bucket_ids
    from ..state import manifest
    from .spj import _bucket_files

    meta = _index_meta(index_dir)
    manifest.check_format_version(index_dir, "search")
    nb = int(meta["bucketing"]["num_buckets"])
    tokens = sorted(set(tokens))
    wanted_buckets = set(
        bucket_ids(pa.array(tokens, pa.string()), nb).tolist()
    )
    by_bucket = _bucket_files(index_dir)
    if not by_bucket:
        raise FileNotFoundError(f"no index shards under {index_dir}")
    files = sorted(
        f for b, fs in by_bucket.items() if b in wanted_buckets for f in fs
    )
    if not files:
        # every queried token hashes to a bucket no posting ever reached:
        # provably zero matches without opening anything
        return ray.data.from_arrow(
            pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        )

    def probe(batch: pa.Table) -> pa.Table:
        from ..stages.decode import search_chunk_table

        col = "path" if "path" in batch.column_names else "item"
        outs = []
        for path in batch.column(col).to_pylist():
            chunks = pq.read_table(path)
            got = search_chunk_table(chunks, "token", list(tokens))
            if got.num_rows:
                outs.append(got)
        if not outs:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    return ray.data.from_items(
        files, override_num_blocks=len(files)
    ).map_batches(probe, batch_format="pyarrow", batch_size=None)


def search_docs(
    index_dir: str, tokens: list[str], mode: str = "and"
) -> ray.data.Dataset:
    """doc_ids matching ALL (mode='and') or ANY (mode='or') tokens.
    The merge is a doc_id count aggregate over matching postings —
    keyed 8-byte rows, text never moves."""
    tokens = sorted(set(tokens))
    posts = lookup_postings(index_dir, tokens)
    if mode == "or":
        uniq = posts.groupby("doc_id").count()
        return uniq.map_batches(
            lambda t: t.select(["doc_id"]), batch_format="pyarrow"
        )
    if mode != "and":
        raise ValueError(f"unknown mode {mode!r}")
    n = len(tokens)
    counts = posts.groupby("doc_id").count()

    def keep(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("count()"), n)
        return t.filter(m).select(["doc_id"])

    return counts.map_batches(keep, batch_format="pyarrow")
