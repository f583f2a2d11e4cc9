"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (`ray.put` once, `ray.get` in each task), partial top-k
  per batch, tiny global merge. The scale path for exact search.
- LSH-bucketed near-duplicate pairs: random-hyperplane signatures ->
  groupby(bucket) -> exact cosine within buckets. The scale path for
  all-pairs similarity (avoids the O(n^2) cross join).
"""

from __future__ import annotations


import numpy as np
import pandas as pd

import ray
import ray.data

from ..util import autoscale_concurrency, quadratic_block_refs


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def brute_force_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k: returns (id, rank) — deterministic tie-break
    by id. Query is broadcast via ray.put (read once per task, never
    per batch)."""
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        # broadcast read: ray.get on a shared q_ref is a zero-copy
        # object-store lookup per task — the query matrix ships ONCE
        # per node, never per batch. Stateless task form (no actor
        # pool): elastic scheduling, no pool-startup latency — there is
        # no per-partition state to hold for an exact matmul.
        qv = ray.get(q_ref)
        m = _to_matrix(batch[vec_col])
        norms = np.linalg.norm(m, axis=1)
        cos = (m @ qv) / np.maximum(norms, 1e-12)
        order = np.lexsort((batch[id_col].to_numpy(), -cos))[:k]
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[order],
                "cos": cos[order],
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    order = np.lexsort((partials[id_col].to_numpy(), -partials["cos"].to_numpy()))[:k]
    out = partials.iloc[order].reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[[id_col, "rank"]]


def _nearest_cell(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """argmin_j ||m_i - c_j||^2 via the expansion ||c||^2 - 2 m.c^T
    (||m||^2 is row-constant and drops out of the argmin). One BLAS
    matmul with O(n*k) memory instead of the naive broadcast's
    O(n*k*dim) temporaries — the difference between megabytes and
    100+ GB per batch once the coarse quantizer has real-scale cell
    counts (thousands) over real-scale dims (768+)."""
    c2 = (c * c).sum(axis=1)
    return (c2[None, :] - 2.0 * (m @ c.T)).argmin(axis=1).astype(np.int64)


def kmeans_centroids(
    sample: np.ndarray, n_centroids: int = 16, iters: int = 8, seed: int = 13
) -> np.ndarray:
    """Deterministic seeded k-means on a driver-side sample (the IVF
    coarse quantizer). Sample is small (<= a few thousand vectors); the
    big dataset only ever sees the centroid matrix via broadcast."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    k = min(n_centroids, n)
    cent = sample[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_rows: int = 4096,
    store_dir: str | None = None,
) -> pd.DataFrame:
    """IVF approximate top-k over a raw Dataset — a convenience wrapper
    that builds (or reuses) the cluster-partitioned store and queries
    it, so there is exactly ONE IVF code path: the store. The old
    per-batch variant recomputed cell assignment over the FULL dataset
    for every query (pruned compute, not I/O); the store prunes the
    read itself, and the build cost amortizes over queries. Pass
    store_dir to keep the store for reuse; default is a throwaway under
    /tmp for one-shot calls."""
    import tempfile

    if store_dir is None:
        store_dir = tempfile.mkdtemp(prefix="ivf_store_")
    import os

    if not os.path.exists(os.path.join(store_dir, "_ivf_meta.json")):
        build_ivf_store(
            ds,
            store_dir,
            vec_col=vec_col,
            id_col=id_col,
            n_centroids=n_centroids,
            sample_rows=sample_rows,
        )
    return ivf_topk_store(store_dir, query, k=k, n_probe=n_probe)


# --------------------------------------------------------------------------
# IVF with I/O pruning: a cluster-partitioned store (one parquet shard
# per centroid cell, assigned at build time) so a query reads ONLY the
# probed cells from storage — the ANN analogue of the reference's page
# pruning via column indexes (search.go:6-116). The per-batch ivf_topk
# above prunes compute only; this prunes the read itself.


def _clear_cell_files(out) -> None:
    """A (re)build REPLACES the store: drop every prior `cell=*` shard
    plus append markers and compaction intents. Salting makes shard
    names layout-dependent (`cell=0003+s001` one build, `cell=0003`
    the next), and appends add `+g` generations — without this sweep a
    rebuild into the same dir leaves stale files that the probe glob
    `cell=NNNN*.parquet` would read alongside the new ones (duplicate
    and deleted vectors in top-k)."""
    for p in (
        list(out.glob("cell=*"))
        + list(out.glob("_gen-*.applied"))
        + list(out.glob("_gens.json"))
    ):
        p.unlink()


def build_ivf_store(
    ds: ray.data.Dataset,
    store_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    sample_rows: int = 4096,
    seed: int = 13,
    target_cell_rows: int = 1_000_000,
) -> dict:
    """Partition the embedding table by nearest centroid into parquet
    shards, one per (cell, salt) (atomic tmp+rename; a map_groups call
    owns its whole shard). Centroids are trained on a driver-side
    sample and broadcast once; only (cell, salt, rows) summary rows
    return to the driver.

    Hot cells SALT at write time: a driver-side per-cell count (one
    n_centroids-int partial per batch, no extra shuffle) sizes each
    cell at ceil(rows / target_cell_rows) salt files, and rows spread
    across a cell's salts by a deterministic id hash. A skewed
    centroid — the common case on real embeddings, where one cell can
    hold 10-100x the mean — therefore becomes ceil-many bounded write
    tasks instead of one task materializing the whole cell. Salted
    shards are named `cell={c:04d}+s{salt:03d}.parquet`; the probe
    path globs `cell={c:04d}*.parquet`, so salted and unsalted layouts
    read identically."""
    import json
    import os
    from pathlib import Path

    sample = _to_matrix(ds.limit(sample_rows).to_pandas()[vec_col])
    cent = kmeans_centroids(sample, n_centroids, seed=seed)
    cent_ref = ray.put(cent)
    out = Path(store_dir)
    out.mkdir(parents=True, exist_ok=True)
    _clear_cell_files(out)  # rebuild REPLACES the store (see helper)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        m = _to_matrix(batch[vec_col])
        batch = batch.copy()
        batch["_cell"] = _nearest_cell(m, c)
        return batch

    # cell assignment is the expensive pass (a distance matmul per
    # batch) — pin it once in the (spillable) object store rather than
    # recomputing it for the count and again for the write
    assigned = ds.map_batches(assign, batch_format="pandas").materialize()

    def cell_counts(batch: pd.DataFrame) -> pd.DataFrame:
        n = np.bincount(
            batch["_cell"].to_numpy(), minlength=len(cent)
        ).astype(np.int64)
        return pd.DataFrame({"cell": np.arange(len(cent)), "n": n})

    counts_df = assigned.map_batches(
        cell_counts, batch_format="pandas"
    ).to_pandas()
    counts = np.zeros(len(cent), dtype=np.int64)
    np.add.at(counts, counts_df["cell"].to_numpy(), counts_df["n"].to_numpy())
    salts = np.maximum(
        1, -(-counts // max(1, int(target_cell_rows)))
    ).astype(np.int64)
    max_salt = int(salts.max())
    salts_ref = ray.put(salts)

    def add_salt(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(salts_ref)
        cells = batch["_cell"].to_numpy()
        # deterministic spread within a cell: splitmix-style id hash,
        # layout-independent (same row -> same salt on any run)
        h = pd.util.hash_pandas_object(batch[id_col], index=False).to_numpy()
        batch = batch.copy()
        batch["_shard"] = cells * max_salt + (
            h % s[cells].astype(np.uint64)
        ).astype(np.int64)
        return batch.drop(columns=["_cell"])

    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        import pyarrow as pa

        shard = int(group["_shard"].iloc[0])
        cell, salt = shard // max_salt, shard % max_salt
        name = (
            f"cell={cell:04d}+s{salt:03d}.parquet"
            if int(ray.get(salts_ref)[cell]) > 1
            else f"cell={cell:04d}.parquet"
        )
        path = out / name
        tmp = str(path) + f".tmp{os.getpid()}"
        pq.write_table(
            pa.Table.from_pandas(
                group.drop(columns=["_shard"]), preserve_index=False
            ),
            tmp,
        )
        os.replace(tmp, path)
        return pd.DataFrame({"cell": [cell], "rows": [len(group)]})

    summary = (
        assigned.map_batches(add_salt, batch_format="pandas")
        .groupby("_shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    rows_per_cell = summary.groupby("cell")["rows"].sum()
    files_per_cell = summary.groupby("cell")["rows"].size()
    meta = {
        "centroids": cent.tolist(),
        "n_centroids": int(len(cent)),
        "cells": {int(c): int(r) for c, r in rows_per_cell.items()},
        "files_per_cell": {int(c): int(k) for c, k in files_per_cell.items()},
        "vec_col": vec_col,
        "id_col": id_col,
    }
    tmpm = out / "._ivf_meta.json.tmp"
    tmpm.write_text(json.dumps(meta))
    os.replace(tmpm, out / "_ivf_meta.json")
    return {
        "cells": int(rows_per_cell.size),
        "files": int(len(summary)),
        "rows": int(summary["rows"].sum()),
    }


def ivf_probe_cells(store_dir: str, query: np.ndarray, n_probe: int) -> list[int]:
    """The n_probe nearest centroid cells for a query (driver-side: the
    centroid matrix is tiny metadata)."""
    import json
    from pathlib import Path

    meta = json.loads((Path(store_dir) / "_ivf_meta.json").read_text())
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    order = np.argsort(((cent - q[None, :]) ** 2).sum(axis=1))
    return [int(c) for c in order[:n_probe]]


def ivf_topk_store(
    store_dir: str,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> pd.DataFrame:
    """IVF top-k over a cluster-partitioned store: only the probed
    cells' shard files are ever opened (assert-able: chmod the rest to
    0 and this still runs). Returns (id, rank, cos)."""
    import json
    from pathlib import Path

    meta = json.loads((Path(store_dir) / "_ivf_meta.json").read_text())
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cells = ivf_probe_cells(store_dir, query, n_probe)
    files = [
        str(p)
        for c in cells
        for p in sorted(Path(store_dir).glob(f"cell={c:04d}*.parquet"))
    ]
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    if not files:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64"),
             "cos": pd.Series([], dtype="float64")}
        )
    q_ref = ray.put(q)
    ds = ray.data.read_parquet(files, columns=[id_col, vec_col])

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        m = _to_matrix(batch[vec_col])
        cos = (m @ qv) / np.maximum(np.linalg.norm(m, axis=1), 1e-12)
        order = np.lexsort((batch[id_col].to_numpy(), -cos))[:k]
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy()[order], "cos": cos[order]}
        )

    partials = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    order = np.lexsort((partials[id_col].to_numpy(), -partials["cos"].to_numpy()))[:k]
    out = partials.iloc[order].reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[[id_col, "rank", "cos"]]


def lsh_near_pairs(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    cos_threshold: float = 0.9,
    seed: int = 5,
    dim: int | None = None,
    n_vecs_hint: int | None = None,
    n_bands: int = 1,
) -> ray.data.Dataset:
    """Near-duplicate embedding pairs via random-hyperplane LSH buckets.

    Same shuffle discipline as the text MinHash path (round-2 verdict
    #4): only (bucket, id) rows ride the groupby — 16 bytes/row, never
    the embedding payload — buckets are hash-partitioned with a
    size-targeted partition count, a degenerate bucket (e.g. near-zero
    vectors all hashing to one key) is capped at MAX_BUCKET instead of
    exploding into O(b^2) pairs and an O(b^2) cosine matrix in one task,
    and vectors are attached only to SURVIVING candidate pairs by the
    distributed pair join before the exact-cosine verify.

    `n_bands` > 1 turns on OR-amplification exactly like the MinHash
    band structure: `n_bands` independent sets of `n_planes` hyperplanes
    each emit a (band-qualified bucket, id) row, so a pair is a
    candidate if it collides in ANY band — recall for a pair at cosine c
    is 1-(1-p^r)^b with p = 1 - arccos(c)/pi, r = n_planes, b = n_bands.
    Cross-band duplicates of the same pair collapse in the pair join
    (no extra shuffle). Shuffle volume scales linearly with n_bands but
    stays (bucket, id)-only."""
    from .dedup import MAX_BUCKET, _attach_pair_values, _n_partitions

    # hyperplanes are minted ONCE on the driver and broadcast via
    # ray.put — regenerating them per batch was per-batch state setup
    # (cheap here, but the pattern is wrong at scale). The embedding
    # dim comes from the caller or a one-row peek (streaming partial
    # execution, not a full read).
    if dim is None:
        peek = ds.take_batch(1, batch_format="pandas")
        dim = int(np.asarray(peek[vec_col].iloc[0]).shape[0])
    if n_planes + max(n_bands - 1, 0).bit_length() > 62:
        raise ValueError(
            "n_planes + log2(n_bands) must be <= 62 so (band << n_planes)"
            f" | bucket fits an int64 key: got {n_planes} x {n_bands}"
        )
    planes_ref = ray.put(
        np.random.default_rng(seed).standard_normal(
            (dim, n_planes * n_bands)
        )
    )

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(batch[vec_col])
        planes = ray.get(planes_ref)
        # (n, n_bands * n_planes) sign bits -> per-band integer buckets,
        # band index packed into the key's high bits
        bits = (m @ planes) > 0
        weights = (1 << np.arange(n_planes - 1, -1, -1, dtype=np.int64))
        codes = bits.reshape(len(m), n_bands, n_planes) @ weights
        band_tag = (
            np.arange(n_bands, dtype=np.int64) << np.int64(n_planes)
        )
        bucket = (codes + band_tag[None, :]).reshape(-1)
        return pd.DataFrame(
            {
                "bucket": bucket,
                id_col: np.repeat(batch[id_col].to_numpy(), n_bands),
            }
        )

    P = _n_partitions(n_vecs_hint, 1)

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        b = df["bucket"].to_numpy().view(np.uint64)
        df["pt"] = ((b * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(P)).astype(
            np.int64
        )
        return df

    _empty_cand = {"id_a": "int64", "id_b": "int64"}

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _b, group in part.groupby("bucket", sort=False):
            n = len(group)
            if n < 2 or n > MAX_BUCKET:
                continue
            ids = np.sort(group[id_col].to_numpy())
            ia, ib = np.triu_indices(n, k=1)
            outs.append(
                pd.DataFrame(
                    {"id_a": ids[ia].astype(np.int64), "id_b": ids[ib].astype(np.int64)}
                )
            )
        if not outs:
            return pd.DataFrame({k: [] for k in _empty_cand}).astype(_empty_cand)
        return pd.concat(outs).drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)

    cand = (
        ds.map_batches(bucketize, batch_format="pandas")
        .map_batches(add_part, batch_format="pandas")
        .groupby("pt")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def vec_values(sel: pd.DataFrame):
        m = _to_matrix(sel[vec_col])
        return [row.tobytes() for row in m]

    paired = _attach_pair_values(cand, ds, vec_values, vec_col, id_col)

    _empty_out = {"id_a": "int64", "id_b": "int64", "cos": "float64"}

    def exact_cos(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({k: [] for k in _empty_out}).astype(_empty_out)
        va = np.frombuffer(b"".join(batch["val_a"]), dtype=np.float64).reshape(
            len(batch), -1
        )
        vb = np.frombuffer(b"".join(batch["val_b"]), dtype=np.float64).reshape(
            len(batch), -1
        )
        na = np.maximum(np.linalg.norm(va, axis=1), 1e-12)
        nb = np.maximum(np.linalg.norm(vb, axis=1), 1e-12)
        cos = (va * vb).sum(axis=1) / (na * nb)
        keep = cos >= cos_threshold
        return pd.DataFrame(
            {
                "id_a": batch["id_a"].to_numpy()[keep].astype(np.int64),
                "id_b": batch["id_b"].to_numpy()[keep].astype(np.int64),
                "cos": np.round(cos[keep], 4),
            }
        )

    return paired.map_batches(exact_cos, batch_format="pandas")


def cosine_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rows_per_block: int = 8192,
    max_block_pairs: int = 20_000,
) -> ray.data.Dataset:
    """EXACT all-pairs cosine similarity >= threshold, as (id_a < id_b)
    rows. The SQL-oracle-able companion to `lsh_near_pairs` (which is
    the sub-quadratic 100-TB path): embedding-cosine near-duplicate
    detection with no approximation.

    Shape: blocked outer product. The (id, vec) projection is
    checkpointed into ~rows_per_block Arrow blocks pinned in the
    (spillable) object store; one Ray task per unordered block pair
    (B(B+1)/2 tasks) pulls its two blocks zero-copy, row-normalizes in
    float64, and emits the above-threshold cells of one (b x b) matmul.
    Nothing ever lands on the driver — results come back as
    object-store refs and re-enter a Dataset via from_arrow_refs. The
    quadratic task count is intrinsic to EXACT all-pairs; this form is
    for corpora small enough that n^2/2 block matmuls are acceptable
    (verification sets, per-cluster refinement inside SemDeDup-style
    dedup); LSH/IVF prune candidates for the full corpus.

    max_block_pairs bounds the quadratic fan-out: above it the call
    REFUSES (before launching any pair task) rather than silently
    scheduling millions of matmuls — route the full corpus through
    lsh_near_pairs / build_ivf_store and reserve this for the pruned
    candidate sets."""
    import pyarrow as pa

    # materialize FIRST (count() on a computed lineage would execute it
    # once just for the row count, then again for the repartition);
    # count/num_blocks on materialized blocks are metadata-only
    mat = ds.select_columns([id_col, vec_col]).materialize()
    refs = quadratic_block_refs(
        mat,
        mat.count(),
        rows_per_block,
        max_block_pairs,
        "cosine_pairs",
        "This quadratic form is for pruned candidate sets; use "
        "similarity.lsh_near_pairs or an IVF store "
        "(build_ivf_store + topk) for the full corpus, or raise "
        "max_block_pairs explicitly if the cost is intended.",
    )

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        # repartition can emit 0-row blocks with an EMPTY schema —
        # bail before touching columns by name
        if ta.num_rows == 0 or tb.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                }
            )
        ids_a = ta.column(id_col).to_numpy().astype(np.int64)
        ids_b = tb.column(id_col).to_numpy().astype(np.int64)
        A = _to_matrix(ta.column(vec_col).to_pylist())
        A = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        if same:
            B = A
        else:
            B = _to_matrix(tb.column(vec_col).to_pylist())
            B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        C = A @ B.T
        ia, ib = np.nonzero(C >= threshold)
        if same:
            # each unordered pair appears twice in A x A — keep one
            # POSITION orientation; ids then still need min/max below,
            # because a block coalesced from a parallel read is NOT
            # guaranteed id-sorted (read-completion order is baked into
            # the block layout — this bit in the gate once)
            keep = ia < ib
            ia, ib = ia[keep], ib[keep]
        x, y = ids_a[ia], ids_b[ib]
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        order = np.lexsort((hi, lo))
        return pa.table({"id_a": lo[order], "id_b": hi[order]})

    out_refs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            out_refs.append(block_pair.remote(refs[i], refs[j], i == j))
    return ray.data.from_arrow_refs(out_refs)


def semantic_dedupe(
    ds: ray.data.Dataset,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate REMOVAL (SemDeDup-flavored, but
    exact): drop every vector whose cosine to ANY smaller-id vector
    meets the threshold; return the kept ids. Deterministic,
    SQL-expressible semantics (NOT the sequential leader heuristic —
    a doc is dropped based on raw pairs, so the kept set is exactly
    {v : no u < v with cos(u,v) >= t}).

    Pairs come from the exact blocked product; the removal is the same
    id-only distributed anti-join the text dedup chain uses (8 B/row
    shuffle, no driver keep-set)."""
    from .dedup import anti_join_ids

    pairs = cosine_pairs(ds, threshold, vec_col, id_col)

    def drop_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df["id_b"].to_numpy().astype(np.int64)})

    drops = pairs.map_batches(drop_side, batch_format="pandas")
    return anti_join_ids(ds.select_columns([id_col]), drops, id_col)


def hash_embed(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    k: int = 3,
    seed: int = 17,
) -> ray.data.Dataset:
    """Text -> deterministic hashing-trick embeddings (map-only, zero
    shuffle): (id, embedding list<double>, unit norm). The model-free
    featurizer that lets every embedding operator (cosine_pairs,
    semantic_dedupe, lsh_near_pairs, IVF stores) run on raw text with
    no external model; swap in a learned encoder by replacing this one
    stage with an actor-pool map_batches of the same signature."""
    import pandas as pd

    from ..functions.hashing import hash_embeddings

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        m = hash_embeddings(
            [t.encode() for t in df[text_col]], dim=dim, k=k, seed=seed
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy().astype(np.int64),
                "embedding": list(m),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def text_semantic_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    rows_per_block: int = 256,
) -> ray.data.Dataset:
    """Raw text -> hash embeddings -> exact blocked cosine pairs: the
    complete semantic near-dup pipeline with no model dependency. At
    corpus scale swap cosine_pairs for lsh_near_pairs (the embed stage
    is identical)."""
    emb = hash_embed(ds, text_col=text_col, id_col=id_col, dim=dim)

    def rename(df):
        return df.rename(columns={id_col: "vec_id"})

    emb = emb.map_batches(rename, batch_format="pandas")
    return cosine_pairs(
        emb, threshold=threshold, rows_per_block=rows_per_block
    )


# --------------------------------------------------------------------------
# Product quantization: the lossy EMBEDDING codec of the engine's
# codec family. Where the chunk codecs (codecs/*.py) compress columns
# losslessly, PQ compresses a list<float> column 32-64x (dim float32 ->
# n_sub uint8 codes) and searches in the COMPRESSED domain via
# asymmetric-distance lookup tables, refining only a small candidate
# set against the raw vectors. This is the scale path for top-k over
# embeddings too large to matmul: the ADC scan touches n_sub bytes per
# row instead of dim*4, and the exact rerank reads only `rerank` rows.


def train_pq_codebooks(
    sample: np.ndarray,
    n_sub: int = 8,
    n_centroids: int = 256,
    iters: int = 8,
    seed: int = 13,
) -> list[np.ndarray]:
    """Per-subspace k-means codebooks trained on a driver-side sample
    (bounded, like the IVF coarse quantizer). Vectors are unit-
    normalized BEFORE the subspace split so inner product over code
    reconstructions approximates cosine. Returns n_sub (k, dim/n_sub)
    matrices; k = min(n_centroids, sample rows)."""
    if sample.shape[1] % n_sub:
        raise ValueError(
            f"dim {sample.shape[1]} not divisible by n_sub {n_sub}"
        )
    dsub = sample.shape[1] // n_sub
    norms = np.linalg.norm(sample, axis=1)
    sample = sample / np.maximum(norms, 1e-12)[:, None]
    return [
        kmeans_centroids(
            np.ascontiguousarray(sample[:, j * dsub : (j + 1) * dsub]),
            n_centroids,
            iters=iters,
            seed=seed + j,
        )
        for j in range(n_sub)
    ]


class PQEncoder:
    """Actor-pool encode stage: codebooks + their squared norms load
    once per actor in __init__ (ray.get of the broadcast ref is a
    zero-copy object-store read), each __call__ assigns one batch via
    the ||x||^2 - 2x.c + ||c||^2 identity (one matmul per subspace,
    no per-row Python). Emits (id, code) with code = n_sub uint8
    bytes."""

    def __init__(self, books_ref, vec_col: str, id_col: str):
        self.books = ray.get(books_ref)
        self.cnorm2 = [(b * b).sum(axis=1) for b in self.books]
        self.vec_col, self.id_col = vec_col, id_col

    def _matrix(self, batch: pd.DataFrame) -> np.ndarray:
        m = _to_matrix(batch[self.vec_col])
        return m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]

    def _encode(self, batch: pd.DataFrame, m: np.ndarray) -> pd.DataFrame:
        n_sub = len(self.books)
        dsub = m.shape[1] // n_sub
        codes = np.empty((len(m), n_sub), dtype=np.uint8)
        for j, book in enumerate(self.books):
            x = m[:, j * dsub : (j + 1) * dsub]
            # argmin ||x-c||^2 == argmin (||c||^2 - 2 x.c); ||x||^2 is
            # constant per row
            codes[:, j] = (self.cnorm2[j] - 2.0 * (x @ book.T)).argmin(
                axis=1
            )
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy().astype(np.int64),
                "code": [c.tobytes() for c in codes],
            }
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return self._encode(batch, self._matrix(batch))


class _CellAssignEncoder(PQEncoder):
    """One actor-pool pass does both quantizers: coarse cell assignment
    (for the shard) + PQ code (for the payload). Centroids load once
    per actor; the normalized matrix is built ONCE per batch and shared
    by both quantizers. Used by build_ivfpq_store and ivfpq_append so
    build and append can never drift in how they assign cells."""

    def __init__(self, books_ref, vec_col: str, id_col: str, cent_ref):
        super().__init__(books_ref, vec_col, id_col)
        self.cent = ray.get(cent_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = self._matrix(batch)
        coded = self._encode(batch, m)
        coded["_cell"] = _nearest_cell(m, self.cent)
        return coded


def pq_encode(
    ds: ray.data.Dataset,
    books_ref,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: tuple[int, int] | int | None = None,
) -> ray.data.Dataset:
    """Encode an embedding column to PQ codes: (id, code binary).
    The pool autoscales below session CPUs by default — a fixed pool
    == session CPUs starves its own read tasks and deadlocks."""
    return ds.map_batches(
        PQEncoder,
        fn_constructor_args=(books_ref, vec_col, id_col),
        batch_format="pandas",
        concurrency=concurrency or autoscale_concurrency(),
    )


def pq_topk(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_sub: int = 8,
    n_centroids: int = 256,
    rerank: int = 100,
    sample_rows: int = 4096,
    seed: int = 13,
) -> pd.DataFrame:
    """Approximate cosine top-k via PQ: train (driver sample) ->
    encode (actor pool) -> ADC scan over codes (map-only: per batch
    one LUT gather + row sum, partial top-`rerank`) -> exact rerank of
    the candidate ids against the raw vectors. With rerank >= corpus
    size this degrades gracefully to exact brute force; at scale the
    raw table is read twice but matmul'd only on `rerank` rows.
    Returns (id, rank), ties broken by id like brute_force_topk."""
    sample = _to_matrix(ds.limit(sample_rows).to_pandas()[vec_col])
    books = train_pq_codebooks(
        sample, n_sub=n_sub, n_centroids=n_centroids, seed=seed
    )
    books_ref = ray.put(books)
    codes = pq_encode(ds, books_ref, vec_col=vec_col, id_col=id_col)

    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    dsub = len(q) // n_sub
    # LUT[j, c] = q_j . book[j][c]: ADC score = sum_j LUT[j, code_j]
    # approximates cosine(q, x) for unit-normalized x. Ragged books
    # (sample < n_centroids) pad with -inf so padded codes never win.
    kmax = max(len(b) for b in books)
    lut = np.full((n_sub, kmax), -np.inf)
    for j, book in enumerate(books):
        lut[j, : len(book)] = book @ q[j * dsub : (j + 1) * dsub]
    lut_ref = ray.put(lut)
    r = max(k, rerank)

    def adc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(lut_ref)
        c = np.frombuffer(
            b"".join(batch["code"]), dtype=np.uint8
        ).reshape(len(batch), -1)
        score = t[np.arange(c.shape[1])[None, :], c].sum(axis=1)
        order = np.lexsort((batch[id_col].to_numpy(), -score))[:r]
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[order],
                "adc": score[order],
            }
        )

    partials = codes.map_batches(adc_partial, batch_format="pandas").to_pandas()
    order = np.lexsort(
        (partials[id_col].to_numpy(), -partials["adc"].to_numpy())
    )[:r]
    cand = np.sort(partials[id_col].to_numpy()[order])
    cand_ref = ray.put(cand)

    def exact_on_cands(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy().astype(np.int64)
        keep = np.isin(ids, ray.get(cand_ref))
        if not keep.any():
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "cos": pd.Series([], dtype="float64")}
            )
        sel = batch.loc[keep]
        qv = np.asarray(query, dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        m = _to_matrix(sel[vec_col])
        cos = (m @ qv) / np.maximum(np.linalg.norm(m, axis=1), 1e-12)
        return pd.DataFrame(
            {id_col: sel[id_col].to_numpy().astype(np.int64), "cos": cos}
        )

    exact = ds.map_batches(exact_on_cands, batch_format="pandas").to_pandas()
    order = np.lexsort((exact[id_col].to_numpy(), -exact["cos"].to_numpy()))[:k]
    out = exact.iloc[order].reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[[id_col, "rank"]]


# --------------------------------------------------------------------------
# IVFPQ: the two pruning axes composed. The store holds per-CELL
# shards of PQ CODES only (n_sub bytes + an 8 B id per vector — the
# whole ANN index is ~1/32 the raw column), a probe opens only the
# probed cells' code shards (I/O pruning, like the IVF store), ranks
# them in the compressed domain (ADC), and re-scores only the top
# `rerank` candidates against the raw table. At 100 TB the raw
# embedding column never moves: build reads it once, search reads
# code shards + `rerank` raw rows.


def build_ivfpq_store(
    ds: ray.data.Dataset,
    store_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_sub: int = 8,
    pq_centroids: int = 256,
    sample_rows: int = 4096,
    seed: int = 13,
    target_cell_rows: int = 20_000_000,
) -> dict:
    """Partition PQ codes by nearest coarse centroid into parquet
    shards, one per (cell, salt) (atomic tmp+rename, a map_groups task
    owns its shard). Coarse centroids and PQ codebooks train on one
    driver-side sample and broadcast once; shards carry (id, code)
    only. Hot cells salt at write time exactly like build_ivf_store
    (code rows are ~16 B, so the default salt threshold is higher):
    the probe path globs `cell={c:04d}*`, so salted and unsalted
    layouts read identically."""
    import json
    import os
    from pathlib import Path

    sample = _to_matrix(ds.limit(sample_rows).to_pandas()[vec_col])
    # the whole index lives on the unit sphere (assignment, codes and
    # the query all normalize), so the coarse quantizer must train
    # there too
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1), 1e-12
    )[:, None]
    cent = kmeans_centroids(sample, n_centroids, seed=seed)
    books = train_pq_codebooks(
        sample, n_sub=n_sub, n_centroids=pq_centroids, seed=seed
    )
    cent_ref, books_ref = ray.put(cent), ray.put(books)
    out = Path(store_dir)
    out.mkdir(parents=True, exist_ok=True)
    _clear_cell_files(out)  # rebuild REPLACES the store (see helper)

    # the two-quantizer pass is the expensive one — pin it once in the
    # (spillable) object store for the count pass and the write pass
    coded = ds.map_batches(
        _CellAssignEncoder,
        fn_constructor_args=(books_ref, vec_col, id_col, cent_ref),
        batch_format="pandas",
        concurrency=autoscale_concurrency(),
    ).materialize()

    def cell_counts(batch: pd.DataFrame) -> pd.DataFrame:
        n = np.bincount(
            batch["_cell"].to_numpy(), minlength=len(cent)
        ).astype(np.int64)
        return pd.DataFrame({"cell": np.arange(len(cent)), "n": n})

    counts_df = coded.map_batches(
        cell_counts, batch_format="pandas"
    ).to_pandas()
    counts = np.zeros(len(cent), dtype=np.int64)
    np.add.at(counts, counts_df["cell"].to_numpy(), counts_df["n"].to_numpy())
    salts = np.maximum(
        1, -(-counts // max(1, int(target_cell_rows)))
    ).astype(np.int64)
    max_salt = int(salts.max())
    salts_ref = ray.put(salts)

    def add_salt(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(salts_ref)
        cells = batch["_cell"].to_numpy()
        h = pd.util.hash_pandas_object(batch[id_col], index=False).to_numpy()
        batch = batch.copy()
        batch["_shard"] = cells * max_salt + (
            h % s[cells].astype(np.uint64)
        ).astype(np.int64)
        return batch.drop(columns=["_cell"])

    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        shard = int(group["_shard"].iloc[0])
        cell, salt = shard // max_salt, shard % max_salt
        name = (
            f"cell={cell:04d}+s{salt:03d}.parquet"
            if int(ray.get(salts_ref)[cell]) > 1
            else f"cell={cell:04d}.parquet"
        )
        path = out / name
        tmp = str(path) + f".tmp{os.getpid()}"
        pq.write_table(
            pa.Table.from_pandas(
                group.drop(columns=["_shard"]), preserve_index=False
            ),
            tmp,
        )
        os.replace(tmp, path)
        return pd.DataFrame({"cell": [cell], "rows": [len(group)]})

    summary = (
        coded.map_batches(add_salt, batch_format="pandas")
        .groupby("_shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    rows_per_cell = summary.groupby("cell")["rows"].sum()
    meta = {
        "centroids": cent.tolist(),
        "books": [b.tolist() for b in books],
        "n_sub": n_sub,
        "cells": {int(c): int(r) for c, r in rows_per_cell.items()},
        "vec_col": vec_col,
        "id_col": id_col,
    }
    tmpm = out / "._ivfpq_meta.json.tmp"
    tmpm.write_text(json.dumps(meta))
    os.replace(tmpm, out / "_ivfpq_meta.json")
    return {
        "cells": int(rows_per_cell.size),
        "files": int(len(summary)),
        "rows": int(summary["rows"].sum()),
    }


def ivfpq_topk_store(
    store_dir: str,
    raw_ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 100,
) -> pd.DataFrame:
    """IVFPQ search: probe cells (driver-side centroid argsort), read
    ONLY those cells' code shards, ADC-rank in the compressed domain,
    exact-rerank the top `rerank` ids against `raw_ds` (the raw table
    the store was built from). Returns (id, rank)."""
    import json
    from pathlib import Path

    meta = json.loads((Path(store_dir) / "_ivfpq_meta.json").read_text())
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    books = [np.asarray(b, dtype=np.float64) for b in meta["books"]]
    n_sub = int(meta["n_sub"])
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(((cent - q[None, :]) ** 2).sum(axis=1))
    cells = [int(c) for c in order[:n_probe]]
    files = [
        str(p)
        for c in cells
        for p in sorted(Path(store_dir).glob(f"cell={c:04d}*.parquet"))
    ]
    if not files:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64")}
        )
    dsub = len(q) // n_sub
    kmax = max(len(b) for b in books)
    lut = np.full((n_sub, kmax), -np.inf)
    for j, book in enumerate(books):
        lut[j, : len(book)] = book @ q[j * dsub : (j + 1) * dsub]
    lut_ref = ray.put(lut)
    r = max(k, rerank)
    codes = ray.data.read_parquet(files, columns=[id_col, "code"])

    def adc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(lut_ref)
        c = np.frombuffer(
            b"".join(batch["code"]), dtype=np.uint8
        ).reshape(len(batch), -1)
        score = t[np.arange(c.shape[1])[None, :], c].sum(axis=1)
        order = np.lexsort((batch[id_col].to_numpy(), -score))[:r]
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy()[order], "adc": score[order]}
        )

    partials = codes.map_batches(adc_partial, batch_format="pandas").to_pandas()
    order = np.lexsort(
        (partials[id_col].to_numpy(), -partials["adc"].to_numpy())
    )[:r]
    cand_ref = ray.put(np.sort(partials[id_col].to_numpy()[order]))

    def exact_on_cands(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy().astype(np.int64)
        keep = np.isin(ids, ray.get(cand_ref))
        if not keep.any():
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "cos": pd.Series([], dtype="float64")}
            )
        sel = batch.loc[keep]
        m = _to_matrix(sel[vec_col])
        qv = np.asarray(query, dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        cos = (m @ qv) / np.maximum(np.linalg.norm(m, axis=1), 1e-12)
        return pd.DataFrame(
            {id_col: sel[id_col].to_numpy().astype(np.int64), "cos": cos}
        )

    exact = raw_ds.map_batches(
        exact_on_cands, batch_format="pandas"
    ).to_pandas()
    order = np.lexsort((exact[id_col].to_numpy(), -exact["cos"].to_numpy()))[:k]
    out = exact.iloc[order].reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[[id_col, "rank"]]


def _gen_of(name: str) -> str | None:
    """Extract the generation hex from a `cell=NNNN+g<hex>.parquet`
    name (None for base/salted shards)."""
    stem = name.split(".")[0]
    for part in stem.split("+")[1:]:
        if part.startswith("g"):
            return part[1:]
    return None


def _applied_gens(root) -> set[str]:
    """The store's applied-generation ledger: marker files (one per
    recent append/fold commit) plus the consolidated `_gens.json` that
    ivfpq_compact folds markers into so an append stream doesn't grow
    the directory without bound."""
    import json

    gens = {
        p.name[len("_gen-") : -len(".applied")]
        for p in root.glob("_gen-*.applied")
    }
    ledger = root / "_gens.json"
    if ledger.exists():
        try:
            gens |= set(json.loads(ledger.read_text()))
        except ValueError:
            pass  # mid-rewrite: markers still cover the recent gens
    return gens


def _ivfpq_recover(store_dir: str, min_age_s: float = 120.0) -> None:
    """Finish or roll back an interrupted compaction. An intent file
    `cell=NNNN.members.json` whose target generation file exists means
    the merge COMMITTED: finishing it (guarded member unlinks + the
    target's applied marker) is safe at ANY age — a still-live fold
    performs exactly the same idempotent steps. An intent whose target
    is missing means the fold didn't commit; rolling it back (dropping
    the intent, members untouched) is age-gated by `min_age_s` so an
    append on the same store never rolls back a live fold that is
    still writing its target."""
    import json
    import time
    from pathlib import Path

    now = time.time()
    root = Path(store_dir)
    for intent in root.glob("*.members.json"):
        try:
            age = now - intent.stat().st_mtime
            rec = json.loads(intent.read_text())
        except (OSError, ValueError):
            continue  # vanished mid-scan or mid-write: not ours to reap
        target = root / rec["target"]
        if target.exists():
            for m in rec["members"]:
                p = root / m
                if p.exists():
                    p.unlink()
            g = _gen_of(rec["target"])
            if g:
                (root / f"_gen-{g}.applied").touch()
            intent.unlink(missing_ok=True)
        elif age >= min_age_s:
            intent.unlink(missing_ok=True)


def ivfpq_append(
    store_dir: str,
    ds: ray.data.Dataset,
    generation: str | None = None,
) -> dict:
    """Incremental IVFPQ maintenance: encode NEW vectors with the
    store's FROZEN quantizers (centroids + codebooks from the meta —
    appends never retrain, the drift boundary is an explicit rebuild)
    and land them as one generation file per touched cell,
    `cell=NNNN+g<hex>.parquet` (atomic tmp+rename; an existing file
    resume-skips, so re-running the same append is idempotent). The
    probe path already globs `cell=NNNN*`, so appended vectors are
    searchable with no reader change. The generation id derives from
    the increment's CONTENT — an order-independent fold of per-row
    64-bit hashes over (id, vector bytes), one cheap aggregate pass —
    never from call order: restaging different data (even the same ids
    with corrected embeddings) re-lands, re-running the same data
    skips. Idempotency survives compaction: a completed append drops a
    `_gen-<hex>.applied` marker that outlives the generation files
    ivfpq_compact folds away, so a crash-retry replayed AFTER a
    compact still skips instead of re-landing duplicate rows. Appends
    are assumed to carry new ids (dedupe upstream:
    snapshot_dedupe)."""
    import hashlib
    import json
    import os
    from pathlib import Path

    meta = json.loads((Path(store_dir) / "_ivfpq_meta.json").read_text())
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    books = [np.asarray(b, dtype=np.float64) for b in meta["books"]]
    _ivfpq_recover(store_dir)

    if generation is None:

        def content_digest(batch: pd.DataFrame) -> pd.DataFrame:
            # per-row 64-bit hash of (id, vector bytes), mixed through
            # splitmix64 so xor/sum folds don't collide on small sets
            # like {0,5} vs {1,4}; order-independent across batches.
            # Partials are REINTERPRETED to int64 so every batch emits
            # the same dtype: a mixed uint64/int64 block set unifies to
            # float64 in the collect, silently truncating low bits —
            # which would make the generation id depend on batch
            # boundaries.
            zero = np.zeros(1, dtype=np.int64)
            if len(batch) == 0:
                return pd.DataFrame({"n": zero, "xor": zero, "sum": zero})
            ids = batch[id_col].to_numpy().astype(np.uint64)
            h = ids.copy()
            m = np.ascontiguousarray(
                _to_matrix(batch[vec_col]).astype(np.float64)
            ).view(np.uint64)
            # fold vector content in column-by-column (vectorized over
            # rows): h = mix(h * P ^ col_bits)
            for j in range(m.shape[1]):
                h = h * np.uint64(0x9E3779B97F4A7C15) ^ m[:, j]
            # splitmix64 finalizer
            h ^= h >> np.uint64(30)
            h *= np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(27)
            h *= np.uint64(0x94D049BB133111EB)
            h ^= h >> np.uint64(31)
            return pd.DataFrame(
                {
                    "n": np.array([len(h)], dtype=np.int64),
                    "xor": np.array(
                        [np.bitwise_xor.reduce(h)], dtype=np.uint64
                    ).view(np.int64),
                    "sum": np.array(
                        [h.sum(dtype=np.uint64)], dtype=np.uint64
                    ).view(np.int64),
                }
            )

        parts = ds.map_batches(
            content_digest, batch_format="pandas"
        ).to_pandas()
        xs = parts["xor"].to_numpy().astype(np.int64).view(np.uint64)
        ss = parts["sum"].to_numpy().astype(np.int64).view(np.uint64)
        sig = (
            int(parts["n"].sum()),
            int(np.bitwise_xor.reduce(xs)) if len(xs) else 0,
            int(ss.sum(dtype=np.uint64)),
        )
        generation = hashlib.sha1(repr(sig).encode()).hexdigest()[:16]
    gen = generation

    root = Path(store_dir)
    marker = root / f"_gen-{gen}.applied"
    if gen in _applied_gens(root):
        # this exact content already landed (its files may since have
        # been folded away by ivfpq_compact — the marker/ledger
        # outlives them)
        return {
            "generation": gen,
            "cells_touched": 0,
            "rows": 0,
            "already_applied": True,
        }

    cent_ref, books_ref = ray.put(cent), ray.put(books)
    out = Path(store_dir)

    def write_gen(group: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        cell = int(group["_cell"].iloc[0])
        path = out / f"cell={cell:04d}+g{gen}.parquet"
        if path.exists():  # idempotent re-run
            return pd.DataFrame(
                {"cell": [cell], "rows": [0], "skipped": [True]}
            )
        tmp = str(path) + f".tmp{os.getpid()}"
        pq.write_table(
            pa.Table.from_pandas(
                group.drop(columns=["_cell"]), preserve_index=False
            ),
            tmp,
        )
        os.replace(tmp, path)
        return pd.DataFrame(
            {"cell": [cell], "rows": [len(group)], "skipped": [False]}
        )

    summary = (
        ds.map_batches(
            _CellAssignEncoder,
            fn_constructor_args=(books_ref, vec_col, id_col, cent_ref),
            batch_format="pandas",
            concurrency=autoscale_concurrency(),
        )
        .groupby("_cell")
        .map_groups(write_gen, batch_format="pandas")
        .to_pandas()
    )
    # commit point: every touched cell's generation file is on disk.
    # The marker is what makes idempotency survive ivfpq_compact
    # unlinking those files later. A crash BEFORE this line re-runs
    # write_gen, which resume-skips on the files themselves — and
    # compact never folds an UNapplied generation, so the files are
    # guaranteed still in place (not folded away) when the retry runs.
    marker.touch()
    return {
        "generation": gen,
        "cells_touched": int(len(summary)),
        "rows": int(summary["rows"].sum()),
        "already_applied": bool(summary["skipped"].all()),
    }


def ivfpq_compact(store_dir: str) -> dict:
    """Fold each cell's GENERATION files back into one — the
    maintenance step that bounds per-cell file counts after a stream
    of appends. Base and salted shards are left alone (folding them
    would undo hot-cell salting); only `+g` files whose generation is
    in the APPLIED ledger merge — a generation without its marker
    belongs to an append that crashed before its commit point (its
    retry will resume-skip the files in place) or to a fold whose
    intent was rolled back; folding either would bake duplicates in.
    The fold target is named deterministically from the member set
    (retries land on the SAME name, so a re-fold after a lost intent
    overwrites rather than duplicates). Crash safety: a members intent
    file commits the merge — written before the target rename,
    consumed after the member unlinks and the target's own applied
    marker; `_ivfpq_recover` (run by append/compact) finishes or rolls
    back an interrupted fold. After the folds, marker files consolidate
    into `_gens.json` so an append stream doesn't grow the directory
    without bound."""
    import hashlib
    import json
    import os
    from collections import defaultdict
    from pathlib import Path

    root = Path(store_dir)
    # compact is the single maintenance owner: reap ALL intents (a
    # committed-but-unreaped fold's members would otherwise be folded
    # again on top of their target, duplicating rows)
    _ivfpq_recover(store_dir, min_age_s=0.0)
    applied = _applied_gens(root)
    groups: dict[int, list[str]] = defaultdict(list)
    for p in sorted(root.glob("cell=*+g*.parquet")):
        if _gen_of(p.name) not in applied:
            continue  # uncommitted append / orphaned fold output
        cell = int(p.stem.split("=")[1].split("+")[0])
        groups[cell].append(p.name)
    todo = {c: ms for c, ms in groups.items() if len(ms) > 1}
    folded = 0
    if todo:
        items = [
            {"cell": c, "members": ms} for c, ms in sorted(todo.items())
        ]

        def fold(batch: pd.DataFrame) -> pd.DataFrame:
            import pyarrow as pa
            import pyarrow.parquet as pq

            out_rows = []
            for _, row in batch.iterrows():
                cell, members = int(row["cell"]), list(row["members"])
                gid = hashlib.sha1(
                    ("|".join(members)).encode()
                ).hexdigest()[:16]
                target = f"cell={cell:04d}+g{gid}.parquet"
                r = Path(store_dir)
                intent = r / f"cell={cell:04d}.members.json"
                t = pa.concat_tables(
                    [pq.read_table(r / m) for m in members],
                    promote_options="default",
                )
                intent.write_text(
                    json.dumps({"target": target, "members": members})
                )
                tmp = str(r / target) + f".tmp{os.getpid()}"
                pq.write_table(t, tmp)
                os.replace(tmp, r / target)
                for m in members:
                    p = r / m
                    if p.exists():
                        p.unlink()
                # the fold output is itself an applied generation (a
                # later compact round may fold it further)
                (r / f"_gen-{gid}.applied").touch()
                # missing_ok: a concurrent recover may have reaped it
                intent.unlink(missing_ok=True)
                out_rows.append({"cell": cell, "merged": len(members)})
            return pd.DataFrame(out_rows)

        res = (
            ray.data.from_items(items, override_num_blocks=len(items))
            .map_batches(fold, batch_format="pandas", batch_size=None)
            .to_pandas()
        )
        folded = int(res["merged"].sum())

    # consolidate marker files into the ledger (markers created AFTER
    # the glob below survive as files and stay honored either way)
    markers = sorted(root.glob("_gen-*.applied"))
    if markers:
        ledger = root / "_gens.json"
        gens = set()
        if ledger.exists():
            try:
                gens = set(json.loads(ledger.read_text()))
            except ValueError:
                pass
        gens |= {
            m.name[len("_gen-") : -len(".applied")] for m in markers
        }
        tmp = str(ledger) + f".tmp{os.getpid()}"
        Path(tmp).write_text(json.dumps(sorted(gens)))
        os.replace(tmp, ledger)
        for m in markers:
            m.unlink(missing_ok=True)

    return {
        "cells_compacted": int(len(todo)),
        "files_merged": folded,
    }


def fsck_vector_store(store_dir: str, deep: bool = True) -> dict:
    """Consistency check for an IVF/IVFPQ store — the ANN counterpart
    of `pipelines/fsck.fsck_store` (an appendable, compactable store
    accumulates state across crash windows, so operators need a cheap
    "is it internally consistent?" answer). Tiers mirror fsck_store:

    - errors:   missing/unparseable meta, shard names outside the cell
                namespace or pointing past the centroid count, wrong
                column set, PQ codes of the wrong width, duplicate ids
                across the store (appends assume new ids)
    - warnings: orphan `.tmp*` writer files, leftover fold intents
                (committed ones finish on the next maintenance run),
                generation files without their applied marker (an
                in-flight or crashed append — its retry resume-skips)
    - info:     cell/file/row counts per shard kind, applied gens

    `deep=False` checks names + metadata only; `deep=True` adds one
    Ray task per shard (no shuffle) for column/code checks plus one
    id-only groupby for the global duplicate count."""
    import json
    from pathlib import Path

    root = Path(store_dir)
    errors: list[str] = []
    warnings: list[str] = []

    kind = meta = None
    if (root / "_ivfpq_meta.json").exists():
        kind = "ivfpq"
        mp = root / "_ivfpq_meta.json"
    elif (root / "_ivf_meta.json").exists():
        kind = "ivf"
        mp = root / "_ivf_meta.json"
    else:
        errors.append("no _ivf_meta.json or _ivfpq_meta.json")
        mp = None
    if mp is not None:
        try:
            meta = json.loads(mp.read_text())
        except ValueError:
            errors.append(f"unparseable {mp.name}")
    n_cells = len(meta["centroids"]) if meta else 0

    files = sorted(root.glob("cell=*.parquet"))
    applied = _applied_gens(root)
    counts = {"base": 0, "salted": 0, "generation": 0}
    unapplied: set[str] = set()
    for p in files:
        stem = p.name.split(".")[0]
        try:
            cell = int(stem.split("=")[1].split("+")[0])
        except (IndexError, ValueError):
            errors.append(f"unparseable shard name: {p.name}")
            continue
        if meta and not 0 <= cell < n_cells:
            errors.append(f"{p.name}: cell {cell} >= n_centroids {n_cells}")
        g = _gen_of(p.name)
        if g is not None:
            counts["generation"] += 1
            if g not in applied:
                unapplied.add(g)
        elif "+s" in stem:
            counts["salted"] += 1
        else:
            counts["base"] += 1
    if unapplied:
        warnings.append(
            f"{len(unapplied)} generation(s) without applied marker "
            "(in-flight or crashed append; its retry resume-skips)"
        )
    for t in sorted(root.glob("*.tmp*")):
        warnings.append(f"orphan writer tmp: {t.name}")
    for intent in sorted(root.glob("*.members.json")):
        try:
            rec = json.loads(intent.read_text())
            committed = (root / rec["target"]).exists()
        except (OSError, ValueError):
            committed = False
        warnings.append(
            f"fold intent {intent.name}: "
            + ("committed, unreaped (next maintenance run finishes it)"
               if committed else "uncommitted (in-flight or crashed fold)")
        )

    rows = dup_ids = 0
    if deep and files and meta and not errors:
        id_col = meta["id_col"]
        expect = {id_col, "code"} if kind == "ivfpq" else {
            id_col, meta["vec_col"]
        }
        n_sub = len(meta.get("books", [])) if kind == "ivfpq" else 0

        # one task per shard, 1-row summary each — no shuffle
        def check_file(batch):
            import pyarrow as _pa
            import pyarrow.compute as _pc
            import pyarrow.parquet as _pq

            out = {"rows": [], "bad_cols": [], "bad_code": []}
            for path in batch.column("path").to_pylist():
                t = _pq.read_table(path)
                bad_code = 0
                if kind == "ivfpq" and "code" in t.column_names:
                    lens = _pc.binary_length(t.column("code"))
                    bad_code = int(
                        _pc.sum(_pc.not_equal(lens, n_sub)).as_py() or 0
                    )
                out["rows"].append(t.num_rows)
                out["bad_cols"].append(
                    0 if expect <= set(t.column_names) else 1
                )
                out["bad_code"].append(bad_code)
            return _pa.table(out)

        summary = (
            ray.data.from_items([{"path": str(p)} for p in files])
            .map_batches(check_file, batch_format="pyarrow")
            .to_pandas()
        )
        rows = int(summary["rows"].sum())
        if int(summary["bad_cols"].sum()):
            errors.append(
                f"{int(summary['bad_cols'].sum())} shard(s) with an "
                "unexpected column set"
            )
        if int(summary["bad_code"].sum()):
            errors.append(
                f"{int(summary['bad_code'].sum())} PQ code(s) of wrong "
                "width"
            )
        # global duplicate-id count: id-only columns leave the shards
        dup_ids = (
            ray.data.read_parquet([str(p) for p in files], columns=[id_col])
            .groupby(id_col)
            .count()
            .filter(lambda r: r["count()"] > 1)
            .count()
        )
        if dup_ids:
            errors.append(
                f"{dup_ids} id(s) appear more than once across shards"
            )

    return {
        "ok": not errors,
        "kind": kind,
        "cells": n_cells,
        "files": counts,
        "rows": int(rows),
        "applied_generations": len(applied),
        "warnings": warnings,
        "errors": errors,
    }
