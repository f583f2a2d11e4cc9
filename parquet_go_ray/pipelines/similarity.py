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
) -> pd.DataFrame:
    """IVF-style approximate top-k: a coarse k-means quantizer picks the
    n_probe nearest cells to the query; each batch scores only vectors
    whose nearest centroid is a probed cell. Centroids are broadcast via
    ray.put; at scale the assignment would be precomputed/partitioned,
    here it is recomputed per batch (cheap matmul)."""
    sample = _to_matrix(
        ds.limit(sample_rows).to_pandas()[vec_col]
    )
    cent = kmeans_centroids(sample, n_centroids)
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    probes = np.argsort(((cent - q[None, :]) ** 2).sum(axis=1))[:n_probe]
    cent_ref = ray.put(cent)
    probe_ref = ray.put(set(int(p) for p in probes))
    q_ref = ray.put(q)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        probe_set = ray.get(probe_ref)
        qv = ray.get(q_ref)
        m = _to_matrix(batch[vec_col])
        d = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)
        keep = np.isin(cell, list(probe_set))
        if not keep.any():
            return pd.DataFrame({id_col: [], "cos": []}).astype(
                {id_col: "int64", "cos": "float64"}
            )
        mk = m[keep]
        ids = batch[id_col].to_numpy()[keep]
        cos = (mk @ qv) / np.maximum(np.linalg.norm(mk, axis=1), 1e-12)
        order = np.lexsort((ids, -cos))[:k]
        return pd.DataFrame({id_col: ids[order], "cos": cos[order]})

    partials = ds.map_batches(score, batch_format="pandas").to_pandas()
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
) -> ray.data.Dataset:
    """Near-duplicate embedding pairs via random-hyperplane LSH buckets."""

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        m = _to_matrix(batch[vec_col])
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((m.shape[1], n_planes))
        bits = (m @ planes) > 0
        bucket = np.zeros(len(m), dtype=np.int64)
        for b in range(n_planes):
            bucket = bucket * 2 + bits[:, b]
        return pd.DataFrame(
            {
                "bucket": bucket,
                id_col: batch[id_col].to_numpy(),
                "vec": list(m),
            }
        )

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cos": "float64"}
        )
        if len(group) < 2:
            return empty
        ids = group[id_col].to_numpy()
        m = np.stack(group["vec"].to_numpy())
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        mn = m / np.maximum(norms, 1e-12)
        cos = mn @ mn.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = cos[ia, ib] >= cos_threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]].astype(np.int64),
                "id_b": ids[ib[keep]].astype(np.int64),
                "cos": np.round(cos[ia, ib][keep], 4),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
