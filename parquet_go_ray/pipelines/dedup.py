"""Deduplication pipelines over a document table.

Four families, each a composition of vectorized `map_batches` stages and
one explicit shuffle (the `groupby`) — the pattern the guide recommends
(hash per batch, shuffle only keys/ids, verify within groups):

- exact:   content hash per batch -> groupby(hash) -> keep min id
- minhash: shingle->MinHash per batch -> explode (band, key, id) rows ->
           groupby(band, key) -> candidate pairs -> exact Jaccard verify
- simhash: 64-bit fingerprint per batch -> bucket by high bits ->
           near-pairs by Hamming distance within buckets
- ngram:   exact k-gram Jaccard on candidate pairs (the verify kernel)

At 100 TB the only all-to-all traffic is (hash, id) pairs — a ~1e-4
fraction of the corpus; document payloads never shuffle. Pair
verification re-reads only the candidate docs (here: they ride along in
the group since candidates are rare).

Scale note: minhash band rows currently carry the full signature (16x
signature volume through the shuffle) so buckets can estimate Jaccard
in place; at 10^12 docs, restructure to ship (band, key, id) only and
re-join signatures for the candidate set (a ~1e-3 fraction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions import hashing


def exact_dedupe(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One row per distinct text: (keep_id = min id, n_dups)."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        h = hashing.stable_hash_strings(batch[text_col].to_numpy(dtype=object))
        return pd.DataFrame({
            "h": h.view(np.int64),
            id_col: batch[id_col].to_numpy(),
        })

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "keep_id": [int(group[id_col].min())],
                "n_dups": [int(len(group))],
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 4,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
) -> ray.data.Dataset:
    """Near-duplicate pairs (id_a < id_b, est_jaccard >= threshold).

    Stage 1 (map_batches): signatures + band keys per doc; emit one
    (band, key, id, signature) row per band. Stage 2 (groupby band+key):
    within-bucket pairs, estimated Jaccard from signature agreement,
    dedup pairs via min-band ownership.
    """
    rows_per_band = num_perm // bands

    def sig_rows(batch: pd.DataFrame) -> pd.DataFrame:
        texts = [t.encode() for t in batch[text_col]]
        ids = batch[id_col].to_numpy()
        sigs = hashing.minhash_signatures(texts, shingle_k, num_perm)
        keys = hashing.lsh_band_keys(sigs, bands)
        n = len(ids)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(bands, dtype=np.int32), n),
                "key": keys.ravel().view(np.int64),
                id_col: np.repeat(ids, bands),
                "sig": list(np.repeat(sigs.view(np.int64), bands, axis=0).reshape(n * bands, num_perm)),
            }
        )

    _empty = {"id_a": "int64", "id_b": "int64", "est_jaccard": "float64"}

    def bucket_pairs(super_group: pd.DataFrame) -> pd.DataFrame:
        """One call per hashed SUPER-group (bounded count), pandas
        groupby over the real (band, key) buckets inside — avoids one
        Python call per tiny bucket (thousands at any scale)."""
        outs = []
        for (_b, _k), group in super_group.groupby(["band", "key"], sort=False):
            if len(group) < 2:
                continue
            ids = group[id_col].to_numpy()
            sigs = np.stack(group["sig"].to_numpy())
            order = np.argsort(ids)
            ids, sigs = ids[order], sigs[order]
            ia, ib = np.triu_indices(len(ids), k=1)
            est = (sigs[ia] == sigs[ib]).mean(axis=1)
            keep = est >= jaccard_threshold
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[ia[keep]].astype(np.int64),
                            "id_b": ids[ib[keep]].astype(np.int64),
                            "est_jaccard": np.round(est[keep], 4),
                        }
                    )
                )
        if not outs:
            return pd.DataFrame({k: [] for k in _empty}).astype(_empty)
        # a pair found by several bands within this super-group dedupes here
        return (
            pd.concat(outs).drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)
        )

    sigs = ds.map_batches(sig_rows, batch_format="pandas")

    def add_super(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sg"] = (
            df["key"].to_numpy().view(np.uint64) % np.uint64(64)
        ).astype(np.int32)
        return df

    pairs = (
        sigs.map_batches(add_super, batch_format="pandas")
        .groupby("sg")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # cross-super-group duplicates: same (band,key) always lands in the
    # same super-group, but the same PAIR can emerge from bands in
    # different super-groups -> final dedup over hashed pair groups
    def add_pg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pg"] = ((df["id_a"].to_numpy() * 31 + df["id_b"].to_numpy()) % 16).astype(
            np.int32
        )
        return df

    def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(["id_a", "id_b"])[
            ["id_a", "id_b", "est_jaccard"]
        ]

    return (
        pairs.map_batches(add_pg, batch_format="pandas")
        .groupby("pg")
        .map_groups(dedup_pairs, batch_format="pandas")
    )


def simhash_fingerprints(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-doc 64-bit SimHash (as int64) + 16-bit prefix bucket."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        texts = [t.encode() for t in batch[text_col]]
        h = hashing.simhash64(texts)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "simhash": h.view(np.int64),
                "bucket": (h >> np.uint64(48)).astype(np.int64),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


def ngram_jaccard(a: str, b: str, k: int = 4) -> float:
    """Exact k-gram Jaccard (the verify kernel for candidate pairs)."""
    sa = {a[i : i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i : i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def verified_near_dupes(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.6,
    **lsh_kwargs,
) -> pd.DataFrame:
    """MinHash-LSH candidates -> exact n-gram Jaccard verification.

    Returns a small driver-side DataFrame (id_a, id_b, jaccard). The
    candidate set is tiny relative to the corpus; texts for verification
    are fetched via a broadcast lookup of only the candidate ids."""
    cand = minhash_lsh_pairs(
        ds, text_col, id_col, jaccard_threshold=jaccard_threshold * 0.8, **lsh_kwargs
    ).to_pandas()
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []}).astype(
            {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
        )
    need = set(cand["id_a"]) | set(cand["id_b"])

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[id_col].isin(need)
        return batch.loc[m, [id_col, text_col]]

    docs = ds.map_batches(project, batch_format="pandas").to_pandas()
    lookup = dict(zip(docs[id_col], docs[text_col]))
    jac = np.array(
        [ngram_jaccard(lookup[a], lookup[b]) for a, b in zip(cand["id_a"], cand["id_b"])]
    )
    keep = jac >= jaccard_threshold
    out = cand.loc[keep, ["id_a", "id_b"]].copy()
    out["jaccard"] = np.round(jac[keep], 4)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
