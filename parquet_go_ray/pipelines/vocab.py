"""Heavy-hitter vocabulary via CountMin sketch + exact refine.

The exact `vocab_topk` operator shuffles a (token, count) partial table
through one groupby — correct, but at 10^12 documents the distinct-token
table is 10^8+ rows and the shuffle is real. This is the sketch path:

1. SKETCH PASS (streaming, zero shuffle): every batch folds its local
   token value_counts into a fixed 4x4096 int64 CountMin array plus a
   candidate dict capped at `cand_cap` entries (pruned by CMS estimate,
   which only OVER-estimates, so pruning compares upper bounds). Partials
   (128 KiB + the capped dict) merge by elementwise sum up a two-level
   tree — CountMin is a linear sketch — and only the final merged
   candidates reach the driver.
2. EXACT REFINE (streaming, zero shuffle): the candidate tokens are
   broadcast once via ray.put; a second pass counts exactly the
   candidates per batch (searchsorted membership, one bincount), and the
   fixed-width count vectors fold up the same tree. The reported top-k
   counts are therefore EXACT — the sketch only decides who gets counted
   — which is what lets this operator share `vocab_topk`'s DuckDB oracle.

Caveat (documented, intrinsic to the sketch): the final top-k is exact
iff every true top-k token survives candidate pruning. With cand_cap >=
8k x safety and depth-4 CMS the failure probability is negligible for
Zipf-ish text (a true heavy hitter would need cand_cap tokens to
OVER-estimate above it at every prune point); the planted-Zipf pytest
drives 50k distinct tokens through multi-level merges to demonstrate it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..functions import sketch as S
from ..functions.hashing import stable_hash_strings


def _local_counts(df: pd.DataFrame, text_col: str) -> pd.Series:
    toks = df[text_col].str.split(" ").explode()
    toks = toks[toks != ""]
    return toks.value_counts()


def heavy_hitter_tokens(
    ds: ray.data.Dataset,
    text_col: str = "text",
    k: int = 100,
    cand_cap: int = 4096,
    fold_partitions: int = 32,
) -> pd.DataFrame:
    """Exact top-k (token, cnt) chosen by a CountMin-pruned candidate
    set — no token ever rides a shuffle. Returns a k-row DataFrame
    ordered by (cnt desc, token asc), the same contract as vocab_topk."""

    def sketch_partial(df: pd.DataFrame) -> pd.DataFrame:
        cms = np.zeros((S.CMS_DEPTH, S.CMS_WIDTH), dtype=np.int64)
        vc = _local_counts(df, text_col)
        tokens = vc.index.to_numpy(dtype=object)
        counts = vc.to_numpy(np.int64)
        if len(tokens):
            S.cms_update(cms, stable_hash_strings(tokens), counts)
        keep = np.argsort(-counts, kind="stable")[:cand_cap]
        return pd.DataFrame(
            {
                "cms": [cms.tobytes()],
                "cand": [list(tokens[keep])],
            }
        )

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        cms = np.zeros((S.CMS_DEPTH, S.CMS_WIDTH), dtype=np.int64)
        cand: set = set()
        for row in part.itertuples(index=False):
            cms += np.frombuffer(row.cms, dtype=np.int64).reshape(
                S.CMS_DEPTH, S.CMS_WIDTH
            )
            cand.update(row.cand)
        toks = np.array(sorted(cand), dtype=object)
        if len(toks) > cand_cap:
            # prune by merged-CMS estimate (an upper bound): keep the
            # cand_cap best-looking, ties by token for determinism
            est = S.cms_estimate(cms, stable_hash_strings(toks))
            keep = np.lexsort((toks, -est))[:cand_cap]
            toks = toks[np.sort(keep)]
        return pd.DataFrame({"cms": [cms.tobytes()], "cand": [list(toks)]})

    def add_fold_pt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # spread partials across fold partitions round-robin-by-hash of
        # the partial itself (content hash keeps it deterministic)
        df["pt"] = (
            pd.util.hash_pandas_object(df["cms"], index=False).to_numpy()
            % np.uint64(fold_partitions)
        ).astype(np.int64)
        return df

    partials = (
        ds.select_columns([text_col])
        .map_batches(sketch_partial, batch_format="pandas")
        .map_batches(add_fold_pt, batch_format="pandas")
        .groupby("pt")
        .map_groups(
            lambda g: fold(g[["cms", "cand"]]), batch_format="pandas"
        )
        .to_pandas()
    )
    merged = fold(partials[["cms", "cand"]])
    cand = np.array(sorted(merged["cand"].iloc[0]), dtype=object)
    if len(cand) == 0:
        return pd.DataFrame(
            {"token": pd.Series([], dtype=str), "cnt": pd.Series([], dtype="int64")}
        )
    cand_ref = ray.put(cand)

    def exact_partial(df: pd.DataFrame) -> pd.DataFrame:
        cset = ray.get(cand_ref)  # zero-copy object-store view per task
        vc = _local_counts(df, text_col)
        toks = vc.index.to_numpy(dtype=object)
        pos = np.searchsorted(cset, toks)
        pos_c = np.minimum(pos, len(cset) - 1)
        hit = cset[pos_c] == toks
        vec = np.zeros(len(cset), dtype=np.int64)
        np.add.at(vec, pos_c[hit], vc.to_numpy(np.int64)[hit])
        return pd.DataFrame({"vec": [vec.tobytes()]})

    def fold_vec(part: pd.DataFrame) -> pd.DataFrame:
        tot = np.zeros(len(cand), dtype=np.int64)
        for b in part["vec"]:
            tot += np.frombuffer(b, dtype=np.int64)
        return pd.DataFrame({"vec": [tot.tobytes()]})

    vec_parts = (
        ds.select_columns([text_col])
        .map_batches(exact_partial, batch_format="pandas")
        .map_batches(add_fold_pt_vec(fold_partitions), batch_format="pandas")
        .groupby("pt")
        .map_groups(lambda g: fold_vec(g[["vec"]]), batch_format="pandas")
        .to_pandas()
    )
    total = np.zeros(len(cand), dtype=np.int64)
    for b in vec_parts["vec"]:
        total += np.frombuffer(b, dtype=np.int64)
    order = np.lexsort((cand, -total))[:k]
    return pd.DataFrame(
        {
            "token": cand[order].astype(str),
            "cnt": total[order].astype(np.int64),
        }
    )


def add_fold_pt_vec(fold_partitions: int):
    def _f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pt"] = (
            pd.util.hash_pandas_object(df["vec"], index=False).to_numpy()
            % np.uint64(fold_partitions)
        ).astype(np.int64)
        return df

    return _f
