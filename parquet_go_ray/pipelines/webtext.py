"""Web-page extraction pipelines over the webpages corpus.

`extract_text_verified` is the north rule's per-row invariant as a
distributed pipeline: extract the main text from every page's html and
compare it byte-for-byte against the corpus's stored extracted text —
the count of mismatches (and ONLY that count) reaches the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions import webtext as W


def extract_text(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(url, text) rows with text extracted from the html column."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t.column("url"),
                "text": W.extract_main_text(t.column("html")),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def extract_text_verified(ds: ray.data.Dataset) -> dict:
    """Extract text from html and verify byte-identity against the
    stored text column, fully distributed. Returns
    {rows, mismatches, ok} — only per-task counters reach the driver."""

    def check(t: pa.Table) -> pa.Table:
        got = W.extract_main_text(t.column("html"))
        want = pc.cast(t.column("text"), pa.large_string())
        eq = pc.equal(got, want)
        bad = int(len(t)) - int(
            pc.sum(pc.cast(eq, pa.int64())).as_py() or 0
        )
        return pa.table(
            {"rows": pa.array([len(t)]), "mismatches": pa.array([bad])}
        )

    counts = ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
    rows = int(counts.sum("rows") or 0)
    bad = int(counts.sum("mismatches") or 0)
    return {"rows": rows, "mismatches": bad, "ok": bad == 0}


def host_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-host page counts (host from the url column), pre-aggregated
    inside map_batches so only (host, count) partials shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        hosts = W.extract_host(t.column("url"))
        vc = pc.value_counts(hosts)
        return pa.table(
            {
                "host": pc.struct_field(vc, "values"),
                "n": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .sum("n")
    )


def source_reputation_filter(
    ds: ray.data.Dataset,
    min_avg_chars: int = 280,
    source_col: str = "source",
    len_col: str = "n_chars",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """CCNet-style per-domain reputation filtering: keep every doc whose
    SOURCE (domain) has average doc length >= min_avg_chars; docs from
    low-reputation sources are dropped wholesale. Two phases:

    1. Per-source stats are pre-aggregated inside map_batches — only
       (source, sum, n) partials shuffle, one row per distinct source
       per batch — then a tiny groupby-sum collapses them. The decision
       `sum >= min_avg_chars * n` is exact int64 arithmetic (no float
       average anywhere), so it agrees bit-for-bit with the SQL HAVING.
    2. The GOOD-source set is broadcast (ray.put once) and the corpus
       is filtered in place with one vectorized is_in — the corpus
       itself never shuffles.

    The broadcast set is bounded by the distinct-source count. Web
    corpora have ~10^7-10^8 domains (a few GB of strings at worst) —
    fine for ray.put; if a corpus ever exceeds that, swap phase 2 for
    the hash-partitioned semi-join in dedup.anti_join_ids."""
    import numpy as np
    import pandas as pd

    import ray

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": t.column(source_col).to_pandas(),
                "s": t.column(len_col).to_numpy(),
            }
        )
        g = df.groupby("source", sort=False)["s"].agg(["sum", "size"])
        return pd.DataFrame(
            {
                "source": g.index.to_numpy(),
                "s": g["sum"].to_numpy().astype(np.int64),
                "n": g["size"].to_numpy().astype(np.int64),
            }
        )

    stats = (
        ds.select_columns([source_col, len_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["s", "n"])
        .to_pandas()
    )
    good = stats.loc[
        stats["sum(s)"].to_numpy()
        >= min_avg_chars * stats["sum(n)"].to_numpy(),
        "source",
    ].to_numpy()
    good_ref = ray.put(pa.array(sorted(good)))

    def keep(t: pa.Table) -> pa.Table:
        ok = pc.is_in(t.column(source_col), value_set=ray.get(good_ref))
        return t.select([id_col, source_col]).filter(ok)

    return ds.map_batches(keep, batch_format="pyarrow")


def host_quota_sample(
    ds: ray.data.Dataset,
    max_per_source: int = 3,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_docs_hint: int | None = None,
) -> ray.data.Dataset:
    """Per-domain quota sampling: keep at most `max_per_source` docs per
    source, deterministically the smallest ids (the standard CC-curation
    guard against a handful of template-heavy hosts dominating the
    corpus; cf. the per-domain caps in Gopher/C4-style pipelines).

    Scale shape: a batch partial keeps <= k rows per source per batch
    BEFORE the shuffle, so the groupby moves at most k * n_batches rows
    per source — (id, source) pairs only, never the corpus. The merge
    side is hash-partitioned on the source string (stable_hash_strings
    % P, the exact_dedupe pattern) with ONE vectorized pandas
    groupby-head per partition, not a Python call per distinct domain —
    web corpora have ~1e7-1e8 domains, so per-group map_groups is
    unbounded there."""
    import numpy as np
    import pandas as pd

    from ..functions import hashing
    from .dedup import _n_partitions

    k = int(max_per_source)
    P = _n_partitions(n_docs_hint, 1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = (
            df[[id_col, source_col]]
            .sort_values(id_col, kind="stable")
            .groupby(source_col, sort=False)
            .head(k)
        )
        h = hashing.stable_hash_strings(sub[source_col].to_numpy())
        return pd.DataFrame(
            {
                id_col: sub[id_col].to_numpy().astype(np.int64),
                source_col: sub[source_col].to_numpy(),
                "pt": (h % np.uint64(P)).astype(np.int64),
            }
        )

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        out = (
            part.sort_values(id_col, kind="stable")
            .groupby(source_col, sort=False)
            .head(k)
        )
        return pd.DataFrame(
            {
                id_col: out[id_col].to_numpy().astype(np.int64),
                source_col: out[source_col].to_numpy(),
            }
        )

    return (
        ds.select_columns([id_col, source_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("pt")
        .map_groups(merge, batch_format="pandas")
    )
