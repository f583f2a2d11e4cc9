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
