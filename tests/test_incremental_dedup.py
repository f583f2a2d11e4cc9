"""Incremental cross-snapshot dedup: build_dedup_index persists a
compact hash store once; dedupe_against_index drops exact dups of the
OLD corpus from a new snapshot without re-reading the old corpus."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(texts, ids=None):
    import ray.data

    if ids is None:
        ids = np.arange(len(texts))
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "text": pa.array([str(t) for t in texts]),
            }
        )
    )


def test_index_then_dedupe_roundtrip(ray_session, tmp_path):
    from parquet_go_ray.pipelines.dedup import (
        build_dedup_index,
        dedupe_against_index,
    )

    old = [f"old page {i}" for i in range(200)]
    idx = str(tmp_path / "idx")
    meta = build_dedup_index(_docs_ds(old), idx, n_docs_hint=200)
    assert meta["n_hashes"] == 200
    assert os.path.exists(os.path.join(idx, "manifest.json"))

    # new snapshot: 50 exact dups of old pages + 70 genuinely new, in a
    # SHUFFLED id order (block layout must not matter)
    rng = np.random.default_rng(3)
    new_texts = [old[i] for i in range(0, 100, 2)] + [
        f"new page {i}" for i in range(70)
    ]
    ids = 10_000 + np.arange(len(new_texts))
    perm = rng.permutation(len(new_texts))
    out = (
        dedupe_against_index(
            _docs_ds(
                [new_texts[i] for i in perm], ids=ids[perm]
            ),
            idx,
            payload_cols=("text",),
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert len(out) == 70
    assert all(t.startswith("new page") for t in out["text"])
    # duplicates WITHIN the new snapshot are not this operator's job:
    # survivors keep their ids intact
    assert set(out["doc_id"]) == set(int(i) for i in ids[50:])


def test_index_rebuild_overwrites_not_appends(ray_session, tmp_path):
    from parquet_go_ray.pipelines.dedup import (
        build_dedup_index,
        dedupe_against_index,
    )

    idx = str(tmp_path / "idx")
    build_dedup_index(_docs_ds([f"a{i}" for i in range(50)]), idx)
    # rebuild over a DIFFERENT corpus: old hashes must be gone
    build_dedup_index(_docs_ds([f"b{i}" for i in range(50)]), idx)
    with open(os.path.join(idx, "manifest.json")) as f:
        assert json.load(f)["n_hashes"] == 50
    out = dedupe_against_index(
        _docs_ds([f"a{i}" for i in range(50)], ids=np.arange(900, 950)),
        idx,
    ).to_pandas()
    # the a-corpus is NOT in the rebuilt index -> nothing dropped
    assert len(out) == 50


def test_dedupe_against_empty_overlap(ray_session, tmp_path):
    from parquet_go_ray.pipelines.dedup import (
        build_dedup_index,
        dedupe_against_index,
    )

    idx = str(tmp_path / "idx")
    build_dedup_index(_docs_ds([f"x{i}" for i in range(30)]), idx)
    out = dedupe_against_index(
        _docs_ds([f"y{i}" for i in range(30)]), idx
    ).to_pandas()
    assert len(out) == 30
    out2 = dedupe_against_index(
        _docs_ds([f"x{i}" for i in range(30)]), idx
    ).to_pandas()
    assert len(out2) == 0


def test_host_quota_shuffled_blocks(ray_session):
    """Quota sampling keeps exactly the k smallest ids per source,
    independent of block layout."""
    import ray.data

    from parquet_go_ray.pipelines.webtext import host_quota_sample

    rng = np.random.default_rng(9)
    n = 3000
    ids = rng.permutation(n).astype(np.int64)
    src = np.array([f"host{h}.example" for h in ids % 7])
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "source": pa.array(list(src))})
    ).repartition(16)
    out = host_quota_sample(ds, max_per_source=5).to_pandas()
    exp = (
        pd.DataFrame({"doc_id": ids, "source": src})
        .sort_values("doc_id")
        .groupby("source", sort=False)
        .head(5)
    )
    assert len(out) == len(exp) == 35
    got = set(zip(out["doc_id"], out["source"]))
    want = set(zip(exp["doc_id"], exp["source"]))
    assert got == want


def test_deterministic_shuffle_layout_independent(ray_session):
    """The shuffled ORDER is a pure function of (ids, seed): identical
    across block layouts and runs; a new seed produces a different
    order; splitmix keys have no id-order correlation."""
    import ray.data

    from parquet_go_ray.pipelines.relational import deterministic_shuffle

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})

    def order(blocks, seed):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = deterministic_shuffle(ds, seed=seed).to_pandas()
        return out["doc_id"].to_numpy()

    o4 = order(4, seed=0)
    o32 = order(32, seed=0)
    assert (o4 == o32).all(), "order depends on block layout"
    o_seed1 = order(4, seed=1)
    assert not (o4 == o_seed1).all(), "seed does not change the order"
    # shuffled: rank-vs-id correlation near zero (a sorted pass-through
    # would be 1.0)
    rank_of = np.empty(n, dtype=np.int64)
    rank_of[o4] = np.arange(n)
    corr = np.corrcoef(ids, rank_of)[0, 1]
    assert abs(corr) < 0.05, corr
