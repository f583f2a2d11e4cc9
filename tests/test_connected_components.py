"""Distributed connected components (min-label propagation with pointer
jumping) vs a driver-side union-find reference, on graph shapes that
stress different failure modes: long chains (worst case for plain
neighbor propagation), cycles, stars, multiple components, self-loops
and duplicate edges.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class _UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _reference(edges):
    uf = _UnionFind()
    for a, b in edges:
        uf.union(int(a), int(b))
    return {n: uf.find(n) for n in list(uf.p)}


def _run(ray_session, edges, **kw):
    import ray.data

    from parquet_go_ray.pipelines import dedup

    df = pd.DataFrame(
        {"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]},
        dtype="int64",
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    out = dedup.connected_components(ds, **kw).to_pandas()
    return dict(zip(out["node"].astype(int), out["component"].astype(int)))


def test_chain_cycle_star_multi(ray_session):
    # force the DISTRIBUTED rounds (single_task_limit=0): the subject
    # here is the pointer-jumping propagation, not the small-graph
    # union-find fast path
    edges = []
    edges += [(i, i + 1) for i in range(100, 160)]          # 61-node chain
    edges += [(1000 + i, 1000 + (i + 1) % 40) for i in range(40)]  # cycle
    edges += [(5000, 5000 + i) for i in range(1, 30)]       # star
    edges += [(9000, 9000), (9001, 9002), (9001, 9002)]     # self-loop + dup
    got = _run(ray_session, edges, single_task_limit=0)
    want = _reference(edges)
    assert got == want
    # chain root propagates the full 61 nodes
    assert all(got[i] == 100 for i in range(100, 161))


def test_random_graphs_match_union_find(ray_session):
    from parquet_go_ray.pipelines import dedup

    rng = np.random.default_rng(17)
    for trial in range(3):
        n = 400
        m = int(n * (0.6 + 0.4 * trial))
        edges = list(
            zip(
                rng.integers(0, n, m).tolist(),
                rng.integers(0, n, m).tolist(),
            )
        )
        # distributed rounds on one trial, single-task union-find on
        # the rest — both must equal the driver-side reference
        limit = 0 if trial == 0 else None
        kw = {"single_task_limit": limit} if limit is not None else {}
        got = _run(ray_session, edges, **kw)
        assert got == _reference(edges), trial
        if limit is None:
            assert dedup.LAST_CC_ROUNDS == -1  # fast path taken


def test_pointer_jumping_is_logarithmic(ray_session):
    from parquet_go_ray.pipelines import dedup

    edges = [(i, i + 1) for i in range(512)]  # 513-node chain
    got = _run(ray_session, edges, max_rounds=24, single_task_limit=0)
    assert all(v == 0 for v in got.values())
    # plain neighbor propagation would need ~512 rounds; pointer
    # jumping finishes in O(log n)
    assert 0 < dedup.LAST_CC_ROUNDS <= 16, dedup.LAST_CC_ROUNDS


def test_empty_and_convergence_guard(ray_session):
    import ray.data

    from parquet_go_ray.pipelines import dedup

    empty = ray.data.from_pandas(
        pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                      "id_b": pd.Series([], dtype="int64")})
    )
    out = dedup.connected_components(empty)
    assert out.count() == 0
    assert out.schema().names == ["node", "component"]
    with pytest.raises(RuntimeError, match="converge"):
        _run(
            ray_session,
            [(i, i + 1) for i in range(300)],
            max_rounds=2,
            single_task_limit=0,
        )


def test_jump_fanin_is_aggregated(ray_session):
    """One giant component must NOT funnel O(component) jump rows into
    the label hub's partition. A 40k-node shallow tree (branching 32,
    depth 3 — collapses to label 0 in a few rounds) is run with 8
    partitions; the per-round max partition row count, measured inside
    the pipeline, must stay near the mean shuffle share instead of
    absorbing the whole component at the hub. The unaggregated design
    (one jump row per node keyed by the label) put ~V extra rows on
    partition 0 the round after collapse."""
    import ray.data

    from parquet_go_ray.pipelines import dedup

    n, bf, P = 40_000, 32, 8
    child = np.arange(1, n, dtype=np.int64)
    parent = (child - 1) // bf
    df = pd.DataFrame({"id_a": parent, "id_b": child})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    out = dedup.connected_components(
        ds,
        single_task_limit=0,
        n_partitions=P,
        track_partition_load=True,
    ).to_pandas()
    assert len(out) == n
    assert (out["component"] == 0).all()
    assert dedup.LAST_CC_MAX_PART_ROWS  # instrumentation ran
    # per-round shuffle volume: V fact rows + up to V request rows
    # (round 1, all labels distinct — aggregation can't help there,
    # but they're balanced by label value) + 2(V-1) edge rows
    mean_share = (2 * n + 2 * (n - 1)) / P
    worst = max(dedup.LAST_CC_MAX_PART_ROWS)
    assert worst < 1.5 * mean_share, (worst, mean_share)
    # the unaggregated design adds ~V jump rows to label 0's partition
    # the round after collapse (worst ≈ mean_share + n); aggregated
    # stays near the balanced share
    assert worst < 0.75 * n, (worst, n)


def test_curate_cluster_mode(ray_session):
    """dedup_mode='clusters' keeps exactly one representative per
    near-dup component, including across transitive chains where pair
    breaking and clustering agree the min id survives."""
    import ray.data

    from parquet_go_ray.pipelines.dedup import curate_corpus

    base = "the quick brown fox jumps over the lazy dog " * 8
    v1 = base.replace("lazy", "sleepy")   # near-dup of base
    v2 = v1.replace("quick", "rapid")     # near-dup of v1 (chain)
    docs = [
        {"doc_id": 0, "lang": "en", "text": base},
        {"doc_id": 1, "lang": "en", "text": v1},
        {"doc_id": 2, "lang": "en", "text": v2},
        {"doc_id": 3, "lang": "en", "text": "ganz anderer inhalt hier " * 10},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(docs))
    out = curate_corpus(
        ds, min_chars=10, jaccard_threshold=0.5,
        n_docs_hint=len(docs), dedup_mode="clusters",
    )
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert kept == [0, 3]


def test_curate_gopher_quality_filter(ray_session):
    """quality='gopher' drops rule-violating docs before any hashing."""
    import ray.data

    from parquet_go_ray.pipelines.dedup import curate_corpus

    good = "plain readable words repeated here " * 8
    docs = [
        {"doc_id": 0, "lang": "en", "text": good},
        {"doc_id": 1, "lang": "en", "text": "x " * 300},        # mean wl too low
        {"doc_id": 2, "lang": "en", "text": "1234 5678 " * 60},  # not alphabetic
        {"doc_id": 3, "lang": "en", "text": good.replace("plain", "other")},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(docs))
    out = curate_corpus(
        ds, min_chars=10, jaccard_threshold=0.9,
        n_docs_hint=len(docs), quality="gopher",
    )
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert kept == [0, 3]
    with pytest.raises(ValueError, match="quality"):
        curate_corpus(ds, quality="nope")


def test_chain_edges_by_group(ray_session):
    import ray.data

    from parquet_go_ray.pipelines import dedup

    df = pd.DataFrame(
        {
            "doc_id": [5, 1, 3, 10, 20, 7],
            "source": ["a", "a", "a", "b", "b", "c"],
        }
    )
    ds = ray.data.from_pandas(df)
    got = dedup.chain_edges_by_group(ds, "source").to_pandas()
    pairs = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
    assert pairs == {(1, 3), (3, 5), (10, 20)}  # 'c' is a singleton


def test_single_task_large_chain(ray_session):
    """The single-task fast path must stay vectorized: a 300k-edge chain
    (pathological diameter) through the full Ray pipeline. The old
    per-edge Python union-find took minutes here; the numpy min-label +
    pointer-jumping kernel finishes the whole planted graph well inside
    the suite budget. Correctness only — no wall-clock assertion (host
    timing varies); the scale itself is the regression guard."""
    import ray.data

    from parquet_go_ray.pipelines import dedup

    n = 300_000
    a = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"id_a": a, "id_b": a + 1})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    out = dedup.connected_components(ds).to_pandas()
    assert dedup.LAST_CC_ROUNDS == -1  # took the single-task plan
    assert len(out) == n + 1
    assert (out["component"] == 0).all()  # one component, min label 0
