"""Exact all-pairs k-gram Jaccard: both block-pair kernels (dense
one-hot matmul and segmented-cartesian bincount) must agree with a
brute-force set computation, on shuffled (non-id-sorted) blocks."""

import numpy as np
import pandas as pd
import pytest


def _brute(docs, ids, t1000):
    sets = [
        {d[i : i + 4] for i in range(len(d) - 3)} for d in docs
    ]
    out = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            m = len(sets[i] & sets[j])
            u = len(sets[i] | sets[j])
            if m > 0 and 1000 * m >= t1000 * u:
                a, b = int(ids[i]), int(ids[j])
                out.add((min(a, b), max(a, b)))
    return out


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(31)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789 "))
    docs = [
        "".join(rng.choice(letters, size=200)) for _ in range(80)
    ]
    # plant near-dups: copy with a small edit
    for i in range(12):
        docs.append(docs[i][:150] + docs[i][160:])
    ids = np.concatenate([np.arange(80), 900 + np.arange(12)])
    # shuffle row order so blocks are not id-sorted
    perm = np.random.default_rng(5).permutation(len(ids))
    return [docs[p] for p in perm], ids[perm], _brute(docs, ids, 500)


@pytest.mark.parametrize("dense_limit", [0, 10**9])
def test_jaccard_pairs_both_kernels(ray_session, corpus, dense_limit):
    import ray.data

    from parquet_go_ray.pipelines.dedup import jaccard_pairs

    docs, ids, truth = corpus
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": ids.astype(np.int64), "text": docs})
    ).repartition(4)
    got = jaccard_pairs(
        ds,
        threshold_millis=500,
        rows_per_block=24,
        dense_vocab_limit=dense_limit,
    ).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert (got["id_a"].to_numpy() < got["id_b"].to_numpy()).all()
    assert found == truth
    assert len(truth) >= 12  # the planted near-dups are in there


def test_jaccard_pairs_random_sweep(ray_session):
    """Seeded sweep over corpus shapes: doc counts around block
    boundaries, threshold extremes, duplicate runs — every config must
    match brute force exactly."""
    import ray.data

    from parquet_go_ray.pipelines.dedup import jaccard_pairs

    letters = np.array(list("abcdef "))
    for seed, n_docs, rpb, t1000 in [
        (1, 10, 4, 300),
        (2, 33, 8, 500),
        (3, 25, 25, 800),
        (4, 40, 7, 1000),
    ]:
        rng = np.random.default_rng(seed)
        docs = [
            "".join(rng.choice(letters, size=int(rng.integers(8, 60))))
            for _ in range(n_docs)
        ]
        # duplicate a few
        for i in range(min(4, n_docs // 3)):
            docs[n_docs - 1 - i] = docs[i]
        ids = rng.permutation(n_docs).astype(np.int64) * 7 + 3
        truth = _brute(docs, ids, t1000)
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": ids, "text": docs})
        ).repartition(3)
        got = jaccard_pairs(
            ds, threshold_millis=t1000, rows_per_block=rpb
        ).to_pandas()
        found = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
        assert found == truth, (seed, n_docs, rpb, t1000)
