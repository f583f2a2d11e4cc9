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
