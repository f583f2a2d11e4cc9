"""CountMin heavy-hitter vocabulary: the sketch path must return the
EXACT top-k on a corpus big enough that candidate pruning, the CMS
estimate ordering, and the two-level partial fold all actually engage
(50k distinct tokens >> cand_cap)."""

import collections

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def zipf_corpus():
    rng = np.random.default_rng(23)
    vocab = np.array([f"tok{i:05d}" for i in range(50_000)], dtype=object)
    # Zipf draws: heavy head, long tail
    draws = rng.zipf(1.3, size=400_000)
    draws = draws[draws <= len(vocab)] - 1
    tokens = vocab[draws]
    docs = [
        " ".join(tokens[i : i + 40]) for i in range(0, len(tokens) - 40, 40)
    ]
    truth = collections.Counter(tokens[: len(docs) * 40 + 0])
    # recompute truth over exactly the words in the docs
    truth = collections.Counter(
        w for d in docs for w in d.split(" ") if w
    )
    return docs, truth


def test_heavy_hitters_exact_topk(ray_session, zipf_corpus):
    import ray.data

    from parquet_go_ray.pipelines.vocab import heavy_hitter_tokens

    docs, truth = zipf_corpus
    ds = ray.data.from_pandas(pd.DataFrame({"text": docs})).repartition(16)
    k = 50
    got = heavy_hitter_tokens(ds, k=k, cand_cap=1024)
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert list(zip(got["token"], got["cnt"])) == [
        (t, int(c)) for t, c in expect
    ]


def test_heavy_hitters_empty(ray_session):
    import ray.data

    from parquet_go_ray.pipelines.vocab import heavy_hitter_tokens

    ds = ray.data.from_pandas(pd.DataFrame({"text": ["", "", ""]}))
    got = heavy_hitter_tokens(ds, k=10)
    assert len(got) == 0
    assert list(got.columns) == ["token", "cnt"]
