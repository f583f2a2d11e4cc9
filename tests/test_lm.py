"""Unigram LM scoring: kernel determinism and pipeline semantics on a
planted corpus (brute-force python oracle, block-layout independence)."""

import math

import numpy as np
import pandas as pd


def test_doc_token_hash_counts_kernel():
    from parquet_go_ray.codecs.sbbf import xxhash64
    from parquet_go_ray.pipelines.lm import _doc_token_hash_counts

    texts = [b"a b a a", b"", b"b c"]
    d, h, c = _doc_token_hash_counts(texts)
    assert d.tolist() == [0, 0, 2, 2]
    ha = xxhash64(b"a", np.array([0, 1], np.int64))[0]
    hb = xxhash64(b"b", np.array([0, 1], np.int64))[0]
    got = {(int(dd), int(hh)): int(cc) for dd, hh, cc in zip(d, h, c)}
    assert got[(0, int(ha))] == 3
    assert got[(0, int(hb))] == 1
    assert got[(2, int(hb))] == 1
    # batch independence: same doc alone gives the same rows
    d1, h1, c1 = _doc_token_hash_counts([texts[0]])
    assert sorted(zip(h1.tolist(), c1.tolist())) == sorted(
        (int(hh), int(cc)) for (dd, hh), cc in got.items() if dd == 0
    )


def test_unigram_logprob_planted(ray_session):
    import ray.data

    from parquet_go_ray.pipelines.lm import unigram_logprob_scores

    docs = [
        {"doc_id": 0, "text": "the the the cat"},
        {"doc_id": 1, "text": "the dog"},
        {"doc_id": 2, "text": ""},  # no tokens -> dropped
    ]
    # brute-force: counts over all 6 tokens
    toks = [t for d in docs for t in d["text"].split() if t]
    n = len(toks)
    cnt = {t: toks.count(t) for t in set(toks)}
    expect = {}
    for d in docs:
        ts = [t for t in d["text"].split() if t]
        if not ts:
            continue
        score = sum(math.log(n) - math.log(cnt[t]) for t in ts) / len(ts)
        expect[d["doc_id"]] = math.floor(score * 1e4 + 0.5)

    for npart in (1, 3):
        ds = ray.data.from_pandas(pd.DataFrame(docs)).repartition(npart)
        out = unigram_logprob_scores(ds).to_pandas()
        got = dict(zip(out["doc_id"], out["nll_e4"]))
        assert got == expect, f"npart={npart}"
