"""BPE tokenizer training (pipelines/lm.py): the distributed
word-frequency + driver merge-loop trainer must agree pair-for-pair
with a from-scratch reference implementation, stay layout-independent,
and the actor-pool applier must count exactly what direct encoding
counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from parquet_go_ray.pipelines.lm import (
    _bpe_encode_word,
    bpe_token_counts,
    train_bpe,
    word_frequencies,
)


def _reference_bpe(texts, n_merges):
    """Independent from-scratch BPE: same semantics, different code
    shape (dict-of-lists instead of tuple-keyed vocab)."""
    freq = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    seqs = {w: list(w) + ["</w>"] for w in freq}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, sym in seqs.items():
            n = freq[w]
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        for w, sym in seqs.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            seqs[w] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low new wide bird bird",
    "",
    "bird",
]


def _write(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    return p


def test_train_matches_reference(tmp_path, ray_session):
    import ray.data

    p = _write(tmp_path, TEXTS)
    wf = word_frequencies(ray.data.read_parquet(p))
    got = train_bpe(wf, n_merges=20)
    want = _reference_bpe(TEXTS, 20)
    assert got == want


def test_train_layout_independent(tmp_path, ray_session):
    import ray.data

    p = _write(tmp_path, TEXTS)
    wf1 = word_frequencies(ray.data.read_parquet(p))
    shuf = list(TEXTS)[::-1]
    t2 = pa.table(
        {
            "doc_id": pa.array(np.arange(len(shuf), dtype=np.int64)),
            "text": pa.array(shuf),
        }
    )
    q = str(tmp_path / "docs2.parquet")
    pq.write_table(t2, q, row_group_size=2)
    wf2 = word_frequencies(ray.data.read_parquet(q))
    assert train_bpe(wf1, 16) == train_bpe(wf2, 16)


def test_apply_counts_match_direct_encoding(tmp_path, ray_session):
    import ray.data

    p = _write(tmp_path, TEXTS)
    ds = ray.data.read_parquet(p)
    wf = word_frequencies(ray.data.read_parquet(p))
    merges = train_bpe(wf, 12)
    got = (
        bpe_token_counts(ds, merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    want = [
        sum(len(_bpe_encode_word(w, ranks)) for w in t.split(" ") if w)
        for t in TEXTS
    ]
    assert got["n_bpe_tokens"].tolist() == want
    # merged symbols actually shrink sequences vs characters
    char_len = [sum(len(w) + 1 for w in t.split(" ") if w) for t in TEXTS]
    assert sum(got["n_bpe_tokens"]) < sum(char_len)
