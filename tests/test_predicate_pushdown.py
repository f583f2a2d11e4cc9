"""Predicate pushdown operators over the encode store
(pipelines/decode.py): LIKE-style pattern search in the dictionary
domain (search_pattern), prefix stats-pruning on a clustered store
(never-opened files proven by chmod-000), IS NULL from null-count
statistics + header validity bitmaps (isnull_scan), and positional
proximity search (textindex.near_docs)."""

import os
import stat

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.pipelines.decode import isnull_scan, search_pattern
from parquet_go_ray.pipelines.encode import encode_job

SOURCES = [f"host{i}.example" for i in range(17)] + ["alpha.net", "beta.org"]


@pytest.fixture()
def pattern_store(tmp_path, ray_session):
    rng = np.random.default_rng(5)
    src = rng.choice(SOURCES, size=3000)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(3000, dtype=np.int64)),
            "source": pa.array(src),
            "n_chars": pa.array(rng.integers(1, 999, size=3000), pa.int64()),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=256, bloom_columns=())
    return out, t.to_pandas()


@pytest.mark.parametrize(
    "mode,needle,like",
    [
        ("prefix", "host1", lambda s: s.startswith("host1")),
        ("suffix", ".org", lambda s: s.endswith(".org")),
        ("contains", "lph", lambda s: "lph" in s),
        (
            "regex",
            r"^host1?[0-9]\.example$",
            lambda s: __import__("re").match(r"^host1?[0-9]\.example$", s)
            is not None,
        ),
    ],
)
def test_pattern_modes_match_pandas(pattern_store, mode, needle, like):
    out, df = pattern_store
    got = (
        search_pattern(out, "source", mode, needle, columns=["doc_id"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = df[df["source"].map(like)]["doc_id"].reset_index(drop=True)
    assert got["doc_id"].tolist() == want.tolist()


def test_pattern_no_match_empty(pattern_store):
    out, _ = pattern_store
    assert len(search_pattern(out, "source", "prefix", "zzz").to_pandas()) == 0


def test_pattern_prefix_prunes_clustered_store(tmp_path, ray_session):
    """On a store clustered by the column (here: one key range per input
    shard), prefix search must not OPEN shards outside [needle,
    next-prefix): chmod-000 every other shard directory and query."""
    letters = ["apple", "berry", "cedar", "delta"]
    paths = []
    for i, w in enumerate(letters):
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(i * 100, (i + 1) * 100, dtype=np.int64)
                ),
                "source": pa.array([f"{w}{j % 7}" for j in range(100)]),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=64, bloom_columns=())
    blocked = [
        os.path.join(out, "data", f"part{i}") for i in (0, 2, 3)
    ]
    for d in blocked:
        os.chmod(d, 0)
    try:
        got = (
            search_pattern(out, "source", "prefix", "berry", columns=["doc_id"])
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert got["doc_id"].tolist() == list(range(100, 200))
    finally:
        for d in blocked:
            os.chmod(d, stat.S_IRWXU)


@pytest.fixture()
def null_store(tmp_path, ray_session):
    """part0: mixed nulls; part1: lang entirely NULL; part2: no nulls."""
    tables = []
    paths = []
    for i in range(3):
        n = 300
        ids = np.arange(i * n, (i + 1) * n, dtype=np.int64)
        if i == 0:
            lang = [None if j % 5 == 0 else "en" for j in range(n)]
        elif i == 1:
            lang = [None] * n
        else:
            lang = ["de"] * n
        t = pa.table(
            {"doc_id": pa.array(ids), "lang": pa.array(lang, pa.string())}
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        tables.append(t)
        paths.append(p)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=64, bloom_columns=())
    df = pa.concat_tables(tables).to_pandas()
    return out, df


def test_isnull_scan_matches_pandas(null_store):
    out, df = null_store
    got = (
        isnull_scan(out, "lang", columns=["doc_id"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = df[df["lang"].isna()]["doc_id"].reset_index(drop=True)
    assert got["doc_id"].tolist() == want.tolist()


def test_isnull_scan_skips_null_free_shard(null_store):
    """part2 has n_null == 0 in every chunk: its files must never open."""
    out, df = null_store
    blocked = os.path.join(out, "data", "part2")
    os.chmod(blocked, 0)
    try:
        got = isnull_scan(out, "lang", columns=["doc_id"]).to_pandas()
        want = df[df["lang"].isna()]["doc_id"]
        assert sorted(got["doc_id"]) == sorted(want)
    finally:
        os.chmod(blocked, stat.S_IRWXU)


def test_isnull_scan_no_nulls_is_empty(pattern_store):
    out, _ = pattern_store
    assert len(isnull_scan(out, "source").to_pandas()) == 0


def test_topk_store_pruned_clustered(tmp_path, ray_session):
    """Top-k on a store clustered by the column: only the tail shards
    can contain the top 50, the rest chmod-000 and never open; ties at
    the boundary resolve by the tiebreak."""
    from parquet_go_ray.pipelines.decode import topk_store

    paths = []
    vals = np.repeat(np.arange(30), 25)  # 750 rows, 0..29, many ties
    for i in range(3):
        sl = vals[i * 250 : (i + 1) * 250]
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(i * 250, (i + 1) * 250, dtype=np.int64)
                ),
                "v": pa.array(sl, pa.int64()),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=64, bloom_columns=())
    blocked = [os.path.join(out, "data", f"part{i}") for i in (0, 1)]
    for d in blocked:
        os.chmod(d, 0)
    try:
        got = topk_store(out, "v", 50, tiebreak="doc_id").to_pandas()
    finally:
        for d in blocked:
            os.chmod(d, stat.S_IRWXU)
    df = pa.table(
        {"doc_id": np.arange(750, dtype=np.int64), "v": vals}
    ).to_pandas()
    want = df.sort_values(
        ["v", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(50)
    assert got["v"].tolist() == want["v"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_topk_store_unclustered_matches(tmp_path, ray_session):
    from parquet_go_ray.pipelines.decode import topk_store

    rng = np.random.default_rng(3)
    v = rng.integers(0, 10_000, 1200)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(1200, dtype=np.int64)),
            "v": pa.array(v, pa.int64()),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=128, bloom_columns=())
    got = topk_store(out, "v", 37, tiebreak="doc_id").to_pandas()
    want = (
        t.to_pandas()
        .sort_values(["v", "doc_id"], ascending=[False, True])
        .head(37)
    )
    assert got["v"].tolist() == want["v"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_topk_store_edges(tmp_path, ray_session):
    """k larger than the table and NULL values in the rank column."""
    from parquet_go_ray.pipelines.decode import topk_store

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(20, dtype=np.int64)),
            "v": pa.array(
                [None if i % 4 == 0 else i for i in range(20)], pa.int64()
            ),
        }
    )
    p = str(tmp_path / "in.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "store")
    encode_job([p], out, rows_per_chunk=8, bloom_columns=())
    got = topk_store(out, "v", 100, tiebreak="doc_id").to_pandas()
    df = t.to_pandas()
    want = (
        df[df["v"].notna()]
        .sort_values(["v", "doc_id"], ascending=[False, True])
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()  # nulls drop
    got3 = topk_store(out, "v", 3, tiebreak="doc_id").to_pandas()
    assert got3["v"].tolist() == [19, 18, 17]


def test_take_rows_scattered(tmp_path, ray_session):
    """Positional take across a 3-shard store: values, _row labels,
    dedup, out-of-range, and never-opened shards (chmod-000)."""
    from parquet_go_ray.pipelines.decode import take_rows

    rng = np.random.default_rng(13)
    paths = []
    for i in range(3):
        n = 250
        t = pa.table(
            {
                "val": pa.array(
                    np.arange(i * n, (i + 1) * n, dtype=np.int64) * 10
                ),
                "tag": pa.array([f"s{i}"] * n),
            }
        )
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=64, bloom_columns=())
    # global order = (part0 rows, part1 rows, part2 rows)
    idx = [0, 5, 5, 249, 250, 400, 749]
    got = (
        take_rows(out, idx)
        .to_pandas()
        .sort_values("_row", ignore_index=True)
    )
    want = sorted(set(idx))
    assert got["_row"].tolist() == want
    assert got["val"].tolist() == [i * 10 for i in want]
    with pytest.raises(IndexError):
        take_rows(out, [750])
    with pytest.raises(IndexError):
        take_rows(out, [-1])
    # indices only in shard 1 -> shards 0 and 2 never open
    blocked = [os.path.join(out, "data", f"part{i}") for i in (0, 2)]
    for d in blocked:
        os.chmod(d, 0)
    try:
        got = take_rows(out, [260, 300, 499]).to_pandas()
        assert sorted(got["val"]) == [2600, 3000, 4990]
    finally:
        for d in blocked:
            os.chmod(d, stat.S_IRWXU)


def test_phrase_and_near_random_sweep(tmp_path, ray_session):
    """Randomized corpus, many queries, one index build: every phrase
    (2-4 tokens) and proximity query must match the brute-force oracle
    computed from the raw texts."""
    from parquet_go_ray.pipelines.textindex import (
        build_text_index,
        near_docs,
        phrase_docs,
    )

    rng = np.random.default_rng(77)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab -> dense collisions
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 25)))
        for _ in range(300)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "idx")
    build_text_index([p], out, num_buckets=4, rows_per_chunk=256)

    toks = [s.split(" ") for s in texts]
    for trial in range(12):
        k = int(rng.integers(2, 5))
        phrase = list(rng.choice(vocab, size=k))
        want = {
            i
            for i, tt in enumerate(toks)
            if any(
                tt[j : j + k] == phrase for j in range(len(tt) - k + 1)
            )
        }
        got = set(
            phrase_docs(out, " ".join(phrase)).to_pandas()["doc_id"]
        )
        assert got == want, f"phrase {phrase}"
    for trial in range(8):
        a, b = rng.choice(vocab, size=2, replace=False)
        w = int(rng.integers(1, 6))
        want = set()
        for i, tt in enumerate(toks):
            pa_pos = [j for j, x in enumerate(tt) if x == a]
            pb_pos = [j for j, x in enumerate(tt) if x == b]
            if any(
                abs(x - y) <= w for x in pa_pos for y in pb_pos
            ):
                want.add(i)
        got = set(near_docs(out, a, b, window=w).to_pandas()["doc_id"])
        assert got == want, f"near {a} {b} w={w}"


def test_near_docs_planted(tmp_path, ray_session):
    from parquet_go_ray.pipelines.textindex import build_text_index, near_docs

    texts = [
        "a x b",  # 0: gap 2
        "a b",  # 1: gap 1
        "a x x x x b",  # 2: gap 5
        "b x a",  # 3: gap 2, reversed order
        "a x x x b x x a",  # 4: min gap 3 (the SECOND a)
        "a only here",  # 5: b absent
        "x b x",  # 6: a absent
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "idx")
    build_text_index([p], out, num_buckets=4, rows_per_chunk=512)
    for window, want in [(1, {1}), (2, {0, 1, 3}), (3, {0, 1, 3, 4})]:
        got = set(near_docs(out, "a", "b", window=window).to_pandas()["doc_id"])
        assert got == want, window
