"""The distributed near-dup pair join must be driver-free AND agree
exactly with the bounded broadcast path (round-2 verdict #1/#2):

- pair-set equality between the broadcast and fully distributed
  `minhash_lsh_pairs` paths on a planted corpus
- `_candidate_id_bloom` has no false negatives and a bounded FP rate
- `dedup_pipeline` (partitioned hash-join representative selection)
  matches a driver-side reference computation
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _corpus():
    rng = np.random.default_rng(42)
    docs = []
    for i in range(80):
        docs.append(" ".join(rng.choice(WORDS, size=40)))
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    # plant 12 near-duplicates: one word changed
    for i in range(12):
        words = docs[i].split()
        words[5] = "zulu"
        rows.append({"doc_id": 1000 + i, "text": " ".join(words)})
    # plant 6 exact duplicates
    for i in range(6):
        rows.append({"doc_id": 2000 + i, "text": docs[i]})
    return pd.DataFrame(rows)


@pytest.fixture()
def corpus(ray_session):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pandas(_corpus())), _corpus()


def _pair_frame(df: pd.DataFrame) -> set:
    return {
        (int(a), int(b), float(j))
        for a, b, j in zip(df["id_a"], df["id_b"], df[df.columns[2]])
    }


def test_distributed_pair_join_matches_broadcast(corpus, monkeypatch):
    from parquet_go_ray.pipelines import dedup

    ds, _ = corpus
    broadcast = dedup.minhash_lsh_pairs(ds, jaccard_threshold=0.6).to_pandas()
    assert len(broadcast) >= 12  # the planted near-dups are found
    monkeypatch.setattr(dedup, "BROADCAST_PAIR_LIMIT", 0)
    distributed = dedup.minhash_lsh_pairs(ds, jaccard_threshold=0.6).to_pandas()
    assert _pair_frame(broadcast) == _pair_frame(distributed)


def test_verified_near_dupes_distributed_path(corpus, monkeypatch):
    from parquet_go_ray.pipelines import dedup

    ds, _ = corpus
    broadcast = dedup.verified_near_dupes(ds, jaccard_threshold=0.5).to_pandas()
    monkeypatch.setattr(dedup, "BROADCAST_PAIR_LIMIT", 0)
    distributed = dedup.verified_near_dupes(ds, jaccard_threshold=0.5).to_pandas()
    assert _pair_frame(broadcast) == _pair_frame(distributed)
    assert len(broadcast) >= 12


def test_candidate_id_bloom_membership(ray_session):
    import ray
    import ray.data

    from parquet_go_ray.functions import hashing
    from parquet_go_ray.pipelines.dedup import _BLOOM_K, _candidate_id_bloom

    rng = np.random.default_rng(3)
    ids_a = rng.integers(0, 10**12, 5000).astype(np.int64)
    ids_b = ids_a + 1
    cand = ray.data.from_arrow(
        pa.table({"id_a": ids_a, "id_b": ids_b})
    )
    bitmap_ref, m_bits = _candidate_id_bloom(cand, len(ids_a))
    bitmap = ray.get(bitmap_ref)
    members = np.unique(np.concatenate([ids_a, ids_b])).view(np.uint64)
    # no false negatives, ever
    assert hashing.id_bloom_probe(bitmap, m_bits, _BLOOM_K, members).all()
    # false positives bounded (~1% at 10 bits/id; allow generous slack)
    probes = rng.integers(10**13, 10**14, 20000).astype(np.int64).view(np.uint64)
    fp = hashing.id_bloom_probe(bitmap, m_bits, _BLOOM_K, probes).mean()
    assert fp < 0.05, fp


def test_dedup_pipeline_matches_reference(corpus):
    from parquet_go_ray.pipelines import dedup

    ds, pdf = corpus
    got = dedup.dedup_pipeline(ds, jaccard_threshold=0.6).to_pandas()

    # reference: collapse exact dups (keep min id), then the pairs must
    # be among representatives only
    reps = set(pdf.groupby("text")["doc_id"].min())
    pair_ids = set(got["id_a"]) | set(got["id_b"])
    assert pair_ids <= reps
    # doc_id 2000+i are exact copies of 0..5 -> never representatives
    assert not any(i >= 2000 for i in pair_ids)
    # the planted near-dups survive the exact-dedup stage and are found
    found = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert {(i, 1000 + i) for i in range(12)} <= found


def test_winnow_fingerprints_properties():
    from parquet_go_ray.functions import hashing

    base = ("the quick brown fox jumps over the lazy dog " * 30).encode()
    near = base.replace(b"lazy", b"calm")  # one token changed
    far = ("completely different content with other words " * 30).encode()
    fps = hashing.winnow_fingerprints([base, base, near, far, b"", b"tiny"])
    # identical docs -> identical fingerprint sets and digests
    assert np.array_equal(fps[0], fps[1])
    d = hashing.winnow_digest(fps)
    assert d[0] == d[1]
    # near-duplicates share most fingerprints, unrelated docs few
    inter = len(np.intersect1d(fps[0], fps[2]))
    union = len(np.union1d(fps[0], fps[2]))
    assert inter / union > 0.5, (inter, union)
    far_j = len(np.intersect1d(fps[0], fps[3])) / len(np.union1d(fps[0], fps[3]))
    assert far_j < 0.1, far_j
    # empty and shorter-than-k docs don't crash (the shingle kernel
    # pads them to one window, same as the MinHash path)
    assert len(fps[4]) == 1 and len(fps[5]) >= 1
    # fingerprints are a small subset of all windows (the point of
    # winnowing: ~2/(w+1) density)
    assert len(fps[0]) < (len(base) - 8 + 1) / 4


def test_content_hash128_batch_kernel():
    """The exact-dedup key: two independent XXH64 passes, equal texts
    collide on both words, distinct texts (whp) on neither, and the
    C kernel agrees with the scalar spec fallback."""
    from parquet_go_ray.codecs.sbbf import _xxh64_py
    from parquet_go_ray.functions import hashing

    texts = [b"hello", b"world", b"", b"hello", b"y" * 100]
    h1, h2 = hashing.content_hash128(texts)
    assert h1[0] == h1[3] and h2[0] == h2[3]
    assert len({(a, b) for a, b in zip(h1.tolist(), h2.tolist())}) == 4
    assert h1[1] == _xxh64_py(b"world")
    assert h2[1] == _xxh64_py(b"world\x01")
    # the two words are NOT derived from each other: a h1 collision
    # planted by construction must not force a h2 collision
    assert h2[0] != hashing.content_hash128([b"world"])[1][0]


def test_minhash_native_matches_numpy():
    """The fused C shingle+minhash kernel is bit-identical to the numpy
    reduceat path, including the short-doc padded-window quirk."""
    import numpy as np

    from parquet_go_ray.codecs import native
    from parquet_go_ray.functions import hashing

    texts = [
        (f"doc {i} words {i % 7} " * (1 + i % 13)).encode() for i in range(500)
    ] + [b"", b"a", b"ab", b"abc", b"abcd", b"\x00" * 9, bytes(range(256))]
    if native.load("_hash_native.c") is None:
        import pytest

        pytest.skip("no compiler: only the numpy path exists")
    nat = hashing.minhash_signatures(texts, k=4, num_perm=64)
    saved = dict(native._LIBS)
    try:
        native._LIBS["_hash_native.c"] = False
        ref = hashing.minhash_signatures(texts, k=4, num_perm=64)
    finally:
        native._LIBS.update(saved)
    assert np.array_equal(nat, ref)


def test_hashes_independent_of_batch_composition():
    """A doc's MinHash/SimHash must not depend on which other docs share
    its batch — Ray's block layout varies with parallelism, so any
    neighbor leakage makes pair outputs nondeterministic across runs.
    Regression: shingle windows used to read past a short doc's end into
    the next doc's bytes, and simhash's reduceat dropped the last token
    of a doc followed by an empty doc."""
    from parquet_go_ray.codecs import native
    from parquet_go_ray.functions import hashing

    docs = [b"abc", b"", b"a", b"hello world " * 3, b"\x00\x01", b"tail doc"]

    def check(fn):
        batched = fn(docs)
        for i, d in enumerate(docs):
            alone = fn([d])
            assert np.array_equal(batched[i], alone[0]), (fn.__name__, i)

    check(lambda t: hashing.minhash_signatures(t, k=4, num_perm=16))
    check(hashing.simhash64)
    check(lambda t: hashing.winnow_digest(hashing.winnow_fingerprints(t)))
    if native.load("_hash_native.c") is not None:
        saved = dict(native._LIBS)
        try:
            native._LIBS["_hash_native.c"] = False
            check(lambda t: hashing.minhash_signatures(t, k=4, num_perm=16))
        finally:
            native._LIBS.update(saved)


def test_pair_output_independent_of_block_layout(corpus):
    """The near-dup pair SET must not change with how Ray blocks the
    input (parallelism level / block boundaries) — the end-to-end
    guarantee behind the per-doc hash determinism fix."""
    from parquet_go_ray.pipelines import dedup

    ds, _ = corpus
    outs = []
    for nblocks in (1, 3, 7):
        pairs = dedup.minhash_lsh_pairs(
            ds.repartition(nblocks), jaccard_threshold=0.6
        ).to_pandas()
        outs.append(_pair_frame(pairs))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) >= 12


def test_sig_cache_resume(ray_session, tmp_path):
    """sig_cache_dir makes the MinHash signature pass resumable: a rerun
    reloads the persisted table instead of re-hashing the corpus; a
    parameter mismatch or missing completion marker recomputes."""
    import os

    import ray.data

    from parquet_go_ray.pipelines import dedup

    ds = ray.data.from_pandas(_corpus())
    cache = str(tmp_path / "sigs")
    p1 = dedup.minhash_lsh_pairs(
        ds, jaccard_threshold=0.6, sig_cache_dir=cache
    ).to_pandas()
    assert os.path.exists(os.path.join(cache, "_SIGS_DONE.json"))

    # second run must NOT hash the corpus: feed a dataset that would
    # KeyError if the sig stage actually mapped it — only the cached
    # table can produce a result
    bogus = ray.data.from_pandas(pd.DataFrame({"other": [1]}))
    sigs = dedup._minhash_sig_table(
        bogus, "text", "doc_id", 4, 64, sig_cache_dir=cache
    )
    assert sigs.count() == len(_corpus())
    p2 = dedup.minhash_lsh_pairs(
        ds, jaccard_threshold=0.6, sig_cache_dir=cache
    ).to_pandas()
    assert _pair_frame(p1) == _pair_frame(p2)

    # parameter mismatch -> stale cache ignored and rewritten
    sigs = dedup._minhash_sig_table(ds, "text", "doc_id", 5, 32, sig_cache_dir=cache)
    assert len(sigs.take(1)[0]["sig"]) == 32 * 8
    # missing marker (crash mid-write) -> recompute
    os.remove(os.path.join(cache, "_SIGS_DONE.json"))
    sigs = dedup._minhash_sig_table(ds, "text", "doc_id", 4, 64, sig_cache_dir=cache)
    assert len(sigs.take(1)[0]["sig"]) == 64 * 8


def test_hll_within_error_bounds(ray_session):
    """HLL estimate stays within ~5% of the exact distinct count, and
    merged task registers equal a single-pass fold."""
    import duckdb
    import numpy as np

    from parquet_go_ray.pipelines.queries import q_distinct_count_hll

    est = int(q_distinct_count_hll("/root/testdata/sf0.001")["distinct_est"][0])
    exact = duckdb.sql(
        "SELECT count(DISTINCT text) FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) <= max(2, 0.05 * exact), (est, exact)


def test_curate_corpus_planted(ray_session):
    """Curation end-to-end on a planted corpus: short docs filtered,
    exact dups collapsed to min id, near-dups pair-broken (larger id
    dropped), everything else kept."""
    import pandas as pd

    import ray.data

    from parquet_go_ray.pipelines.dedup import curate_corpus

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy")
    docs = [
        {"doc_id": 0, "lang": "en", "text": base},          # keep (rep)
        {"doc_id": 1, "lang": "en", "text": base},          # exact dup of 0
        {"doc_id": 2, "lang": "en", "text": near},          # near-dup of 0
        {"doc_id": 3, "lang": "en", "text": "x"},           # too short
        {"doc_id": 4, "lang": "de", "text": "ganz anderer inhalt " * 12},
        {"doc_id": 5, "lang": "fr", "text": "contenu distinct aussi " * 12},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(docs))
    out = curate_corpus(
        ds, langs=("en", "de", "fr"), min_chars=50,
        jaccard_threshold=0.5, n_docs_hint=len(docs),
    )
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert kept == [0, 4, 5]


def test_curate_corpus_full_planted(ray_session):
    """The complete chain on a planted corpus: short docs filtered,
    exact dup collapsed, near-dup pair-broken, repeated tumbling
    blocks edited out of the survivors (brute-force text oracle), and
    the doc embedding the eval sentence decontaminated away."""
    import pandas as pd

    import ray.data

    from parquet_go_ray.pipelines.dedup import curate_corpus_full

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy")
    bench_sent = "eval answer alpha beta gamma delta epsilon zeta eta theta"
    uniq6 = " ".join(f"u6w{i}" for i in range(12))
    docs = [
        {"doc_id": 0, "lang": "en", "text": base},  # keep (rep)
        {"doc_id": 1, "lang": "en", "text": base},  # exact dup of 0
        {"doc_id": 2, "lang": "en", "text": near},  # near-dup of 0
        {"doc_id": 3, "lang": "en", "text": "x"},  # too short
        {"doc_id": 4, "lang": "de", "text": "ganz anderer inhalt " * 12},
        {"doc_id": 5, "lang": "fr", "text": "contenu distinct aussi " * 12},
        # embeds the eval sentence -> decontaminated away
        {"doc_id": 6, "lang": "en", "text": uniq6 + " " + bench_sent},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(docs))
    bench = ray.data.from_pandas(
        pd.DataFrame([{"doc_id": 100, "text": bench_sent}])
    )
    out = curate_corpus_full(
        ds, bench, langs=("en", "de", "fr"), min_chars=50,
        jaccard_threshold=0.5, n_docs_hint=len(docs),
    ).to_pandas()

    # brute-force passage oracle over the docs that survive dedup
    # (0, 4, 5, 6), in (doc, block) order; 6 then falls to decontam
    seen, expect = set(), {}
    for d in docs:
        if d["doc_id"] not in (0, 4, 5, 6):
            continue
        words = d["text"].split()
        kept = []
        for i in range(0, len(words), 8):
            blk = " ".join(words[i : i + 8])
            if blk not in seen:
                seen.add(blk)
                kept.append(blk)
        if kept:
            expect[d["doc_id"]] = " ".join(kept)
    expect.pop(6)

    got = dict(zip(out["doc_id"], out["text"]))
    assert got == expect
    # the repeated-period doc really was edited (sanity that the
    # passage stage did work, not just pass-through)
    assert expect[4] != docs[4]["text"].strip()


def test_passage_dup_stats_planted(ray_session):
    """Planted repeated-passage corpus: docs share an 8-word license
    block inside otherwise-unique text. Document-level exact dedup sees
    nothing (all texts distinct); passage stats must count exactly the
    windows covered by the shared block in each carrier doc, and docs
    with no shared passage must not appear at all."""
    import ray.data

    from parquet_go_ray.pipelines import dedup

    block = "all rights reserved see license file for details"  # 8 words
    uniq = [
        " ".join(f"u{d}w{i}" for i in range(20)) for d in range(4)
    ]
    docs = [
        # block at the start: windows fully inside the block = 1
        {"doc_id": 0, "text": block + " " + uniq[0]},
        # block in the middle of another doc
        {"doc_id": 1, "text": uniq[1] + " " + block + " " + uniq[2]},
        # no shared content
        {"doc_id": 2, "text": uniq[3]},
        # doc shorter than 8 words never produces windows
        {"doc_id": 3, "text": "tiny doc only"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(docs))
    out = (
        dedup.passage_dup_stats(ds, n_docs_hint=len(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # only the 8-word block window itself is shared (every other window
    # mixes in unique words)
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_dup_passages"].tolist() == [1, 1]


def test_passage_dedupe_planted(ray_session):
    """C4-style removal on a planted corpus: the globally-first carrier
    of the shared 8-word block keeps it, every later occurrence loses
    exactly that block, uniques and tail blocks survive, and a doc made
    entirely of the duplicated block vanishes. Verified against a
    brute-force python edit of the same rule, across two block
    layouts."""
    import ray.data

    from parquet_go_ray.pipelines import dedup

    block = "all rights reserved see license file for details"  # 8 words
    uniq = [" ".join(f"u{d}w{i}" for i in range(16)) for d in range(3)]
    docs = [
        {"doc_id": 0, "text": block + " " + uniq[0]},
        {"doc_id": 1, "text": uniq[1] + " " + block},
        {"doc_id": 2, "text": block},  # all blocks dropped -> vanishes
        {"doc_id": 3, "text": uniq[2]},
        {"doc_id": 4, "text": "tiny doc only"},
    ]

    # brute-force oracle: tumbling 8-word blocks, first (doc, idx) wins
    seen, expect = set(), {}
    for d in docs:
        words = d["text"].split(" ")
        kept = []
        for i in range(0, len(words), 8):
            blk = " ".join(words[i : i + 8])
            if blk not in seen:
                seen.add(blk)
                kept.append(blk)
        if kept:
            expect[d["doc_id"]] = " ".join(kept)

    for npart in (1, 3):
        ds = ray.data.from_pandas(pd.DataFrame(docs)).repartition(npart)
        out = dedup.passage_dedupe(ds, n_docs_hint=len(docs)).to_pandas()
        got = dict(zip(out["doc_id"], out["text"]))
        assert got == expect, f"npart={npart}"
    # doc 1's unique half starts mid-doc: its block boundaries differ
    # from doc 0's, so only the aligned duplicate block is removed
    assert expect[1].startswith("u1w0") and block not in expect[1]
    assert 2 not in expect


def test_passage_hashes_kernel():
    """passage_hashes slices windows from the original bytes: identical
    passages hash identically across docs and across batch layouts, and
    the hash equals XXH64 of the joined words."""
    import numpy as np

    from parquet_go_ray.codecs.sbbf import xxhash64
    from parquet_go_ray.functions.hashing import passage_hashes

    texts = [b"a b c d e f g h i j", b"x y z", b"", b"a b c d e f g h"]
    d, h = passage_hashes(texts, 8)
    assert d.tolist() == [0, 0, 0, 3]
    assert h[0] == h[3]  # same 8 words, different docs
    d1, h1 = passage_hashes([texts[3]], 8)  # batch independence
    assert h1[0] == h[3]
    ref = xxhash64(b"b c d e f g h i", np.array([0, 15], dtype=np.int64))[0]
    assert h[1] == ref


def test_decontaminate_planted(ray_session):
    """Eval-overlap counting: a corpus doc embedding a benchmark
    sentence mid-text reports exactly the sliding windows inside that
    sentence; clean docs report 0; docs under 8 words report 0; an
    empty benchmark side yields all zeros."""
    import ray.data

    from parquet_go_ray.pipelines import dedup

    bench_sent = "the quick brown fox jumps over the lazy dog tonight"  # 10 w
    uniq = [" ".join(f"c{d}w{i}" for i in range(12)) for d in range(3)]
    bench = ray.data.from_pandas(
        pd.DataFrame([{"doc_id": 0, "text": bench_sent}])
    )
    corpus = ray.data.from_pandas(
        pd.DataFrame(
            [
                # embeds the full benchmark sentence: its 3 sliding
                # 8-word windows all match
                {"doc_id": 10, "text": uniq[0] + " " + bench_sent + " " + uniq[1]},
                {"doc_id": 11, "text": uniq[2]},
                {"doc_id": 12, "text": "way too short"},
            ]
        )
    )
    out = (
        dedup.decontaminate(corpus, bench)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [10, 11, 12]
    assert out["n_contaminated"].tolist() == [3, 0, 0]

    empty_bench = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64), "text": []})
    )
    out2 = dedup.decontaminate(corpus, empty_bench).to_pandas()
    assert out2["n_contaminated"].tolist() == [0, 0, 0]


def test_block_hashes_kernel():
    """block_hashes cuts TUMBLING blocks (tail may be short; empty and
    whitespace-only docs produce none) and is batch-layout
    independent."""
    from parquet_go_ray.functions.hashing import block_hashes

    texts = [b"a b c d e f g h i j", b"", b"  ", b"a b c d e f g h"]
    d, b, h = block_hashes(texts, 8)
    assert d.tolist() == [0, 0, 3]
    assert b.tolist() == [0, 1, 0]
    assert h[0] == h[2]  # same first 8 words across docs
    d1, b1, h1 = block_hashes([texts[0]], 8)
    assert h1.tolist() == h[:2].tolist()  # layout independence
    # tail block of doc 0 is "i j", a different block than any 8-word one
    assert h[1] not in (h[0],)
