"""Positive exercise of the embedding near-pair path: the driver
testdata embeddings are near-orthogonal (0 pairs is correct there), so
this plants true near-duplicates and checks LSH recovers them."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def planted(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # plant 20 near-duplicates: ids 1000+i is a slightly-perturbed copy of i
    dups = base[:20] + rng.standard_normal((20, 32)) * 0.02
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    vecs = np.concatenate([base, dups])
    ids = np.concatenate([np.arange(200), 1000 + np.arange(20)])
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
        }
    )
    return ray.data.from_arrow(t)


def test_lsh_near_pairs_finds_planted(planted):
    from parquet_go_ray.pipelines.similarity import lsh_near_pairs

    df = lsh_near_pairs(
        planted, cos_threshold=0.98, n_planes=8
    ).to_pandas()
    found = {
        (int(a), int(b)) for a, b in zip(df["id_a"], df["id_b"])
    }
    planted_pairs = {(i, 1000 + i) for i in range(20)}
    recovered = planted_pairs & found
    # LSH is approximate: require high recall, not perfection
    assert len(recovered) >= 15, (len(recovered), sorted(found)[:10])
    # and no wildly-wrong pairs: every found pair must truly be close
    assert df["cos"].min() >= 0.98


def test_lsh_banded_or_amplification(planted):
    """OR-amplified bands recover MODERATE-cosine pairs a single
    12-plane band structurally misses: a pair at cos ~0.57 collides on
    all 12 planes with prob ~0.006, but collides in at least one of 16
    4-plane bands with prob ~0.93. Verify (a) banding finds pairs at a
    low threshold, (b) results are still exact-verified (no pair below
    the threshold), (c) cross-band duplicate candidates collapse to one
    output row per pair."""
    from parquet_go_ray.pipelines.similarity import lsh_near_pairs

    df = lsh_near_pairs(
        planted, cos_threshold=0.98, n_planes=4, n_bands=14
    ).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(df["id_a"], df["id_b"])}
    planted_pairs = {(i, 1000 + i) for i in range(20)}
    # 4-plane x 14-band recall for cos>=0.98 is ~1 - (1-0.92)^14 ~ 1.0
    assert len(planted_pairs & found) >= 19, sorted(found)[:10]
    assert df["cos"].min() >= 0.98
    # one row per pair despite each colliding in many bands
    assert not df.duplicated(["id_a", "id_b"]).any()


def test_brute_force_topk_exact(planted):
    from parquet_go_ray.pipelines.similarity import brute_force_topk

    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    out = brute_force_topk(planted, base[0], k=2)
    # vector 0 itself and its planted near-copy must be ranks 1 and 2
    assert set(out["vec_id"]) == {0, 1000}


def test_lsh_degenerate_bucket_bounded(ray_session):
    """A degenerate key (identical vectors all landing in one bucket)
    must be capped at MAX_BUCKET — skipped as a near-identical cluster —
    instead of exploding into O(b^2) pairs in one task (round-2 verdict
    #4). The pipeline completes and still finds pairs among the normal
    vectors."""
    import pyarrow as pa
    import ray.data

    from parquet_go_ray.pipelines import dedup
    from parquet_go_ray.pipelines.similarity import lsh_near_pairs

    rng = np.random.default_rng(7)
    n_degenerate = dedup.MAX_BUCKET + 500
    same = np.tile(rng.standard_normal(16), (n_degenerate, 1))
    normal = rng.standard_normal((50, 16))
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    planted = normal[:5] + rng.standard_normal((5, 16)) * 0.01
    vecs = np.concatenate([same, normal, planted])
    ids = np.arange(len(vecs))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
            }
        )
    )
    df = lsh_near_pairs(ds, cos_threshold=0.99, n_planes=6).to_pandas()
    # no pair touches the capped degenerate cluster
    assert not ((df["id_a"] < n_degenerate) | (df["id_b"] < n_degenerate)).any()
    # the planted near-dups among normal vectors are still found
    found = {(int(a), int(b)) for a, b in zip(df["id_a"], df["id_b"])}
    planted_pairs = {
        (n_degenerate + i, n_degenerate + 50 + i) for i in range(5)
    }
    assert len(planted_pairs & found) >= 4


def test_ivf_store_prunes_io(ray_session, tmp_path):
    """Non-probed cells are NEVER OPENED: chmod their shard files to 000
    and the probe-path query must still succeed (a single open() of a
    non-probed shard would raise PermissionError)."""
    import os
    from pathlib import Path

    import pyarrow as pa
    import ray.data

    from parquet_go_ray.pipelines.similarity import (
        build_ivf_store,
        brute_force_topk,
        ivf_probe_cells,
        ivf_topk_store,
    )

    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((2000, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(2000), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
            }
        )
    )
    store = str(tmp_path / "ivf")
    info = build_ivf_store(ds, store, n_centroids=8)
    assert info["rows"] == 2000
    assert info["cells"] >= 4  # spread over multiple cells

    query = vecs[7]
    probed = set(ivf_probe_cells(store, query, n_probe=3))
    shards = sorted(Path(store).glob("cell=*.parquet"))
    blocked = []
    for p in shards:
        cell = int(p.stem.split("=")[1])
        if cell not in probed:
            os.chmod(p, 0)
            blocked.append(p)
    assert blocked, "need at least one non-probed cell for the proof"
    try:
        out = ivf_topk_store(store, query, k=5, n_probe=3)
    finally:
        for p in blocked:
            os.chmod(p, 0o644)
    assert len(out) == 5
    # the query's own vector lives in a probed cell and must be rank 1
    assert int(out["vec_id"].iloc[0]) == 7
    # with 3/8 cells probed, the approximate top-5 should largely agree
    # with the exact answer
    exact = brute_force_topk(ds, query, k=5)
    assert len(set(out["vec_id"]) & set(exact["vec_id"])) >= 3


def test_ivf_topk_wrapper_routes_through_store(ray_session, tmp_path):
    """The non-store ivf_topk is a thin wrapper over the store path (one
    IVF code path): it builds the store on first call, reuses it on the
    second, and matches ivf_topk_store exactly."""
    import pyarrow as pa
    import ray.data

    from parquet_go_ray.pipelines.similarity import ivf_topk, ivf_topk_store

    rng = np.random.default_rng(41)
    vecs = rng.standard_normal((600, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(600), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
            }
        )
    )
    store = str(tmp_path / "ivf_w")
    out1 = ivf_topk(ds, vecs[3], k=4, n_centroids=6, n_probe=3, store_dir=store)
    assert int(out1["vec_id"].iloc[0]) == 3
    # second call must REUSE the existing store (mtime of meta unchanged)
    import os

    meta = os.path.join(store, "_ivf_meta.json")
    m0 = os.path.getmtime(meta)
    out2 = ivf_topk(ds, vecs[3], k=4, n_centroids=6, n_probe=3, store_dir=store)
    assert os.path.getmtime(meta) == m0
    direct = ivf_topk_store(store, vecs[3], k=4, n_probe=3)
    for df in (out1, out2):
        assert df[["vec_id", "rank"]].values.tolist() == direct[
            ["vec_id", "rank"]
        ].values.tolist()


def test_cosine_pairs_exact_and_layout_independent(planted):
    from parquet_go_ray.pipelines.similarity import cosine_pairs

    df = cosine_pairs(planted, threshold=0.9).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(df["id_a"], df["id_b"])}
    # exact: every planted pair (cos ~0.9995) is found, nothing else at 0.9
    assert {(i, 1000 + i) for i in range(20)} == found
    # blocked product must be layout-independent: force many tiny blocks
    df2 = cosine_pairs(planted, threshold=0.9, rows_per_block=16).to_pandas()
    found2 = {(int(a), int(b)) for a, b in zip(df2["id_a"], df2["id_b"])}
    assert found2 == found


def test_cosine_pairs_unsorted_blocks_and_nonunit_norms(ray_session):
    """Regression for two bugs the unit-norm, id-sorted fixtures masked:
    (1) a block coalesced from a parallel read is not id-sorted, and the
    same-block branch once emitted POSITION-ordered (id_a > id_b) pairs;
    (2) the same-block matmul once used the UNNORMALIZED matrix for the
    B side, so non-unit-norm vectors scaled the cosine."""
    import ray.data

    from parquet_go_ray.pipelines.similarity import cosine_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((120, 16))
    dups = base[:15] + rng.standard_normal((15, 16)) * 0.01
    vecs = np.concatenate([base, dups])
    # NON-unit norms: scale each vector by a random factor in [0.2, 5]
    vecs = vecs * rng.uniform(0.2, 5.0, size=(len(vecs), 1))
    ids = np.concatenate([np.arange(120), 500 + np.arange(15)])
    # shuffle row order so blocks are NOT id-sorted
    perm = rng.permutation(len(ids))
    t = pa.table(
        {
            "vec_id": pa.array(ids[perm], type=pa.int64()),
            "embedding": pa.array(list(vecs[perm]), type=pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t)
    nrm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    C = nrm @ nrm.T
    iu = np.triu_indices(len(vecs), 1)
    truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(*iu)
        if C[i, j] >= 0.95
    }
    got = cosine_pairs(ds, threshold=0.95, rows_per_block=32).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    assert (got["id_a"].to_numpy() < got["id_b"].to_numpy()).all()
    assert found == truth


def test_semantic_dedupe_drops_larger_ids(planted):
    from parquet_go_ray.pipelines.similarity import semantic_dedupe

    kept = set(
        semantic_dedupe(planted, threshold=0.9).to_pandas()["vec_id"]
    )
    # every planted dup (id 1000+i) is similar to its smaller base id
    assert kept == set(range(200))


class TestHashEmbeddings:
    """Hashing-trick text embeddings: deterministic, unit-norm, and
    cosine tracks shingle-profile similarity."""

    def test_kernel_properties(self):
        from parquet_go_ray.functions.hashing import hash_embeddings

        texts = [
            b"the quick brown fox jumps over the lazy dog",
            b"the quick brown fox jumps over the lazy dog",
            b"the quick brown fox jumps over the lazy cat",
            b"freight schedules for the northern rail corridor",
        ]
        m = hash_embeddings(texts)
        assert np.allclose(np.linalg.norm(m, axis=1), 1.0)
        assert m[0] @ m[1] > 0.999  # identical
        assert m[0] @ m[2] > 0.85  # one-word edit
        assert m[0] @ m[3] < 0.3  # unrelated
        # deterministic across calls and batch composition
        m2 = hash_embeddings(texts[2:])
        assert np.allclose(m[2], m2[0])

    def test_composed_pipeline_finds_planted_pairs(self, ray_session):
        import pyarrow as pa
        import ray.data

        from parquet_go_ray.pipelines.similarity import text_semantic_pairs

        rng = np.random.default_rng(8)
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        vocab = [
            "".join(rng.choice(letters, 6)) for _ in range(500)
        ]
        base = [
            " ".join(rng.choice(vocab, 40)) for _ in range(100)
        ]
        # plant near-dups: doc 1000+i = doc i with one token changed
        dups = [
            t.rsplit(" ", 1)[0] + " changed" for t in base[:10]
        ]
        t = pa.table(
            {
                "doc_id": pa.array(
                    list(range(100)) + list(range(1000, 1010)),
                    type=pa.int64(),
                ),
                "text": pa.array(base + dups),
            }
        )
        out = text_semantic_pairs(
            ray.data.from_arrow(t).repartition(8), threshold=0.8
        ).to_pandas()
        found = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}
        assert {(i, 1000 + i) for i in range(10)} <= found
        # nothing random crosses 0.8
        assert all(b - a == 1000 for a, b in found), sorted(found)[:5]


def test_ivf_store_salts_hot_cells(ray_session, tmp_path):
    """A skewed centroid cell splits into multiple bounded salt files
    (cell={c}+s{k}.parquet) at write time; the probe path reads salted
    and unsalted layouts identically, pruning still holds, and probing
    every cell reproduces the exact brute-force answer."""
    import os
    from pathlib import Path

    import pyarrow as pa
    import ray.data

    from parquet_go_ray.pipelines.similarity import (
        brute_force_topk,
        build_ivf_store,
        ivf_probe_cells,
        ivf_topk_store,
    )

    rng = np.random.default_rng(31)
    # 1200 vectors in a tight hot cluster + 300 spread elsewhere
    hot = rng.standard_normal((1, 12)) + rng.standard_normal((1200, 12)) * 0.05
    cold = rng.standard_normal((300, 12)) * 3.0
    vecs = np.concatenate([hot, cold])
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vecs)), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
            }
        )
    )
    store = str(tmp_path / "ivf_salted")
    info = build_ivf_store(ds, store, n_centroids=6, target_cell_rows=200)
    assert info["rows"] == len(vecs)
    assert info["files"] > info["cells"]  # at least one cell salted
    salted = sorted(Path(store).glob("cell=*+s*.parquet"))
    assert len(salted) >= 2
    # every salt file respects the hash-width bound loosely (hash
    # spread, not an exact partitioner): no file holds the whole cell
    import pyarrow.parquet as pq

    assert all(pq.read_metadata(p).num_rows < 1200 for p in salted)

    # probing ALL cells over the salted layout is exact
    query = vecs[5]
    out = ivf_topk_store(store, query, k=7, n_probe=6)
    exact = brute_force_topk(ds, query, k=7)
    assert list(out["vec_id"]) == list(exact["vec_id"])

    # pruning proof still holds with salted shard names: chmod every
    # file of every non-probed cell to 000 and the query still runs
    probed = set(ivf_probe_cells(store, query, n_probe=2))
    blocked = []
    for p in Path(store).glob("cell=*.parquet"):
        cell = int(p.stem.split("=")[1].split("+")[0])
        if cell not in probed:
            os.chmod(p, 0)
            blocked.append(p)
    assert blocked
    try:
        out2 = ivf_topk_store(store, query, k=5, n_probe=2)
    finally:
        for p in blocked:
            os.chmod(p, 0o644)
    assert int(out2["vec_id"].iloc[0]) == 5


def test_pq_topk_recall_and_exact_degradation(ray_session):
    """PQ ADC + rerank: (a) with rerank >= corpus size the result is
    EXACTLY brute force (the rerank pass is an exact cosine over every
    candidate); (b) with a small rerank budget, recall@10 stays high on
    clustered data; (c) the codes really are n_sub bytes."""
    import ray.data

    from parquet_go_ray.pipelines.similarity import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
        _to_matrix,
    )

    rng = np.random.default_rng(7)
    # clustered corpus: 8 centers, 50 points each — the regime PQ codes
    # separate well
    centers = rng.standard_normal((8, 32)) * 3
    vecs = np.repeat(centers, 50, axis=0) + rng.standard_normal((400, 32))
    ids = np.arange(400)
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t)
    q = vecs[3]

    exact = brute_force_topk(ds, q, k=10)
    full = pq_topk(ds, q, k=10, n_sub=8, rerank=400, sample_rows=400)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), exact.reset_index(drop=True)
    )

    approx = pq_topk(ds, q, k=10, n_sub=8, rerank=40, sample_rows=400)
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.8, (recall, list(approx["vec_id"]))

    import ray as _ray

    books = train_pq_codebooks(_to_matrix(pd.Series(list(vecs))), n_sub=8)
    codes = pq_encode(ds, _ray.put(books), concurrency=2).to_pandas()
    assert codes.shape == (400, 2)
    assert all(len(c) == 8 for c in codes["code"])


def test_ivfpq_store_prunes_io_and_recalls(ray_session, tmp_path):
    """IVFPQ: (a) non-probed cells' CODE shards are never opened
    (chmod-000 proof, same protocol as the IVF store); (b) the store
    holds codes only (no raw vectors — the index is ~1/32 the column);
    (c) ADC + rerank recalls the exact top-k on clustered data; (d) a
    tiny target_cell_rows salts hot cells into multiple bounded shards
    that read identically."""
    import os
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as papq
    import ray.data

    from parquet_go_ray.pipelines.similarity import (
        brute_force_topk,
        build_ivfpq_store,
        ivfpq_topk_store,
    )

    rng = np.random.default_rng(29)
    centers = rng.standard_normal((8, 16)) * 3
    vecs = np.repeat(centers, 250, axis=0) + rng.standard_normal((2000, 16))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(2000), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
            }
        )
    )
    store = str(tmp_path / "ivfpq")
    info = build_ivfpq_store(ds, store, n_centroids=8, sample_rows=2000)
    assert info["rows"] == 2000
    assert info["cells"] >= 4

    shards = sorted(Path(store).glob("cell=*.parquet"))
    t0 = papq.read_table(shards[0])
    assert set(t0.column_names) == {"vec_id", "code"}  # codes only

    import json

    meta = json.loads((Path(store) / "_ivfpq_meta.json").read_text())
    cent = np.asarray(meta["centroids"])
    query = vecs[7]
    qn = query / np.linalg.norm(query)
    probed = set(
        int(c)
        for c in np.argsort(((cent - qn[None, :]) ** 2).sum(axis=1))[:3]
    )
    blocked = []
    for p in shards:
        cell = int(p.stem.split("=")[1].split("+")[0])
        if cell not in probed:
            os.chmod(p, 0)
            blocked.append(p)
    assert blocked
    try:
        out = ivfpq_topk_store(store, ds, query, k=5, n_probe=3, rerank=50)
    finally:
        for p in blocked:
            os.chmod(p, 0o644)
    assert len(out) == 5
    assert int(out["vec_id"].iloc[0]) == 7
    exact = brute_force_topk(ds, query, k=5)
    assert len(set(out["vec_id"]) & set(exact["vec_id"])) >= 3

    # (d) salting: tiny threshold -> multiple files per hot cell, same
    # answers
    salted = str(tmp_path / "ivfpq_salted")
    info2 = build_ivfpq_store(
        ds, salted, n_centroids=8, sample_rows=2000, target_cell_rows=100
    )
    assert info2["files"] > info2["cells"]
    assert any(Path(salted).glob("cell=*+s*.parquet"))
    out2 = ivfpq_topk_store(salted, ds, query, k=5, n_probe=8, rerank=2000)
    full = ivfpq_topk_store(store, ds, query, k=5, n_probe=8, rerank=2000)
    pd.testing.assert_frame_equal(
        out2.reset_index(drop=True), full.reset_index(drop=True)
    )


def test_ivfpq_append_and_compact(ray_session, tmp_path):
    """Incremental IVFPQ: (a) appended vectors are searchable with no
    reader change; (b) re-running the same append is a no-op
    (content-derived generation, already_applied); (c) compaction folds
    a cell's generation files into one and answers don't change; (d) an
    interrupted fold (intent file present, target present) recovers by
    finishing the unlinks."""
    import json
    from pathlib import Path

    import pyarrow as pa
    import ray.data

    from parquet_go_ray.pipelines.similarity import (
        build_ivfpq_store,
        ivfpq_append,
        ivfpq_compact,
        ivfpq_topk_store,
        _ivfpq_recover,
    )

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((4, 16)) * 3
    vecs = np.repeat(centers, 100, axis=0) + rng.standard_normal((400, 16))

    def mk(ids, m):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array(
                        list(m), type=pa.list_(pa.float64())
                    ),
                }
            )
        )

    store = str(tmp_path / "ivfpq")
    build_ivfpq_store(mk(np.arange(400), vecs), store, n_centroids=4,
                      sample_rows=400)

    # append: near-copies of vector 7, ids 9000+
    newv = vecs[7] + rng.standard_normal((5, 16)) * 0.01
    full_raw = mk(
        np.concatenate([np.arange(400), 9000 + np.arange(5)]),
        np.concatenate([vecs, newv]),
    )
    r1 = ivfpq_append(store, mk(9000 + np.arange(5), newv))
    assert r1["rows"] == 5 and not r1["already_applied"]
    out = ivfpq_topk_store(store, full_raw, vecs[7], k=6, n_probe=4,
                           rerank=400)
    assert 7 in set(out["vec_id"])
    assert len(set(out["vec_id"]) & set(9000 + np.arange(5))) >= 4

    # idempotent re-run
    r2 = ivfpq_append(store, mk(9000 + np.arange(5), newv))
    assert r2["generation"] == r1["generation"]
    assert r2["rows"] == 0 and r2["already_applied"]

    # second generation, then compact
    newv2 = vecs[7] + rng.standard_normal((3, 16)) * 0.01
    ivfpq_append(store, mk(9500 + np.arange(3), newv2))
    gen_files = list(Path(store).glob("cell=*+g*.parquet"))
    assert len(gen_files) >= 2
    before = ivfpq_topk_store(store, full_raw, vecs[7], k=6, n_probe=4,
                              rerank=400)
    res = ivfpq_compact(store)
    assert res["files_merged"] >= 2
    after = ivfpq_topk_store(store, full_raw, vecs[7], k=6, n_probe=4,
                             rerank=400)
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )

    # crash recovery: simulate a fold that committed its target but
    # died before the member unlinks — recover must finish them
    gens = sorted(p.name for p in Path(store).glob("cell=*+g*.parquet"))
    assert gens
    victim = gens[0]
    cell = victim.split("=")[1].split("+")[0]
    fake_target = f"cell={cell}+gdeadbeef.parquet"
    import shutil

    shutil.copy(Path(store) / victim, Path(store) / fake_target)
    intent = Path(store) / f"cell={cell}.members.json"

    # a fresh UNCOMMITTED intent (target missing) may belong to a live
    # fold that is still writing: default recover must not roll it back
    (Path(store) / fake_target).unlink()
    intent.write_text(
        json.dumps({"target": fake_target, "members": [victim]})
    )
    _ivfpq_recover(store)
    assert (Path(store) / victim).exists()
    assert intent.exists()
    # a STALE uncommitted intent rolls back: intent dropped, members kept
    _ivfpq_recover(store, min_age_s=0.0)
    assert (Path(store) / victim).exists()
    assert not intent.exists()

    # a COMMITTED fold (target present) finishes at ANY age — the same
    # guarded unlinks a live fold would do — and commits the target's
    # applied marker
    shutil.copy(Path(store) / victim, Path(store) / fake_target)
    intent.write_text(
        json.dumps({"target": fake_target, "members": [victim]})
    )
    _ivfpq_recover(store)
    assert not (Path(store) / victim).exists()
    assert (Path(store) / fake_target).exists()
    assert not intent.exists()
    assert (Path(store) / "_gen-deadbeef.applied").exists()


def _mk_vecs(ids, m):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(list(m), type=pa.list_(pa.float64())),
            }
        )
    )


def test_ivfpq_append_generation_distinguishes_content(ray_session, tmp_path):
    """The auto generation id must separate increments whose ids share
    (count, xor, sum) — e.g. {0,5} vs {1,4} — and re-appends of the
    SAME ids with different vector content (corrected embeddings)."""
    from parquet_go_ray.pipelines.similarity import (
        build_ivfpq_store,
        ivfpq_append,
        ivfpq_topk_store,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((100, 16))
    store = str(tmp_path / "ivfpq")
    build_ivfpq_store(
        _mk_vecs(np.arange(100, 200), base), store, n_centroids=2,
        sample_rows=100,
    )

    v = rng.standard_normal((2, 16))
    r1 = ivfpq_append(store, _mk_vecs(np.array([0, 5]), v))
    # {1,4} has the same count/xor/sum as {0,5}: must be a NEW generation
    r2 = ivfpq_append(store, _mk_vecs(np.array([1, 4]), v))
    assert r2["generation"] != r1["generation"]
    assert not r2["already_applied"] and r2["rows"] == 2
    # same ids, different vectors: also a new generation
    v2 = rng.standard_normal((2, 16))
    r3 = ivfpq_append(store, _mk_vecs(np.array([0, 5]), v2))
    assert r3["generation"] not in (r1["generation"], r2["generation"])
    # all four distinct ids are searchable
    full = _mk_vecs(
        np.concatenate([np.arange(100, 200), [0, 5, 1, 4]]),
        np.concatenate([base, v, v]),
    )
    out = ivfpq_topk_store(store, full, v[0], k=4, n_probe=2, rerank=300)
    assert {0, 1} <= set(out["vec_id"])


def test_ivfpq_append_replay_after_compact_skips(ray_session, tmp_path):
    """A crash-retry replaying an already-applied append AFTER a
    compaction folded its generation files away must skip (the
    `_gen-*.applied` marker outlives the files), not re-land rows."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from parquet_go_ray.pipelines.similarity import (
        build_ivfpq_store,
        ivfpq_append,
        ivfpq_compact,
    )

    rng = np.random.default_rng(9)
    base = rng.standard_normal((100, 16))
    store = str(tmp_path / "ivfpq")
    build_ivfpq_store(
        _mk_vecs(np.arange(100), base), store, n_centroids=2,
        sample_rows=100,
    )
    v1 = rng.standard_normal((4, 16))
    v2 = rng.standard_normal((3, 16))
    r1 = ivfpq_append(store, _mk_vecs(1000 + np.arange(4), v1))
    ivfpq_append(store, _mk_vecs(2000 + np.arange(3), v2))
    ivfpq_compact(store)

    def store_rows():
        return sum(
            pq.read_table(p).num_rows
            for p in Path(store).glob("cell=*.parquet")
        )

    n = store_rows()
    replay = ivfpq_append(store, _mk_vecs(1000 + np.arange(4), v1))
    assert replay["already_applied"] and replay["rows"] == 0
    assert replay["generation"] == r1["generation"]
    assert store_rows() == n


def test_ivf_rebuild_clears_stale_shards(ray_session, tmp_path):
    """Rebuilding a store into the same directory must not leave prior
    shards behind: salting makes names layout-dependent, so a shrunken
    rebuild would otherwise serve duplicated/deleted vectors."""
    from pathlib import Path

    from parquet_go_ray.pipelines.similarity import (
        build_ivf_store,
        ivf_topk_store,
    )

    rng = np.random.default_rng(3)
    big = rng.standard_normal((3000, 8))
    store = str(tmp_path / "ivf")
    # force salting: tiny per-cell row target
    build_ivf_store(
        _mk_vecs(np.arange(3000), big), store, n_centroids=2,
        sample_rows=3000, target_cell_rows=500,
    )
    assert any("+s" in p.name for p in Path(store).glob("cell=*.parquet"))
    # shrink + rebuild unsalted into the SAME dir with fresh ids
    small = rng.standard_normal((50, 8))
    build_ivf_store(
        _mk_vecs(9000 + np.arange(50), small), store, n_centroids=2,
        sample_rows=50,
    )
    assert not any("+s" in p.name for p in Path(store).glob("cell=*.parquet"))
    out = ivf_topk_store(store, small[0], k=5, n_probe=2)
    ids = set(int(i) for i in out["vec_id"])
    assert ids <= set(range(9000, 9050)), f"stale ids leaked: {ids}"


def test_ivfpq_store_layout_independent(ray_session, tmp_path):
    """Shuffled (non-id-sorted) input blocks must not change WHAT the
    IVFPQ store can find: planted near-duplicates of the query are
    recovered regardless of row order (id-sorted testdata masks
    order sensitivity in the sample/assign/write path)."""
    from parquet_go_ray.pipelines.similarity import (
        build_ivfpq_store,
        ivfpq_topk_store,
    )

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((4, 16)) * 3
    vecs = np.repeat(centers, 150, axis=0) + rng.standard_normal((600, 16))
    # plant 5 near-copies of vector 10, ids 9000+
    planted = vecs[10] + rng.standard_normal((5, 16)) * 0.01
    ids = np.concatenate([np.arange(600), 9000 + np.arange(5)])
    allv = np.concatenate([vecs, planted])
    perm = rng.permutation(len(ids))

    store = str(tmp_path / "ivfpq")
    full = _mk_vecs(ids[perm], allv[perm])
    build_ivfpq_store(
        full.repartition(7), store, n_centroids=4, sample_rows=605
    )
    out = ivfpq_topk_store(
        store, _mk_vecs(ids, allv), vecs[10], k=6, n_probe=4, rerank=600
    )
    got = set(int(i) for i in out["vec_id"])
    assert 10 in got
    assert len(got & set(9000 + np.arange(5))) >= 4, got


def test_ivfpq_append_generation_batch_layout_independent(
    ray_session, tmp_path
):
    """The auto generation id must depend only on CONTENT, not on how
    the increment is batched/partitioned (mixed-dtype partials once
    unified to float64 and truncated, making the id layout-dependent).
    Also: empty blocks in the increment must not crash the digest."""
    from parquet_go_ray.pipelines.similarity import (
        build_ivfpq_store,
        ivfpq_append,
    )

    rng = np.random.default_rng(21)
    base = rng.standard_normal((100, 16))
    store = str(tmp_path / "ivfpq")
    build_ivfpq_store(
        _mk_vecs(np.arange(100), base), store, n_centroids=2,
        sample_rows=100,
    )
    # huge ids exercise digests on both sides of 2^63 across batches
    ids = np.array([2**62, 2**63 - 7, 2**61 + 3, 5, 17, 2**60], dtype=np.int64)
    v = rng.standard_normal((6, 16))
    r1 = ivfpq_append(store, _mk_vecs(ids, v).repartition(1))
    # same content, different layout (one row per block + an empty
    # block from a none-matching filter) -> SAME generation
    inc = _mk_vecs(ids, v).repartition(6)
    r2 = ivfpq_append(store, inc)
    assert r2["generation"] == r1["generation"]
    assert r2["already_applied"]
    with_empty = _mk_vecs(ids, v).filter(lambda row: row["vec_id"] != -1)
    r3 = ivfpq_append(store, with_empty.repartition(8))
    assert r3["generation"] == r1["generation"] and r3["already_applied"]


def test_ivfpq_compact_skips_uncommitted_generation(ray_session, tmp_path):
    """Generation files whose append crashed before its commit marker
    must NOT be folded (the retry resume-skips on those files — folding
    them away would make the retry re-land every row as a duplicate).
    After the retry commits, compaction folds them normally. Markers
    consolidate into _gens.json and replays still skip."""
    import json
    import pyarrow.parquet as pq
    from pathlib import Path

    from parquet_go_ray.pipelines.similarity import (
        build_ivfpq_store,
        ivfpq_append,
        ivfpq_compact,
    )

    rng = np.random.default_rng(33)
    base = rng.standard_normal((100, 16))
    store = str(tmp_path / "ivfpq")
    build_ivfpq_store(
        _mk_vecs(np.arange(100), base), store, n_centroids=2,
        sample_rows=100,
    )
    v1 = rng.standard_normal((4, 16))
    v2 = rng.standard_normal((3, 16))
    r1 = ivfpq_append(store, _mk_vecs(1000 + np.arange(4), v1))
    r2 = ivfpq_append(store, _mk_vecs(2000 + np.arange(3), v2))

    # simulate r2's append having crashed before its commit point:
    # files on disk, marker gone
    root = Path(store)
    (root / f"_gen-{r2['generation']}.applied").unlink()
    res = ivfpq_compact(store)
    # r2's files must be untouched; only gens with >1 file per cell
    # fold, and r2 is excluded, so nothing should have merged r2's
    remaining = {
        p.name for p in root.glob(f"cell=*+g{r2['generation']}.parquet")
    }
    assert remaining, "uncommitted generation files were folded away"

    def store_rows():
        return sum(
            pq.read_table(p).num_rows
            for p in root.glob("cell=*.parquet")
        )

    n = store_rows()
    # the crash-retry resume-skips files in place and lands the marker
    r2b = ivfpq_append(store, _mk_vecs(2000 + np.arange(3), v2))
    assert r2b["generation"] == r2["generation"]
    assert store_rows() == n  # no duplicate rows
    # now committed: a second compact may fold it, and markers
    # consolidate into the ledger
    ivfpq_compact(store)
    ledger = root / "_gens.json"
    assert ledger.exists()
    gens = set(json.loads(ledger.read_text()))
    assert {r1["generation"], r2["generation"]} <= gens
    assert not list(root.glob("_gen-*.applied"))
    # replays keep skipping off the ledger alone
    r1c = ivfpq_append(store, _mk_vecs(1000 + np.arange(4), v1))
    assert r1c["already_applied"] and store_rows() == n


def test_vector_cli_smoke(ray_session, tmp_path):
    """The `vector` CLI verb drives the full ANN store lifecycle:
    build (IVFPQ) -> append -> compact -> search, each emitting one
    JSON line."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    rng = np.random.default_rng(77)
    base = rng.standard_normal((300, 16))
    planted = base[3] + rng.standard_normal((4, 16)) * 0.01
    raw = tmp_path / "raw"
    raw.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(300), type=pa.int64()),
                "embedding": pa.array(
                    list(base), type=pa.list_(pa.float64())
                ),
            }
        ),
        raw / "part0.parquet",
    )
    inc = tmp_path / "inc"
    inc.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(9000 + np.arange(4), type=pa.int64()),
                "embedding": pa.array(
                    list(planted), type=pa.list_(pa.float64())
                ),
            }
        ),
        inc / "part0.parquet",
    )
    store = str(tmp_path / "store")

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "parquet_go_ray", "--num-cpus", "4",
             "vector", *argv],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-800:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    built = run("build", store, str(raw), "--pq", "--centroids", "4")
    assert built

    r1 = run("append", store, str(inc))
    assert r1["rows"] == 4 and not r1["already_applied"]
    r2 = run("append", store, str(inc))
    assert r2["already_applied"]

    run("compact", store)

    # search needs the raw table including the appended rows for rerank
    full = tmp_path / "full"
    full.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(
                    np.concatenate([np.arange(300), 9000 + np.arange(4)]),
                    type=pa.int64(),
                ),
                "embedding": pa.array(
                    list(np.concatenate([base, planted])),
                    type=pa.list_(pa.float64()),
                ),
            }
        ),
        full / "part0.parquet",
    )
    hit = run(
        "search", store, str(full), "--query-id", "3", "--k", "5",
        "--probes", "4", "--rerank", "300",
    )
    assert 3 in hit["ids"]
    assert len(set(hit["ids"]) & set(range(9000, 9004))) >= 3


def test_fsck_vector_store(ray_session, tmp_path):
    """ANN store fsck: clean stores pass; duplicate ids, wrong-width PQ
    codes, orphan tmps, unapplied generations and stale intents are
    each surfaced at the right severity."""
    import json
    import shutil
    from pathlib import Path

    import pyarrow.parquet as pq

    from parquet_go_ray.pipelines.similarity import (
        build_ivfpq_store,
        fsck_vector_store,
        ivfpq_append,
    )

    rng = np.random.default_rng(51)
    base = rng.standard_normal((200, 16))
    store = str(tmp_path / "ivfpq")
    build_ivfpq_store(
        _mk_vecs(np.arange(200), base), store, n_centroids=2,
        sample_rows=200,
    )
    res = fsck_vector_store(store)
    assert res["ok"], res
    assert res["kind"] == "ivfpq" and res["rows"] == 200

    # unapplied generation -> warning, still ok
    v = rng.standard_normal((3, 16))
    r = ivfpq_append(store, _mk_vecs(1000 + np.arange(3), v))
    root = Path(store)
    (root / f"_gen-{r['generation']}.applied").unlink()
    res = fsck_vector_store(store)
    assert res["ok"] and any("applied marker" in w for w in res["warnings"])
    (root / f"_gen-{r['generation']}.applied").touch()

    # duplicate ids across shards -> error
    victim = sorted(root.glob("cell=*+g*.parquet"))[0]
    dup = root / "cell=0001+gffffffffffffffff.parquet"
    shutil.copy(victim, dup)
    (root / "_gen-ffffffffffffffff.applied").touch()
    res = fsck_vector_store(store)
    assert not res["ok"] and any("more than once" in e for e in res["errors"])
    dup.unlink()
    (root / "_gen-ffffffffffffffff.applied").unlink()

    # orphan tmp + stale intent -> warnings only
    (root / "cell=0000.parquet.tmp999").write_bytes(b"x")
    (root / "cell=0000.members.json").write_text(
        json.dumps({"target": "cell=0000+gnope.parquet", "members": []})
    )
    res = fsck_vector_store(store, deep=False)
    assert res["ok"]
    assert any("orphan writer tmp" in w for w in res["warnings"])
    assert any("uncommitted" in w for w in res["warnings"])
    (root / "cell=0000.parquet.tmp999").unlink()
    (root / "cell=0000.members.json").unlink()

    # wrong-width PQ code -> error
    t = pq.read_table(victim)
    import pyarrow as _pa

    bad = t.set_column(
        t.column_names.index("code"),
        "code",
        _pa.array([b"xx"] * t.num_rows, type=_pa.binary()),
    )
    pq.write_table(bad, root / "cell=0001+geeeeeeeeeeeeeeee.parquet")
    (root / "_gen-eeeeeeeeeeeeeeee.applied").touch()
    res = fsck_vector_store(store)
    assert not res["ok"] and any("wrong" in e for e in res["errors"])
