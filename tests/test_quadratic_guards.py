"""Scale guards on the deliberately-quadratic / driver-side operators
(VERDICT r4 tasks #3 and #5): each refuses loudly BEFORE scheduling the
expensive fan-out, names the sub-quadratic alternative, and can be
overridden explicitly. Small inputs under the default budgets are
untouched (the oracled queries keep passing)."""

import numpy as np
import pandas as pd
import pytest


def _docs(n, rng):
    letters = np.array(list("abcdefghij "))
    return ["".join(rng.choice(letters, size=40)) for _ in range(n)]


def test_jaccard_pairs_guard_fires(ray_session):
    import ray.data

    from parquet_go_ray.pipelines.dedup import jaccard_pairs

    rng = np.random.default_rng(7)
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": _docs(60, rng)})
    )
    # rows_per_block=1 -> ~61 blocks -> ~1.9k block pairs > budget 100
    with pytest.raises(ValueError, match="minhash_candidates"):
        jaccard_pairs(ds, rows_per_block=1, max_block_pairs=100)


def test_jaccard_pairs_guard_override(ray_session):
    import ray.data

    from parquet_go_ray.pipelines.dedup import jaccard_pairs

    rng = np.random.default_rng(7)
    docs = _docs(20, rng)
    docs.append(docs[0])  # one planted exact dup
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(21, dtype=np.int64), "text": docs}
        )
    )
    out = jaccard_pairs(
        ds, rows_per_block=1, max_block_pairs=10**9
    ).to_pandas()
    assert (0, 20) in set(zip(out["id_a"], out["id_b"]))


def test_cosine_pairs_guard_fires(ray_session):
    import ray.data

    from parquet_go_ray.pipelines.similarity import cosine_pairs

    rng = np.random.default_rng(3)
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(50, dtype=np.int64),
                "embedding": list(rng.normal(size=(50, 8))),
            }
        )
    )
    with pytest.raises(ValueError, match="lsh_near_pairs"):
        cosine_pairs(ds, rows_per_block=1, max_block_pairs=64)


def test_cosine_pairs_under_budget_unchanged(ray_session):
    import ray.data

    from parquet_go_ray.pipelines.similarity import cosine_pairs

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 8))
    vecs[17] = vecs[4]  # planted exact dup -> cos=1
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(30, dtype=np.int64),
                "embedding": list(vecs),
            }
        )
    )
    out = cosine_pairs(ds, threshold=0.999, rows_per_block=8).to_pandas()
    assert (4, 17) in set(zip(out["id_a"], out["id_b"]))


def test_merge_sorted_iter_guard_fires(ray_session):
    import pyarrow as pa
    import ray.data

    from parquet_go_ray.pipelines.relational import merge_sorted_iter

    s1 = ray.data.from_arrow(pa.table({"k": np.arange(600, dtype=np.int64)}))
    s2 = ray.data.from_arrow(pa.table({"k": np.arange(400, dtype=np.int64)}))
    it = merge_sorted_iter([s1, s2], ["k"], max_rows=500)
    with pytest.raises(ValueError, match="merge_sorted_stores"):
        next(it)


def test_merge_sorted_iter_override(ray_session):
    import pyarrow as pa
    import ray.data

    from parquet_go_ray.pipelines.relational import merge_sorted_iter

    s1 = ray.data.from_arrow(pa.table({"k": np.arange(0, 50, 2, dtype=np.int64)}))
    s2 = ray.data.from_arrow(pa.table({"k": np.arange(1, 50, 2, dtype=np.int64)}))
    out = pa.concat_tables(list(merge_sorted_iter([s1, s2], ["k"], max_rows=10**9)))
    assert out.column("k").to_pylist() == list(range(50))


def test_cosine_pairs_shuffled_blocks_match_sorted(ray_session):
    """Pair emission must be block-layout independent: shuffled
    (non-id-sorted) blocks produce exactly the sorted layout's
    (min,max) pair set (the id-sorted testdata masks this)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from parquet_go_ray.pipelines.similarity import cosine_pairs

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:10] + rng.standard_normal((10, 8)) * 0.01
    vecs = np.concatenate([base, dups])
    ids = np.concatenate([np.arange(60), 1000 + np.arange(10)])

    def mk(order):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids[order], type=pa.int64()),
                    "embedding": pa.array(
                        list(vecs[order]), type=pa.list_(pa.float64())
                    ),
                }
            )
        ).repartition(5)

    sorted_pairs = cosine_pairs(
        mk(np.arange(70)), threshold=0.98, rows_per_block=16
    ).to_pandas()
    shuf_pairs = cosine_pairs(
        mk(rng.permutation(70)), threshold=0.98, rows_per_block=16
    ).to_pandas()

    def pairset(df):
        return {(int(a), int(b)) for a, b in zip(df["id_a"], df["id_b"])}

    assert pairset(sorted_pairs) == pairset(shuf_pairs)
    assert (shuf_pairs["id_a"] < shuf_pairs["id_b"]).all()
    assert {(i, 1000 + i) for i in range(10)} <= pairset(shuf_pairs)
