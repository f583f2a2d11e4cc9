"""Range-planned sorted-store merge (pipelines/merge_store.py): content
equality, global output order (nulls last), duplicate keys across the
range boundaries, resume, and unsorted inputs."""

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.pipelines.encode import encode_job
from parquet_go_ray.pipelines.merge_store import (
    merge_sorted_stores,
    read_merged_sorted,
)


def _mk_store(tmp_path, name, ids, keys, ray_session=None):
    t = pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "k": pa.array(keys, pa.int64()),
        }
    )
    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / f"{name}_store")
    encode_job([p], out, rows_per_chunk=64, bloom_columns=())
    return out, t.to_pandas()


@pytest.fixture()
def two_stores(tmp_path, ray_session):
    rng = np.random.default_rng(21)
    # duplicate-heavy keys + some NULLs in store b
    ka = np.sort(rng.integers(0, 50, 700))
    kb = rng.integers(25, 99, 500).astype(object)
    kb[::50] = None
    kb_sorted = sorted(
        kb, key=lambda v: (v is None, 0 if v is None else int(v))
    )
    a, dfa = _mk_store(tmp_path, "a", np.arange(700), ka)
    b, dfb = _mk_store(
        tmp_path, "b", np.arange(1000, 1500), kb_sorted
    )
    return (a, b), pd.concat([dfa, dfb], ignore_index=True)


def _assert_globally_sorted(got: pd.DataFrame):
    k = got["k"].to_numpy(dtype=object)
    nn = [v for v in k if v is not None and not pd.isna(v)]
    assert all(
        int(x) <= int(y) for x, y in zip(nn, nn[1:])
    ), "non-null keys out of order"
    first_null = next(
        (i for i, v in enumerate(k) if v is None or pd.isna(v)), len(k)
    )
    assert all(
        v is None or pd.isna(v) for v in k[first_null:]
    ), "a non-null key follows a NULL (nulls must be last)"


def test_merge_content_and_order(two_stores, tmp_path):
    (a, b), df = two_stores
    out = str(tmp_path / "merged")
    info = merge_sorted_stores([a, b], out, "k", num_ranges=8)
    assert info["rows"] == len(df)
    got = read_merged_sorted(out).to_pandas()
    assert len(got) == len(df)
    # content equality, order-insensitively
    lhs = got.sort_values(["doc_id"], ignore_index=True)
    rhs = df.sort_values(["doc_id"], ignore_index=True)
    pd.testing.assert_frame_equal(
        lhs[sorted(lhs.columns)], rhs[sorted(rhs.columns)]
    )
    # global order: blocks arrive in (range, chunk) order
    _assert_globally_sorted(got)


def test_merge_resume_skips(two_stores, tmp_path):
    (a, b), _ = two_stores
    out = str(tmp_path / "merged")
    info = merge_sorted_stores([a, b], out, "k", num_ranges=8)
    again = merge_sorted_stores([a, b], out, "k", num_ranges=8)
    assert again["ranges"] == 0 and again["skipped"] >= info["ranges"]


def test_merge_unsorted_inputs_still_sorted_output(tmp_path, ray_session):
    rng = np.random.default_rng(4)
    a, dfa = _mk_store(
        tmp_path, "ua", np.arange(400), rng.integers(0, 1000, 400)
    )
    b, dfb = _mk_store(
        tmp_path, "ub", np.arange(400, 800), rng.integers(0, 1000, 400)
    )
    out = str(tmp_path / "merged")
    merge_sorted_stores([a, b], out, "k", num_ranges=6)
    got = read_merged_sorted(out).to_pandas()
    assert len(got) == 800
    _assert_globally_sorted(got)
    assert sorted(got["doc_id"]) == list(range(800))


def test_merge_respects_unpurged_tombstones(two_stores, tmp_path):
    """Deleted-but-not-yet-purged rows must not leak into the merged
    store: merge reads chunk files directly, so it applies each input's
    surviving tombstones itself."""
    from parquet_go_ray.pipelines.tombstone import delete_where

    (a, b), df = two_stores
    dead = [0, 1, 2, 1000, 1001]
    delete_where(a, "doc_id", [0, 1, 2])
    delete_where(b, "doc_id", [1000, 1001])
    out = str(tmp_path / "merged_tomb")
    merge_sorted_stores([a, b], out, "k", num_ranges=8)
    got = read_merged_sorted(out).to_pandas()
    assert len(got) == len(df) - len(dead)
    assert not set(got["doc_id"]) & set(dead)
    _assert_globally_sorted(got)


def test_merge_random_sweep(tmp_path, ray_session):
    """Randomized inputs across seeds: heavy duplicate keys (skewed to
    land on range boundaries), nulls in both stores, varying range
    counts — content and order must always hold."""
    for seed, ranges in ((1, 3), (2, 9), (3, 17)):
        rng = np.random.default_rng(seed)
        base = tmp_path / f"s{seed}"
        base.mkdir()
        stores, frames = [], []
        for si in range(3):
            n = int(rng.integers(50, 400))
            keys = rng.choice([0, 1, 5, 5, 5, 9, 42], size=n).astype(object)
            keys[rng.random(n) < 0.08] = None
            s, df = _mk_store(
                base, f"in{si}", np.arange(si * 1000, si * 1000 + n), keys
            )
            stores.append(s)
            frames.append(df)
        out = str(base / "merged")
        merge_sorted_stores(stores, out, "k", num_ranges=ranges)
        got = read_merged_sorted(out).to_pandas()
        df = pd.concat(frames, ignore_index=True)
        assert sorted(got["doc_id"]) == sorted(df["doc_id"]), seed
        m = got.merge(df, on="doc_id", suffixes=("", "_want"))
        same = (m["k"] == m["k_want"]) | (
            m["k"].isna() & m["k_want"].isna()
        )
        assert same.all(), seed
        _assert_globally_sorted(got)


def test_groupby_merged_store_complete_groups(two_stores, tmp_path):
    """Every key lives in exactly one range shard, so the zero-shuffle
    groupby emits each key ONCE with the full-corpus aggregate."""
    from parquet_go_ray.pipelines.merge_store import groupby_merged_store

    (a, b), df = two_stores
    out = str(tmp_path / "merged_g")
    merge_sorted_stores([a, b], out, "k", num_ranges=8)
    got = groupby_merged_store(out, [("doc_id", "count")]).to_pandas()
    # one output row per key — completeness, not partials
    assert got["k"].is_unique
    want = df.groupby("k", dropna=False)["doc_id"].count()
    got_nn = got[got["k"].notna()].set_index("k")["doc_id_count"]
    for k, n in want.items():
        if pd.isna(k):
            assert int(got[got["k"].isna()]["doc_id_count"].iloc[0]) == n
        else:
            assert int(got_nn[k]) == n


def test_merge_secondary_sort_keys(tmp_path, ray_session):
    """Ties of the range key are globally ordered by the extra sort
    keys: every tie lives in one range, so the in-task multi-key sort
    yields the global (key, extra) order — SortingColumns semantics."""
    rng = np.random.default_rng(8)
    a, dfa = _mk_store(
        tmp_path, "ka", np.arange(400), rng.integers(0, 5, 400)
    )
    b, dfb = _mk_store(
        tmp_path, "kb", np.arange(1000, 1400), rng.integers(0, 5, 400)
    )
    out = str(tmp_path / "merged")
    merge_sorted_stores(
        [a, b], out, "k", num_ranges=4, extra_sort_keys=("doc_id",)
    )
    got = read_merged_sorted(out).to_pandas()
    want = (
        pd.concat([dfa, dfb], ignore_index=True)
        .sort_values(["k", "doc_id"], ignore_index=True)
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_merge_into_generations(tmp_path, ray_session):
    """LSM ingest: route an increment into the existing ranges as a
    generation, base shards untouched; reads merge generations in-task
    and stay globally ordered; re-ingest is idempotent; compact folds
    back to one shard per range with answers unchanged."""
    import hashlib as _hl

    from parquet_go_ray.pipelines.merge_store import (
        compact_merged,
        groupby_merged_store,
        merge_into,
    )

    rng = np.random.default_rng(42)
    evens = np.arange(0, 800, 2)
    odds = np.arange(1, 800, 2)
    a, dfa = _mk_store(tmp_path, "base", evens, rng.integers(0, 50, 400))
    b, dfb = _mk_store(tmp_path, "inc", odds, rng.integers(0, 50, 400))
    out = str(tmp_path / "merged")
    merge_sorted_stores(
        [a], out, "k", num_ranges=6, extra_sort_keys=("doc_id",)
    )
    base_digest = {
        p: p.stat().st_mtime
        for p in Path(out, "data").rglob("*.parquet")
    }
    info = merge_into(out, [b])
    assert info["rows"] == 400 and not info["skipped"]
    # base shards untouched
    for p, mt in base_digest.items():
        assert p.stat().st_mtime == mt
    got = read_merged_sorted(out).to_pandas()
    df = pd.concat([dfa, dfb], ignore_index=True)
    assert sorted(got["doc_id"]) == sorted(df["doc_id"])
    _assert_globally_sorted(got)
    # idempotent re-ingest
    again = merge_into(out, [b])
    assert again["skipped"] is True
    # zero-shuffle groupby sees COMPLETE groups across generations
    g = groupby_merged_store(out, [("doc_id", "count")]).to_pandas()
    assert g["k"].is_unique
    want_counts = df.groupby("k")["doc_id"].count()
    got_counts = g.set_index("k")["doc_id_count"]
    assert all(int(got_counts[k]) == n for k, n in want_counts.items())
    # compact folds generations; content and order unchanged
    cinfo = compact_merged(out)
    assert cinfo["ranges_compacted"] >= 1
    got2 = read_merged_sorted(out).to_pandas()
    assert got2["doc_id"].tolist() == got["doc_id"].tolist()
    assert got2["k"].tolist() == got["k"].tolist()
    # and every range is single-generation again
    from parquet_go_ray.state import manifest as M

    bases = {}
    for s in M.completed_shards(out):
        bases.setdefault(s.split("+g")[0], []).append(s)
    assert all(len(v) == 1 for v in bases.values())


def test_family_on_merged_store(tmp_path, ray_session):
    """Layouts compose: a derived-column family backfills onto a
    range-merged store (generation shards included) and zip-reads."""
    from parquet_go_ray.pipelines.derive import (
        add_derived_column,
        decode_with_family,
    )
    from parquet_go_ray.pipelines.merge_store import merge_into

    rng = np.random.default_rng(12)
    a, dfa = _mk_store(tmp_path, "fa", np.arange(300), rng.integers(0, 30, 300))
    b, dfb = _mk_store(
        tmp_path, "fb", np.arange(1000, 1200), rng.integers(0, 30, 200)
    )
    out = str(tmp_path / "merged")
    merge_sorted_stores([a], out, "k", num_ranges=4)
    merge_into(out, [b])

    def trip():
        import pyarrow.compute as _pc

        def f(t):
            return _pc.multiply(
                t.column("k").combine_chunks(), pa.scalar(3, pa.int64())
            )

        return f

    add_derived_column(out, "trip", "k3", trip(), ["k"])
    got = (
        decode_with_family(out, columns=["doc_id", "k", "k3"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    df = pd.concat([dfa, dfb], ignore_index=True).sort_values(
        "doc_id", ignore_index=True
    )
    assert got["doc_id"].tolist() == df["doc_id"].tolist()
    assert got["k3"].tolist() == (df["k"] * 3).tolist()


def test_range_join_copartitioned(tmp_path, ray_session):
    from parquet_go_ray.pipelines.merge_store import range_join
    from parquet_go_ray.state import manifest

    rng = np.random.default_rng(31)
    lk = rng.integers(0, 40, 500)
    rk = rng.integers(20, 60, 80)
    ls, ldf = _mk_store(tmp_path, "L", np.arange(500), lk)
    rs, rdf = _mk_store(tmp_path, "R", np.arange(5000, 5080), rk)
    lm, rm = str(tmp_path / "Lm"), str(tmp_path / "Rm")
    merge_sorted_stores([ls], lm, "k", num_ranges=6)
    bounds = manifest.load_job_meta(lm)["bounds"]
    merge_sorted_stores([rs], rm, "k", bounds=bounds)
    got = (
        range_join(lm, rm, right_suffix="_r")
        .to_pandas()
        .sort_values(["doc_id", "doc_id_r"], ignore_index=True)
    )
    want = (
        ldf.merge(rdf, on="k", suffixes=("", "_r"))
        .sort_values(["doc_id", "doc_id_r"], ignore_index=True)
    )
    assert len(got) == len(want)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["doc_id_r"].tolist() == want["doc_id_r"].tolist()
    # non-co-partitioned stores are refused
    rm2 = str(tmp_path / "Rm2")
    merge_sorted_stores([rs], rm2, "k", num_ranges=3)
    with pytest.raises(ValueError, match="co-range-partitioned"):
        range_join(lm, rm2)


def test_range_manifests_are_disjoint_and_ordered(two_stores, tmp_path):
    """Cross-shard metadata proof: range i's key stats end before range
    i+1's begin (ties allowed at the boundary value)."""
    import json

    from parquet_go_ray.state import manifest

    (a, b), _ = two_stores
    out = str(tmp_path / "merged")
    merge_sorted_stores([a, b], out, "k", num_ranges=8)
    t = manifest.lineage_table(
        out, columns=["shard", "column", "vmin", "vmax"]
    )
    spans = {}
    for r in t.to_pylist():
        if r["column"] != "k" or not r.get("vmax"):
            continue
        vmin = json.loads(r["vmin"]) if r["vmin"] else None
        vmax = json.loads(r["vmax"]) if r["vmax"] else None
        if vmin is None or vmax is None:
            continue
        lo, hi = spans.get(r["shard"], (vmin, vmax))
        spans[r["shard"]] = (min(lo, vmin), max(hi, vmax))
    ordered = [spans[s] for s in sorted(spans)]
    assert len(ordered) >= 2, "merge produced a single range — widen data"
    for (_, hi_prev), (lo_next, _) in zip(ordered, ordered[1:]):
        assert hi_prev <= lo_next


def test_merge_into_restaged_content_is_new_generation(tmp_path, ray_session):
    """ADVICE r4 #3: the generation id derives from the inputs'
    CONTENT, not the directory names — a daily loop that restages NEW
    data at the SAME path must ingest again, not resume-skip; the
    same content re-run reports already_applied."""
    import shutil

    from parquet_go_ray.pipelines.merge_store import (
        merge_into,
        read_merged_sorted,
    )

    rng = np.random.default_rng(7)
    a, dfa = _mk_store(tmp_path, "base2", np.arange(0, 200), rng.integers(0, 50, 200))
    out = str(tmp_path / "merged2")
    merge_sorted_stores([a], out, "k", num_ranges=4, extra_sort_keys=("doc_id",))

    # day 1: increment staged at /incr
    incr_dir = tmp_path / "incr_store"
    b1, dfb1 = _mk_store(tmp_path, "day1", np.arange(1000, 1100), rng.integers(0, 50, 100))
    shutil.move(b1, incr_dir)
    r1 = merge_into(out, [str(incr_dir)])
    assert r1["rows"] == 100 and not r1["skipped"]

    # same content re-run: skipped AND explicitly already_applied
    r1b = merge_into(out, [str(incr_dir)])
    assert r1b["skipped"] is True and r1b["already_applied"] is True

    # day 2: DIFFERENT data restaged at the SAME path
    shutil.rmtree(incr_dir)
    b2, dfb2 = _mk_store(tmp_path, "day2", np.arange(2000, 2080), rng.integers(0, 50, 80))
    shutil.move(b2, incr_dir)
    r2 = merge_into(out, [str(incr_dir)])
    assert r2["rows"] == 80 and not r2["skipped"], (
        "restaged content at the same path must not resume-skip"
    )
    assert r2["generation"] != r1["generation"]
    got = read_merged_sorted(out).to_pandas()
    assert sorted(got["doc_id"]) == sorted(
        pd.concat([dfa, dfb1, dfb2])["doc_id"]
    )
    # explicit generation label wins
    b3, _ = _mk_store(tmp_path, "day3", np.arange(3000, 3010), rng.integers(0, 50, 10))
    r3 = merge_into(out, [b3], generation="20260819")
    assert r3["generation"] == "20260819"


def test_compact_ignores_orphaned_chunk_files(two_stores, tmp_path):
    """ADVICE r4 #5: compaction reads members' files from the manifest
    lineage — an orphaned chunk file in a member shard dir must not
    fold into the compacted shard as duplicate rows."""
    import shutil

    from parquet_go_ray.pipelines.merge_store import (
        compact_merged,
        merge_into,
    )

    (a, b), want = two_stores
    out = str(tmp_path / "merged_orph")
    merge_sorted_stores([a], out, "k", num_ranges=3, extra_sort_keys=("doc_id",))
    merge_into(out, [b])
    # plant an orphan in one base range dir
    data = Path(out) / "data"
    some_shard = sorted(d for d in data.iterdir() if d.is_dir())[0]
    victim = sorted(some_shard.glob("*.parquet"))[0]
    shutil.copy(victim, some_shard / "orphan-cafebabe.parquet")
    info = compact_merged(out)
    assert info["ranges_compacted"] >= 1
    got = read_merged_sorted(out).to_pandas()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    assert got["doc_id"].is_unique
