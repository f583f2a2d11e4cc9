"""Tombstone deletes: read-path filtering, projection interaction,
physical purge with stats-pruned shard selection, crash recovery,
idempotence, and point-lookup integration."""

import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.pipelines import tombstone
from parquet_go_ray.pipelines.decode import decode_dataset, point_lookup
from parquet_go_ray.pipelines.encode import encode_job


@pytest.fixture()
def store(tmp_path, ray_session, sf_dir):
    out = str(tmp_path / "store")
    encode_job(
        [f"{sf_dir}/documents.parquet"], out, rows_per_chunk=128,
        bloom_columns=("doc_id",),
    )
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    return out, docs


def test_delete_hides_rows(store):
    out, docs = store
    dead = [5, 17, 42, 300]
    tombstone.delete_where(out, "doc_id", dead)
    got = decode_dataset(out).to_pandas()
    assert set(docs["doc_id"]) - set(dead) == set(got["doc_id"])
    assert len(got) == len(docs) - len(set(dead) & set(docs["doc_id"]))


def test_delete_is_idempotent_and_typed(store):
    out, docs = store
    r1 = tombstone.delete_where(out, "doc_id", [1, 2, 2, 3])
    r2 = tombstone.delete_where(out, "doc_id", [1, 2, 3])
    assert r1["file"] == r2["file"]  # content-addressed: same file
    assert r1["values"] == 3
    # a second delete on a STRING column stacks with the first
    lang = docs["lang"].iloc[0]
    tombstone.delete_where(out, "lang", [lang])
    got = decode_dataset(out).to_pandas()
    assert lang not in set(got["lang"])
    assert not ({1, 2, 3} & set(got["doc_id"]))


def test_projection_excluding_tombstone_column_still_filters(store):
    out, docs = store
    tombstone.delete_where(out, "doc_id", [7, 8, 9])
    got = decode_dataset(out, columns=["text", "lang", "doc_id"]).to_pandas()
    n_expected = len(docs) - len({7, 8, 9} & set(docs["doc_id"]))
    assert len(got) == n_expected
    # projection that EXCLUDES doc_id: the filter column is decoded for
    # the anti-filter and dropped afterwards
    got2 = decode_dataset(out, columns=["text", "lang"]).to_pandas()
    assert list(got2.columns) == ["text", "lang"]
    assert len(got2) == n_expected


def test_point_lookup_does_not_resurrect(store, ray_session):
    out, _docs = store
    tombstone.delete_where(out, "doc_id", [105])
    got = point_lookup(out, "doc_id", [5, 105]).to_pandas()
    assert set(got["doc_id"]) == {5}


def test_purge_reclaims_and_retires(store):
    out, docs = store
    dead = list(range(0, 50))
    tombstone.delete_where(out, "doc_id", dead)
    res = tombstone.purge_tombstones(out)
    assert res["rows_removed"] == len(set(dead) & set(docs["doc_id"]))
    assert res["tombstones_retired"] == 1
    assert not list(Path(out, "tombstones").glob("ts-*"))
    # rows are PHYSICALLY gone: reading with tombstones off shows them deleted
    got = decode_dataset(out, apply_tombstones=False).to_pandas()
    assert not (set(dead) & set(got["doc_id"]))
    assert len(got) == len(docs) - len(set(dead) & set(docs["doc_id"]))
    # second purge is a no-op
    res2 = tombstone.purge_tombstones(out)
    assert res2["rows_removed"] == 0


def test_purge_prunes_untouched_shards(tmp_path, ray_session, sf_dir):
    # 4 id-disjoint input files -> 4 shards with disjoint doc_id stats;
    # deleting the global min id must rewrite ONLY the shard owning it
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    n = docs.num_rows
    paths = []
    for i in range(4):
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(docs.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4), p)
        paths.append(p)
    out = str(tmp_path / "store")
    encode_job(paths, out, rows_per_chunk=128, bloom_columns=())
    shards_before = {
        p.name: max(f.stat().st_mtime_ns for f in p.glob("*.parquet"))
        for p in Path(out, "data").iterdir()
    }
    assert len(shards_before) == 4
    lo = int(docs.column("doc_id").to_pandas().min())
    tombstone.delete_where(out, "doc_id", [lo])
    res = tombstone.purge_tombstones(out)
    assert res["rows_removed"] == 1
    assert res["shards_rewritten"] == 1
    surviving = {
        p.name: max(f.stat().st_mtime_ns for f in p.glob("*.parquet"))
        for p in Path(out, "data").iterdir()
    }
    untouched = {
        n_
        for n_ in shards_before
        if n_ in surviving and surviving[n_] == shards_before[n_]
    }
    # the three id-disjoint shards were neither rewritten nor dropped
    assert len(untouched) == 3, "purge touched stats-excluded shards"


def test_purge_crash_recovery_rolls_back(store):
    out, docs = store
    tombstone.delete_where(out, "doc_id", [11])
    # simulate a crash: intent written, nothing committed
    from parquet_go_ray.pipelines.compact import _write_members

    _write_members(out, "purge-deadbeef", ["no-such-shard"])
    res = tombstone.purge_tombstones(out)
    assert res["rows_removed"] == 1
    got = decode_dataset(out, apply_tombstones=False).to_pandas()
    assert 11 not in set(got["doc_id"])
    assert len(got) == len(docs) - 1
    # no leftover intent files
    assert not list(Path(out, "_manifest").glob("*.members.json"))


def test_cli_delete_purge(store):
    import json
    import subprocess
    import sys

    out, docs = store
    r = subprocess.run(
        [sys.executable, "-m", "parquet_go_ray", "delete", out, "doc_id",
         "21", "22"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert json.loads(r.stdout)["values"] == 2
    r = subprocess.run(
        [sys.executable, "-m", "parquet_go_ray", "--num-cpus", "4",
         "purge", out],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert json.loads(r.stdout)["rows_removed"] == 2
    got = decode_dataset(out, apply_tombstones=False).to_pandas()
    assert not ({21, 22} & set(got["doc_id"]))


def test_upsert_files_merge_on_write(store, tmp_path, sf_dir):
    out, docs = store
    # increment: 20 CHANGED docs (same ids, edited text) + 10 NEW docs
    changed = docs.head(20).copy()
    changed["text"] = changed["text"] + " v2"
    new = docs.tail(10).copy()
    new["doc_id"] = new["doc_id"] + 1_000_000
    inc = pd.concat([changed, new], ignore_index=True)
    inc_path = str(tmp_path / "increment-0.parquet")
    pq.write_table(pa.Table.from_pandas(inc, preserve_index=False), inc_path)

    res = tombstone.upsert_files(out, [inc_path], key_col="doc_id")
    assert res["keys_tombstoned"] == 30
    assert res["rows_replaced"] == 20  # only the changed ids existed
    assert res["rows_appended"] == 30

    got = decode_dataset(out).to_pandas()
    assert len(got) == len(docs) + 10
    m = got.set_index("doc_id")["text"]
    for _, row in changed.iterrows():
        assert m[row["doc_id"]] == row["text"]  # new version visible
    assert set(new["doc_id"]).issubset(set(got["doc_id"]))
    # no tombstones survive a completed upsert (merge-on-write)
    assert not list(Path(out, "tombstones").glob("ts-*"))


def test_upsert_refuses_stem_collision(store, tmp_path, sf_dir):
    out, docs = store
    clash = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pandas(docs.head(2), preserve_index=False), clash)
    with pytest.raises(ValueError, match="collide"):
        tombstone.upsert_files(out, [clash], key_col="doc_id")


def test_gate_query_matches_oracle(ray_session, sf_dir):
    import duckdb

    from parquet_go_ray.pipelines.queries import ORACLES, QUERIES

    got = (
        QUERIES["encode_decode_deleted"](sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(ORACLES["encode_decode_deleted"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


def _write_log(tmp_path, name, ups=None, dels=None, docs=None):
    import numpy as np

    parts = []
    if ups is not None:
        t = docs_table(docs, ups)
        t = t.append_column("op", pa.array(["upsert"] * t.num_rows))
        parts.append(t)
    if dels is not None:
        t = docs_table(docs, dels)
        t = t.append_column("op", pa.array(["delete"] * t.num_rows))
        parts.append(t)
    p = str(tmp_path / name)
    pq.write_table(pa.concat_tables(parts), p)
    return p


def docs_table(docs, ids):
    t = pa.Table.from_pandas(docs[docs["doc_id"].isin(ids)], preserve_index=False)
    return t


def test_apply_changelog_deletes_and_upserts(store, tmp_path):
    from parquet_go_ray.pipelines.decode import decode_dataset
    from parquet_go_ray.pipelines.tombstone import apply_changelog

    out, docs = store
    log = _write_log(tmp_path, "b0.parquet", ups=[5, 10], dels=[1, 2], docs=docs)
    info = apply_changelog(out, [log], key_col="doc_id")
    assert info["keys_deleted"] == 2 and info["rows_upserted"] == 2
    got = decode_dataset(out).to_pandas()
    assert len(got) == len(docs) - 2
    assert not set(got["doc_id"]) & {1, 2}
    assert {5, 10} <= set(got["doc_id"])


def test_apply_changelog_exactly_once(store, tmp_path):
    from parquet_go_ray.pipelines.decode import decode_dataset
    from parquet_go_ray.pipelines.tombstone import apply_changelog

    out, docs = store
    log = _write_log(tmp_path, "b1.parquet", ups=[7], dels=[3], docs=docs)
    apply_changelog(out, [log], key_col="doc_id")
    n1 = len(decode_dataset(out).to_pandas())
    again = apply_changelog(out, [log], key_col="doc_id")
    assert again.get("already_applied") is True
    assert len(decode_dataset(out).to_pandas()) == n1


def test_apply_changelog_upsert_wins_over_delete(store, tmp_path):
    from parquet_go_ray.pipelines.decode import decode_dataset
    from parquet_go_ray.pipelines.tombstone import apply_changelog

    out, docs = store
    log = _write_log(tmp_path, "b2.parquet", ups=[4], dels=[4, 8], docs=docs)
    info = apply_changelog(out, [log], key_col="doc_id")
    assert info["keys_deleted"] == 1  # only 8: the upsert key survives
    got = decode_dataset(out).to_pandas()
    assert 4 in set(got["doc_id"]) and 8 not in set(got["doc_id"])


def test_apply_changelog_rejects_unknown_op(store, tmp_path):
    from parquet_go_ray.pipelines.tombstone import apply_changelog

    out, docs = store
    t = docs_table(docs, [1]).append_column("op", pa.array(["replace"]))
    p = str(tmp_path / "bad.parquet")
    pq.write_table(t, p)
    with pytest.raises(ValueError, match="unknown changelog ops"):
        apply_changelog(out, [p], key_col="doc_id")


def test_purge_preserves_bloom_config(store):
    """ADVICE r4 #2: a purge rewrite must keep the store's ORIGINAL
    bloom sidecar config (doc_id here), so equality lookups keep
    finding rows that live in rewritten shards."""
    out, docs = store
    survivor = int(docs["doc_id"].iloc[1])
    tombstone.delete_where(out, "doc_id", [int(docs["doc_id"].iloc[0])])
    res = tombstone.purge_tombstones(out)
    assert res["shards_rewritten"] >= 1
    # the rewritten shard's chunk files still carry doc_id blooms
    from parquet_go_ray.pipelines.decode import chunk_files

    purged = [f for f in chunk_files(out) if "/purge-" in f]
    assert purged
    for f in purged:
        t = pq.read_table(f, columns=["column", "bloom"])
        ok = [
            b.is_valid
            for c, b in zip(t.column("column"), t.column("bloom"))
            if c.as_py() == "doc_id"
        ]
        assert ok and all(ok), f"purged shard {f} lost its doc_id bloom"
    # and point_lookup still finds a survivor that now lives there
    got = point_lookup(out, "doc_id", [survivor]).to_pandas()
    assert set(got["doc_id"]) == {survivor}


def test_point_lookup_admits_bloomless_files(tmp_path, ray_session, sf_dir):
    """A store written WITHOUT bloom sidecars still answers point
    lookups correctly: files with no valid bloom for the probed column
    are admitted conservatively instead of skipped."""
    out = str(tmp_path / "nobloom")
    encode_job(
        [f"{sf_dir}/documents.parquet"], out, rows_per_chunk=256,
        bloom_columns=(),
    )
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    want = int(docs["doc_id"].iloc[5])
    got = point_lookup(out, "doc_id", [want]).to_pandas()
    assert set(got["doc_id"]) == {want}


def test_upsert_preserves_bloom_config(store, tmp_path):
    out, docs = store
    new = docs.tail(5).copy()
    new["doc_id"] = new["doc_id"] + 2_000_000
    inc_path = str(tmp_path / "increment-b.parquet")
    pq.write_table(pa.Table.from_pandas(new, preserve_index=False), inc_path)
    tombstone.upsert_files(out, [inc_path], key_col="doc_id")
    # appended increment shard carries the store's doc_id blooms
    from parquet_go_ray.pipelines.decode import chunk_files

    inc_files = [f for f in chunk_files(out) if "increment-b" in f]
    assert inc_files
    t = pq.read_table(inc_files[0], columns=["column", "bloom"])
    ok = [
        b.is_valid
        for c, b in zip(t.column("column"), t.column("bloom"))
        if c.as_py() == "doc_id"
    ]
    assert ok and all(ok)
    got = point_lookup(out, "doc_id", [int(new["doc_id"].iloc[0])]).to_pandas()
    assert len(got) == 1


def test_purge_ignores_orphaned_chunk_files(store):
    """ADVICE r4 #5: purge folds in exactly the files the shard's
    manifest commit recorded — an orphan chunk file (a task that wrote
    its data file but crashed before record_shard) must not resurrect
    as duplicate rows in the rewritten shard."""
    out, docs = store
    from parquet_go_ray.pipelines.decode import chunk_files

    victim = Path(chunk_files(out)[0])
    orphan = victim.parent / "orphan-deadbeef.parquet"
    shutil.copy(victim, orphan)
    tombstone.delete_where(out, "doc_id", [int(docs["doc_id"].iloc[0])])
    res = tombstone.purge_tombstones(out)
    assert res["shards_rewritten"] >= 1
    got = decode_dataset(out).to_pandas()
    assert len(got) == len(docs) - 1
    assert got["doc_id"].is_unique, "orphan rows duplicated into purge"
