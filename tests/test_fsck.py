"""Store fsck: clean stores pass; corruption, missing files, orphans
and leftover compaction intents are reported at the right severity."""

from pathlib import Path

import pytest

from parquet_go_ray.pipelines.encode import encode_job
from parquet_go_ray.pipelines.fsck import fsck_store

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store(ray_session, tmp_path):
    out = str(tmp_path / "store")
    files = sorted(str(p) for p in Path(SF).glob("*.parquet"))[:4]
    encode_job(files, out, resume=False)
    return out


def test_fsck_clean_store(store, ray_session):
    res = fsck_store(store)
    assert res["ok"] and not res["errors"] and not res["warnings"]
    assert res["info"]["shards"] == 4 and res["info"]["rows"] > 0


def test_fsck_finds_problems(store, ray_session):
    data = Path(store) / "data"
    shard_dirs = sorted(data.iterdir())
    # 1. corrupt one payload byte in one chunk file (past the parquet
    #    header, inside the page data region)
    victim = next(sorted(shard_dirs[0].glob("*.parquet")).__iter__())
    raw = bytearray(victim.read_bytes())
    raw[200] ^= 0xFF
    victim.write_bytes(bytes(raw))
    # 2. delete a whole chunk file of another shard
    gone = next(sorted(shard_dirs[1].glob("*.parquet")).__iter__())
    gone_name = f"{shard_dirs[1].name}/{gone.name}"
    gone.unlink()
    # 3. an orphan file and a leftover compaction intent
    (shard_dirs[2] / "deadbeef00000000.parquet").write_bytes(b"junk")
    (Path(store) / "_manifest" / "compact-aaaa.members.json").write_text("[]")

    res = fsck_store(store)
    assert not res["ok"]
    text = "\n".join(res["errors"])
    assert "crc mismatch" in text or "unreadable" in text
    assert f"missing chunk file {gone_name}" in text
    wtext = "\n".join(res["warnings"])
    assert "orphan data file" in wtext
    assert "leftover compaction intent" in wtext
