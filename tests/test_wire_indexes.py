"""Wire-level page index, split-block bloom filters, DataPage V2 and
SortingColumns metadata (round-2 verdict #2/#3/#7).

External-oracle checks use pyarrow (which exposes has_column_index /
has_offset_index / sorting_columns) and known public XXH64 vectors;
pyarrow 16 can neither write nor read parquet bloom filters, so the
bloom cross-check is writer<->reader roundtrip + the hash vectors.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.codecs import parquet_wire_read as R
from parquet_go_ray.codecs import sbbf
from parquet_go_ray.codecs.parquet_wire import T_BYTE_ARRAY, write_table


@pytest.fixture(scope="module")
def indexed_file(tmp_path_factory):
    n = 60000
    t = pa.table(
        {
            "k": pa.array(np.arange(n), type=pa.int64()),
            "s": pa.array([f"row-{i:07d}" for i in range(n)]),
            "v": pa.array(np.random.default_rng(5).standard_normal(n)),
            "nul": pa.array(
                [None if i % 3 else i for i in range(n)], type=pa.int64()
            ),
        }
    )
    p = str(tmp_path_factory.mktemp("wire") / "indexed.parquet")
    write_table(
        t,
        p,
        compression="zstd",
        rows_per_group=20000,
        page_rows=2048,
        sorting_columns=[("k", False, False)],
        bloom_columns=("s", "k"),
    )
    return p, t


def test_pyarrow_sees_page_index_and_sorting(indexed_file):
    p, t = indexed_file
    f = pq.ParquetFile(p)
    md = f.metadata
    for rg in range(md.num_row_groups):
        for c in range(md.num_columns):
            col = md.row_group(rg).column(c)
            assert col.has_offset_index
        assert md.row_group(rg).column(0).has_column_index
        sc = md.row_group(rg).sorting_columns
        assert len(sc) == 1 and sc[0].column_index == 0
        assert not sc[0].descending
    # and the data still reads back identically through pyarrow
    assert f.read().to_pydict() == t.to_pydict()


def test_page_index_roundtrip_own_reader(indexed_file):
    p, _t = indexed_file
    idx = R.read_page_index(p)
    assert len(idx) == 3  # row groups
    ci = idx[0]["k"]["column_index"]
    assert ci["boundary_order"] == 1  # ascending
    assert ci["mins"][0] == 0 and ci["maxs"][0] == 2047
    assert idx[0]["k"]["offset_index"]["locations"][1][2] == 2048
    # the nullable column records per-page null counts
    nci = idx[0]["nul"]["column_index"]
    assert sum(nci["null_counts"]) == sum(1 for i in range(20000) if i % 3)


def test_pruned_read_decodes_fewer_pages(indexed_file):
    p, t = indexed_file
    R.DECODE_COUNTERS["data_pages"] = 0
    out, info = R.read_table_pruned(p, "k", 30000, 31000, columns=["k", "s"])
    assert info["pages_read"] < info["pages_total"] // 5
    assert R.DECODE_COUNTERS["data_pages"] == info["pages_read"]
    assert info["row_groups_read"] == 1  # two groups pruned outright
    exp = t.select(["k", "s"]).slice(30000, 1001)
    assert out.sort_by("k").to_pydict() == exp.to_pydict()


def test_pruned_read_matches_full_scan_on_unsorted(tmp_path):
    # unsorted column: boundary_order UNORDERED, pruning still exact
    rng = np.random.default_rng(9)
    vals = rng.permutation(20000)
    t = pa.table({"k": pa.array(vals, type=pa.int64())})
    p = str(tmp_path / "u.parquet")
    write_table(t, p, page_rows=1024)
    idx = R.read_page_index(p)
    assert idx[0]["k"]["column_index"]["boundary_order"] == 0
    out, _ = R.read_table_pruned(p, "k", 5, 42)
    assert sorted(out.column("k").to_pylist()) == list(range(5, 43))


def test_xxhash64_public_vectors():
    vecs = {
        b"": 0xEF46DB3751D8E999,
        b"a": 0xD24EC4F1A98C6E5B,
        b"abc": 0x44BC2CF5AD770999,
        b"Nobody inspects the spammish repetition": 0xFBCEA83C8A378BF1,
    }
    data = b"".join(vecs)
    offs = np.cumsum([0] + [len(k) for k in vecs]).astype(np.int64)
    h = sbbf.xxhash64(data, offs)
    for i, (k, want) in enumerate(vecs.items()):
        assert int(h[i]) == want, k
        assert sbbf._xxh64_py(k) == want, k


def test_sbbf_roundtrip_and_fp_rate():
    vals = pa.array([f"key{i}" for i in range(4000)])
    f = sbbf.build_for_values(vals, T_BYTE_ARRAY)
    g = sbbf.SplitBlockFilter.deserialize(f.serialize())
    d, o = sbbf.plain_segments(vals, T_BYTE_ARRAY)
    assert g.check_hashes(sbbf.xxhash64(d, o)).all()  # no false negatives
    probe = pa.array([f"absent{i}" for i in range(20000)])
    d, o = sbbf.plain_segments(probe, T_BYTE_ARRAY)
    assert g.check_hashes(sbbf.xxhash64(d, o)).mean() < 0.05


def test_wire_bloom_file_probe(indexed_file):
    p, _t = indexed_file
    filters = R.read_bloom_filters(p, "s")
    assert all(f is not None for f in filters)
    may = R.bloom_may_contain(
        p, "s", ["row-0000001", "row-0059999", "missing-a", "missing-b"]
    )
    assert may[0] and may[1] and not may[2] and not may[3]
    # int64 column blooms too
    may_k = R.bloom_may_contain(p, "k", [17, 59999, 10**12])
    assert may_k[0] and may_k[1] and not may_k[2]


def test_datapage_v2_three_readers(tmp_path):
    import duckdb

    t = pa.table(
        {
            "a": pa.array(np.arange(30000), type=pa.int64()),
            "b": pa.array(
                [None if i % 7 == 0 else f"s{i % 100:03d}" for i in range(30000)]
            ),
        }
    )
    p = str(tmp_path / "v2.parquet")
    write_table(t, p, compression="zstd", page_rows=1024, data_page_version=2)
    assert pq.read_table(p).to_pydict() == t.to_pydict()
    assert R.read_table(p).to_pydict() == t.to_pydict()
    got = duckdb.sql(f"SELECT count(*), count(b) FROM read_parquet('{p}')").fetchone()
    assert got == (30000, 30000 - len(range(0, 30000, 7)))


def test_native_read_point_filter_bloom_skip(ray_session, tmp_path):
    """point_filter: a file whose bloom excludes every probe value is
    answered from the footer alone — zero data pages decoded."""
    import ray.data

    from parquet_go_ray.sources.wire import read_parquet_native

    t1 = pa.table({"k": pa.array(np.arange(1000), type=pa.int64())})
    t2 = pa.table({"k": pa.array(np.arange(5000, 6000), type=pa.int64())})
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    write_table(t1, p1, bloom_columns=("k",))
    write_table(t2, p2, bloom_columns=("k",))

    # both probes absent -> every file bloom-pruned, result empty+typed
    R.DECODE_COUNTERS["data_pages"] = 0
    out = read_parquet_native([p1, p2], point_filter=("k", [10**9, 10**9 + 1]))
    # the per-task tables are typed (footer-only empty_table); Ray's
    # to_pandas drops the schema of an all-empty dataset, so check the
    # dataset schema instead
    assert out.schema().names == ["k"]
    assert out.count() == 0

    # one present probe -> only the matching file's rows come back
    out = read_parquet_native([p1, p2], point_filter=("k", [5005, 10**9]))
    assert out.to_pandas()["k"].tolist() == [5005]


@pytest.mark.parametrize(
    "rng", [(0, 7), (19990, 20010), (35000, 36000), (59999, 60000), (60000, 60005)]
)
def test_seek_rows_page_pruned(indexed_file, rng):
    """read_table_rows = SeekToRow at the wire (column.go:127-149):
    exact rows back, non-intersecting row groups untouched, and only
    OffsetIndex-intersecting pages decoded."""
    p, t = indexed_file
    s, e = rng
    sub, info = R.read_table_rows(p, s, e)
    exp = t.slice(s, max(0, min(e, t.num_rows) - s))
    assert sub.cast(exp.schema).equals(exp)
    if e <= t.num_rows and e - s <= 1100:
        # a narrow seek must not decode the whole file (120 pages/col)
        assert info["pages_read"] < info["pages_total"]
        assert info["row_groups_read"] <= 2


def test_seek_rows_distributed_multifile(ray_session, tmp_path):
    """row_range over several files = one logical concatenated table;
    only intersecting files get tasks."""
    from parquet_go_ray.sources.wire import read_parquet_native

    paths = []
    off = 0
    for i in range(3):
        t = pa.table({"k": pa.array(np.arange(off, off + 1000), type=pa.int64())})
        p = str(tmp_path / f"part-{i}.parquet")
        write_table(t, p, page_rows=100)
        paths.append(p)
        off += 1000
    ds = read_parquet_native(paths, row_range=(950, 2050))
    got = sorted(
        v for b in ds.iter_batches(batch_format="pyarrow") for v in b["k"].to_pylist()
    )
    assert got == list(range(950, 2050))
    empty = read_parquet_native(paths, row_range=(5000, 6000))
    assert empty.count() == 0


def test_truncated_string_bounds_prune_safely(tmp_path):
    """>64B string bounds are truncated like pyarrow's writer (min =
    prefix, max = prefix incremented), so long-string pages keep a
    usable ColumnIndex; pruned reads stay exact."""
    vals = sorted(f"prefix-{i:04d}-" + "x" * 120 for i in range(5000))
    t = pa.table({"s": pa.array(vals), "k": pa.array(range(5000), type=pa.int64())})
    p = str(tmp_path / "trunc.parquet")
    write_table(t, p, page_rows=500)
    st = pq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    assert len(st.min) == 64 and st.min == vals[0][:64]
    assert len(st.max) <= 64 and st.max > vals[-1]  # upper bound
    sub, info = R.read_table_pruned(p, "s", "prefix-1000-", "prefix-1099-zzz")
    assert sub.num_rows == 100
    assert info["pages_read"] < info["pages_total"]
    full = pq.read_table(p)
    import pyarrow.compute as pc

    exp = full.filter(
        pc.and_(
            pc.greater_equal(full.column("s"), pa.scalar("prefix-1000-")),
            pc.less_equal(full.column("s"), pa.scalar("prefix-1099-zzz")),
        )
    )
    assert sub.sort_by("k").equals(exp.select(sub.column_names).sort_by("k"))


def test_multibyte_string_bounds_stay_valid_utf8(tmp_path):
    """A multibyte codepoint straddling the 64-byte truncation cut must
    not produce an invalid-UTF-8 bound: pyarrow CRASHED decoding the
    statistics of such files before bounds were cut at codepoint
    boundaries (parquet-mr BinaryTruncator semantics)."""
    vals = [("a" * 63 + "中文" + "x" * 40 + f"{i:04d}") for i in range(2000)]
    t = pa.table({"s": pa.array(vals)})
    p = str(tmp_path / "mb.parquet")
    write_table(t, p, page_rows=256)
    st = pq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    assert st.min <= min(vals) and st.max > max(vals)
    ci = R.read_page_index(p)[0]["s"]["column_index"]
    assert ci is not None and all(m is not None for m in ci["mins"])
    # the max bound increments the last COMPLETE codepoint
    assert ci["maxs"][0].encode()[-1:] != b"\xe4"
    sub, _ = R.read_table_pruned(p, "s", vals[100], vals[199])
    assert sub.num_rows == 100


def test_long_payload_pages_get_truncated_index(tmp_path):
    """>256B-average byte-array columns (html payloads) used to carry NO
    page bounds at all — never prunable. The prefix-sliced scan gives
    them truncated bounds without a full-payload comparison pass."""
    rng = np.random.default_rng(7)
    big = [
        f"key-{i:05d}-".encode() + bytes(rng.integers(32, 127, 1500, dtype=np.uint8))
        for i in range(3000)
    ]
    t = pa.table(
        {"b": pa.array(big, type=pa.binary()), "k": pa.array(range(3000), type=pa.int64())}
    )
    p = str(tmp_path / "big.parquet")
    write_table(t, p, page_rows=256)
    ci = R.read_page_index(p)[0]["b"]["column_index"]
    assert ci is not None and ci["boundary_order"] == 1  # sorted prefixes
    assert all(len(m) <= 64 for m in ci["mins"] + ci["maxs"])
    # chunk-level stats exist too (pyarrow sees them)
    st = pq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    assert st.min == min(big)[:64] and st.max >= max(big)[:64]
    sub, info = R.read_table_pruned(p, "b", b"key-01000-", b"key-01099\xff")
    assert sub.num_rows == 100
    assert info["pages_read"] < info["pages_total"] // 2
    full = pq.read_table(p)
    got = sorted(sub.column("k").to_pylist())
    assert got == list(range(1000, 1100))


def test_foreign_invalid_utf8_bound_keeps_page(tmp_path):
    """A foreign writer's mid-codepoint-truncated string bound decodes
    to None (not a crash) and the page is conservatively kept."""
    vals = ["m" + "中" * 40 + f"{i:04d}" for i in range(1000)]
    t = pa.table({"s": pa.array(vals)})
    p = str(tmp_path / "foreign.parquet")
    write_table(t, p, page_rows=128)
    # simulate the foreign byte-level cut: patch one bound in the file
    # by rewriting through the reader's decode path instead — monkeypatch
    # is simpler: feed _plain_single a broken bound directly
    col = R._parse_schema(R.read_metadata(p)["meta"][2])[0]["col"]
    assert R._plain_single("中".encode()[:2], col) is None
    # and pruning treats a None bound as not-prunable, still exact
    sub, _ = R.read_table_pruned(p, "s", vals[10], vals[19])
    assert sub.num_rows == 10


def test_native_read_projection_excludes_predicate(ray_session):
    """range_filter / point_filter work when the projection omits the
    predicate column: the read widens, the output stays projected."""
    from parquet_go_ray.sources.wire import read_parquet_native

    path = "/root/testdata/sf0.001/lineitem.parquet"
    for kw in (
        {"range_filter": ("l_orderkey", 100, 200)},
        {"point_filter": ("l_orderkey", [100])},
    ):
        ds = read_parquet_native([path], columns=["l_returnflag"], **kw)
        total = 0
        for b in ds.iter_batches(batch_format="pyarrow"):
            assert b.column_names == ["l_returnflag"]
            total += b.num_rows
        assert total > 0


def test_wire_bloom_flba_probe(tmp_path):
    """UUID-style FLBA bloom probes: plain-bytes probe values cast to
    the column's fixed width so they hash the exact PLAIN layout the
    filter was built from (bloom.go FLBA support parity)."""
    import uuid

    ids = [uuid.UUID(int=i).bytes for i in range(1000)]
    t = pa.table({"id": pa.array(ids, type=pa.binary(16))})
    p = str(tmp_path / "flba.parquet")
    write_table(t, p, bloom_columns=("id",))
    may = R.bloom_may_contain(
        p, "id", [ids[5], ids[999], uuid.UUID(int=10**9).bytes]
    )
    assert may.tolist() == [True, True, False]


def test_wire_bloom_float_probe(tmp_path):
    """Float probes hash the 4-byte float32 PLAIN encoding the filter
    was built from (not the inferred float64 layout)."""
    t = pa.table({"score": pa.array([1.5, 2.5, 3.75], type=pa.float32())})
    p = str(tmp_path / "f.parquet")
    write_table(t, p, bloom_columns=("score",))
    assert R.bloom_may_contain(p, "score", [1.5]).any()
    assert R.bloom_may_contain(p, "score", [2.5, 9.9]).tolist() == [True, False]


def test_nested_leaves_paginate_with_column_index(tmp_path):
    """General Dremel-shredded leaves paginate at row boundaries and
    emit per-page ColumnIndex bounds + null counts, like flat columns
    (column_index.go:259-272 emits entries for every leaf)."""
    n = 2000
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "s": pa.array(
                [
                    {"a": int(i), "tags": [f"t{i % 7}", f"u{i % 3}"]}
                    if i % 11
                    else None
                    for i in range(n)
                ],
                type=pa.struct(
                    [("a", pa.int64()), ("tags", pa.list_(pa.string()))]
                ),
            ),
        }
    )
    p = str(tmp_path / "nested_pages.parquet")
    write_table(t, p, page_rows=256)
    # three independent readers agree on the data
    got = pq.read_table(p)
    assert got.column("s").combine_chunks().equals(
        t.column("s").combine_chunks()
    )
    ours = R.read_table(p)
    assert ours.column("s").combine_chunks().equals(
        t.column("s").combine_chunks()
    )
    # every leaf carries a populated page index, 2000/256 -> 8 pages
    idx = R.read_page_index(p)[0]
    assert set(idx) == {"id", "s.a", "s.tags.list.element"}
    for leaf, d in idx.items():
        assert len(d["offset_index"]["locations"]) == 8, leaf
        ci = d["column_index"]
        assert ci is not None, leaf
        assert len(ci["mins"]) == 8 and not any(ci["null_pages"])
    # s.a ascends with the data; per-page null counts track the i%11
    # null structs (~23-24 per 256-row page)
    ci = idx["s.a"]["column_index"]
    assert ci["boundary_order"] == 1
    assert ci["mins"][1] == 256 and ci["maxs"][1] == 511
    assert all(18 <= c <= 26 for c in ci["null_counts"])  # last page short
    # first_row_index is in ROWS (not entries), so page 3 starts at 768
    assert idx["s.tags.list.element"]["offset_index"]["locations"][3][2] == 768


def test_nested_all_null_page_and_dict_pages(tmp_path):
    """A page whose rows are ALL null structs marks null_page in the
    ColumnIndex; dict-encoded nested leaves slice their index stream
    per page against ONE shared dictionary page."""
    n = 1024
    vals = [
        None if 256 <= i < 512 else {"tag": f"k{i % 5}"} for i in range(n)
    ]
    t = pa.table(
        {
            "s": pa.array(vals, type=pa.struct([("tag", pa.string())])),
        }
    )
    p = str(tmp_path / "nulls.parquet")
    write_table(t, p, page_rows=256, encodings={"s": "rle_dictionary"})
    assert pq.read_table(p).column("s").combine_chunks().equals(
        t.column("s").combine_chunks()
    )
    assert R.read_table(p).column("s").combine_chunks().equals(
        t.column("s").combine_chunks()
    )
    ci = R.read_page_index(p)[0]["s.tag"]["column_index"]
    assert list(ci["null_pages"]) == [False, True, False, False]
    assert list(ci["null_counts"]) == [0, 256, 0, 0]
