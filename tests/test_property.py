"""Hypothesis property tests: decode(encode(x)) == x for arbitrary
arrays (the reference's quick.Check layer, internal/quick/quick.go)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_ray.codecs import decode_array, encode_array
from parquet_go_ray.codecs import registry as R


def rt(arr: pa.Array, codec=None):
    out = decode_array(encode_array(arr, codec))
    assert out.type == arr.type
    assert out.equals(arr)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)), max_size=300
    )
)
def test_int64_any(values):
    rt(pa.array(values, type=pa.int64()))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=200))
def test_strings_any(values):
    arr = pa.array(values, type=pa.string())
    for codec in R.SUPPORTED[R.BYTE_ARRAY]:
        rt(arr, codec)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=60)), max_size=150))
def test_binary_any(values):
    rt(pa.array(values, type=pa.binary()))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, width=64),
        ),
        max_size=200,
    )
)
def test_double_any(values):
    rt(pa.array(values, type=pa.float64()))


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(st.none(), st.booleans()), max_size=300))
def test_bool_any(values):
    rt(pa.array(values, type=pa.bool_()))


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.integers(-1000, 1000), max_size=8)),
        max_size=60,
    )
)
def test_list_any(values):
    rt(pa.array(values, type=pa.list_(pa.int64())))


def test_wide_binary_values():
    """MB-scale payloads (heavy-tailed html case): the chunk layer must
    handle values far larger than the sample/train windows."""
    rng = np.random.default_rng(5)
    big = [
        rng.integers(0, 256, 3_000_000).astype(np.uint8).tobytes(),
        b"",
        b"<html>" + b"boilerplate " * 200_000 + b"</html>",
        None,
        b"x",
    ]
    arr = pa.array(big, type=pa.large_binary())
    rt(arr)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=5500),
    st.integers(min_value=0, max_value=5500),
    st.integers(min_value=1, max_value=4),
)
def test_wire_seek_rows_any_range(start, span, seed):
    """read_table_rows(s, e) == full read sliced, for ANY range over a
    multi-group multi-page file with nulls."""
    import tempfile, os

    from parquet_go_ray.codecs import parquet_wire as W
    from parquet_go_ray.codecs import parquet_wire_read as PR

    global _SEEK_FILES
    try:
        _SEEK_FILES
    except NameError:
        _SEEK_FILES = {}
    if seed not in _SEEK_FILES:
        rng = np.random.default_rng(seed)
        n = 5000
        t = pa.table(
            {
                "k": pa.array(np.arange(n), type=pa.int64()),
                "s": pa.array(
                    [None if i % 97 == 0 else f"v{i}" for i in range(n)]
                ),
            }
        )
        p = tempfile.mktemp(suffix=".parquet")
        W.write_table(t, p, page_rows=193, rows_per_group=1700)
        _SEEK_FILES[seed] = (p, t)
    p, t = _SEEK_FILES[seed]
    stop = start + span
    sub, _info = PR.read_table_rows(p, start, stop)
    exp = t.slice(start, max(0, min(stop, t.num_rows) - start))
    assert sub.cast(exp.schema).equals(exp)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8"), min_size=1, max_size=90
        ),
        min_size=1,
        max_size=40,
    )
)
def test_wire_string_bounds_always_valid(tmp_path_factory, vals):
    """Truncated string statistics are always valid UTF-8 AND true
    bounds, for arbitrary unicode around the 64-byte cut (a mid-codepoint
    cut used to crash pyarrow's stats decode on our files)."""
    import pyarrow.parquet as pq

    from parquet_go_ray.codecs.parquet_wire import write_table

    t = pa.table({"s": pa.array(vals)})
    p = str(tmp_path_factory.mktemp("wb") / "b.parquet")
    write_table(t, p, page_rows=7)
    st_ = pq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    if st_ is not None and st_.has_min_max:
        assert st_.min <= min(vals)
        assert st_.max >= max(vals) or st_.max > max(vals)[: len(st_.max)]
    # page index decodes and bounds hold per page
    from parquet_go_ray.codecs import parquet_wire_read as R2

    idx = R2.read_page_index(p)[0]["s"]["column_index"]
    if idx is not None:
        for m in idx["mins"]:
            assert m is None or isinstance(m, str)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.sampled_from(["aa", "ab", "abc", "b", "ba", ""])),
        max_size=200,
    ),
    st.sampled_from(["a", "ab", "b", ""]),
)
def test_dict_domain_mask_pred_matches_decoded(values, needle):
    """Encoded-domain pattern mask == the same predicate over decoded
    rows, for every codec the selector might pick (nulls are False)."""
    import pyarrow.compute as pc

    from parquet_go_ray.codecs.chunk import dict_domain_mask_pred

    arr = pa.array(values, type=pa.string())

    def pred(vals):
        if not needle:
            return pc.equal(pc.utf8_length(pc.cast(vals, pa.string())), 0)
        return pc.starts_with(vals, pattern=needle)

    want = [
        v is not None and (v.startswith(needle) if needle else v == "")
        for v in values
    ]
    for codec in R.SUPPORTED[R.BYTE_ARRAY]:
        blob = encode_array(arr, codec)
        mask = dict_domain_mask_pred(blob, pred)
        if mask is None:
            continue  # codec has no encoded domain: pipeline decodes
        assert mask.tolist() == want, R.CODEC_NAMES[blob[4]]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-1000, 1000)), min_size=1, max_size=300
    )
)
def test_null_mask_matches_is_null(values):
    """Header-validity null mask == Arrow is_null for any codec pick."""
    from parquet_go_ray.codecs.chunk import null_mask

    arr = pa.array(values, type=pa.int64())
    blob = encode_array(arr)
    assert null_mask(blob).tolist() == arr.is_null().to_pylist()


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(), st.lists(st.integers(-50, 50), max_size=5)
        ),
        min_size=1,
        max_size=100,
    )
)
def test_null_mask_on_list_chunks(values):
    from parquet_go_ray.codecs.chunk import null_mask

    arr = pa.array(values, type=pa.list_(pa.int64()))
    blob = encode_array(arr)
    assert null_mask(blob).tolist() == arr.is_null().to_pylist()
