"""Dataclass model API — reflection parity with parquet.SchemaOf.

Mirrors the reference's schema_test.go cases (tag grammar, renames,
field dropping, optional-on-list semantics, logical types) and
writer_test.go's struct round-trips, on the engine's chunk store.
"""

from __future__ import annotations

import datetime
import uuid
from dataclasses import dataclass, field
from typing import Annotated, Optional

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.functions.model import (
    InvalidTagError,
    read_model,
    schema_of,
    write_model,
)


@dataclass
class Inner:
    first_name: Annotated[str, "first_name"]
    dropped: Annotated[str, "-"] = ""


@dataclass
class Page:
    url: Annotated[str, "url,dict,zstd"]
    warc_ts: Annotated[int, "warc_ts,timestamp(microsecond)"]
    html: Annotated[bytes, "html,delta,snappy"]
    text: Annotated[str, ",plain"]
    lang: Annotated[str, ",enum"]
    score: Annotated[float, "score,split"]
    price_cents: Annotated[int, "price,decimal(2:9)"]
    day: Annotated[datetime.date, "day,date"]
    uid: Annotated[uuid.UUID, "uid,uuid"]
    meta: Annotated[dict, "meta,json"]
    tags: Annotated[list[str], "tags,optional"]
    inner: Optional[Inner] = None
    n32: np.int32 = np.int32(0)


def _pages(n=5):
    return [
        Page(
            url=f"https://example.com/{i}",
            warc_ts=1_700_000_000_000_000 + i,
            html=f"<p>page {i}</p>".encode(),
            text=f"hello world {i}",
            lang=["en", "de", "fr"][i % 3],
            score=1.5 * i,
            price_cents=12345 + i,
            day=datetime.date(2026, 1, 1) + datetime.timedelta(days=i),
            uid=uuid.uuid5(uuid.NAMESPACE_URL, str(i)),
            meta={"k": i, "nested": [1, 2]},
            tags=["a", None, f"t{i}"],
            inner=Inner(first_name=f"name{i}"),
            n32=np.int32(7 * i),
        )
        for i in range(n)
    ]


class TestSchemaDerivation:
    def test_types_match_tags(self):
        ms = schema_of(Page)
        s = ms.arrow_schema
        assert s.field("url").type == pa.string()
        assert s.field("warc_ts").type == pa.timestamp("us")
        assert s.field("price").type == pa.decimal128(9, 2)
        assert s.field("day").type == pa.date32()
        assert s.field("uid").type == pa.binary(16)
        assert s.field("meta").type == pa.string()  # json -> string
        assert s.field("n32").type == pa.int32()
        assert pa.types.is_struct(s.field("inner").type)

    def test_encoding_tags_become_codec_overrides(self):
        ms = schema_of(Page)
        assert ms.codec_overrides == {
            "url": "dict",
            "html": "delta_byte_array",
            "text": "plain",
            "lang": "dict",  # enum forces dict
            "score": "byte_stream_split",
        }

    def test_compression_tags_per_column(self):
        ms = schema_of(Page)
        assert ms.compression == {"url": "zstd", "html": "snappy"}

    def test_rename_and_drop(self):
        ms = schema_of(Inner)
        assert [f.name for f in ms.fields] == ["first_name"]

    def test_dash_comma_names_column_dash(self):
        # schema_test.go:86-88: `parquet:"-,"` names the column "-"
        @dataclass
        class D:
            x: Annotated[str, "-,"]

        ms = schema_of(D)
        assert [f.name for f in ms.fields] == ["-"]

    def test_optional_on_list_applies_to_elements(self):
        # schema.go:846-860: tagged optional on a slice -> optional items
        ms = schema_of(Page)
        f = ms.arrow_schema.field("tags")
        assert not f.nullable
        assert f.type.value_field.nullable

    def test_optional_annotation_makes_column_nullable(self):
        ms = schema_of(Page)
        assert ms.arrow_schema.field("inner").nullable

    def test_map_field(self):
        @dataclass
        class M:
            a: dict[int, str]

        ms = schema_of(M)
        assert pa.types.is_map(ms.arrow_schema.field("a").type)

    def test_delta_on_string_is_delta_byte_array(self):
        @dataclass
        class D:
            s: Annotated[str, ",delta"]

        assert schema_of(D).codec_overrides == {"s": "delta_byte_array"}

    def test_timestamp_default_unit_is_millisecond(self):
        # schema.go:632-635: empty args -> Millisecond
        @dataclass
        class T:
            t: Annotated[int, ",timestamp"]

        assert schema_of(T).arrow_schema.field("t").type == pa.timestamp("ms")


class TestTagErrors:
    def test_split_on_int_rejected(self):
        @dataclass
        class B:
            x: Annotated[int, "x,split"]

        with pytest.raises(InvalidTagError):
            schema_of(B)

    def test_delta_on_float_rejected(self):
        @dataclass
        class B:
            x: Annotated[float, "x,delta"]

        with pytest.raises(InvalidTagError):
            schema_of(B)

    def test_enum_on_int_rejected(self):
        @dataclass
        class B:
            x: Annotated[int, "x,enum"]

        with pytest.raises(InvalidTagError):
            schema_of(B)

    def test_double_encoding_rejected(self):
        @dataclass
        class B:
            x: Annotated[str, "x,plain,delta"]

        with pytest.raises(InvalidTagError):
            schema_of(B)

    def test_double_compression_rejected(self):
        @dataclass
        class B:
            x: Annotated[str, "x,zstd,snappy"]

        with pytest.raises(InvalidTagError):
            schema_of(B)

    def test_unknown_option_rejected(self):
        @dataclass
        class B:
            x: Annotated[str, "x,bogus"]

        with pytest.raises(InvalidTagError):
            schema_of(B)

    def test_malformed_decimal_rejected(self):
        @dataclass
        class B:
            x: Annotated[int, "x,decimal(2)"]

        with pytest.raises(InvalidTagError):
            schema_of(B)

    def test_map_rejects_encoding_options(self):
        # schema.go:560-569: map tags accept only optional/json
        @dataclass
        class B:
            x: Annotated[dict[str, str], "x,dict"]

        with pytest.raises(InvalidTagError):
            schema_of(B)


class TestRowConversion:
    def test_table_roundtrip_is_identity(self):
        ms = schema_of(Page)
        rows = _pages()
        back = ms.from_table(ms.to_table(rows))
        for r, b in zip(rows, back):
            assert b.url == r.url
            assert b.warc_ts == r.warc_ts  # int stays int (epoch us)
            assert b.html == r.html
            assert b.price_cents == r.price_cents  # unscaled int parity
            assert b.day == r.day
            assert b.uid == r.uid
            assert b.meta == r.meta  # json round-trip
            assert b.tags == r.tags
            assert b.inner == Inner(first_name=r.inner.first_name)
            assert b.n32 == r.n32

    def test_metadata_tag_spelling(self):
        # field(metadata={"parquet": ...}) is equivalent to Annotated
        @dataclass
        class M:
            a: str = field(metadata={"parquet": "renamed,dict"}, default="")

        ms = schema_of(M)
        assert [f.name for f in ms.fields] == ["renamed"]
        assert ms.codec_overrides == {"renamed": "dict"}


class TestStoreRoundtrip:
    def test_write_read_model(self, tmp_path, ray_session):
        rows = _pages(20)
        out = str(tmp_path / "store")
        summary = write_model(rows, out)
        assert summary["rows"] == 20
        back = read_model(Page, out)
        back.sort(key=lambda p: p.url)
        want = sorted(rows, key=lambda p: p.url)
        for r, b in zip(want, back):
            assert b.url == r.url
            assert b.html == r.html
            assert b.uid == r.uid
            assert b.meta == r.meta
            assert b.warc_ts == r.warc_ts

    def test_forced_codecs_reach_the_manifest(self, tmp_path, ray_session):
        from parquet_go_ray.state import manifest

        rows = _pages(20)
        out = str(tmp_path / "store")
        write_model(rows, out)
        hist = manifest.codec_histogram(out)
        assert "byte_stream_split" in hist  # score tag honored


class TestMapKeyValueTags:
    def test_key_and_value_tags(self):
        # schema_test.go:124/173: parquet-key / parquet-value tags
        @dataclass
        class M:
            a: dict[int, str] = field(
                default_factory=dict,
                metadata={
                    "parquet": "a",
                    "parquet-key": ",timestamp(microsecond)",
                    "parquet-value": ",json",
                },
            )

        ms = schema_of(M)
        ty = ms.arrow_schema.field("a").type
        assert pa.types.is_map(ty)
        assert ty.key_type == pa.timestamp("us")
        assert ty.item_type == pa.string()

    def test_bad_map_part_tag_rejected(self):
        @dataclass
        class B:
            a: dict[int, str] = field(
                default_factory=dict,
                metadata={"parquet-value": ",split"},
            )

        with pytest.raises(InvalidTagError):
            schema_of(B)

    def test_map_store_roundtrip(self, tmp_path, ray_session):
        # regression: decoded maps must survive SCALAR access (the
        # entries-struct invariant), not just buffer equality
        @dataclass
        class Plain:
            eid: int
            kv: dict[str, int] = field(default_factory=dict)

        rows = [Plain(eid=i, kv={"a": i, "b": 2 * i}) for i in range(8)]
        out = str(tmp_path / "mapstore")
        write_model(rows, out)
        back = sorted(read_model(Plain, out), key=lambda e: e.eid)
        assert [b.kv for b in back] == [r.kv for r in rows]
