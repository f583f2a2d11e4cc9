"""Dataclass model API: reflection parity with parquet-go's SchemaOf.

The reference derives a parquet schema — with per-column encodings,
compression codecs and logical types — from Go struct tags
(`parquet:"name,optional,dict,zstd"`, reference schema.go:380-880 and
node.go). Python has no struct tags; the idiomatic analogue is a
``@dataclass`` whose fields carry the SAME comma-separated tag grammar
in ``field(metadata={"parquet": "..."})`` or ``typing.Annotated[T,
"..."]``.  ``schema_of(cls)`` walks the dataclass exactly the way
``parquet.SchemaOf`` walks a struct and returns a :class:`ModelSchema`:

- ``arrow_schema``   — the pyarrow schema of the derived table,
- ``codec_overrides``— column -> engine codec name, from the encoding
  tag options (``plain``/``dict``/``delta``/``split``), consumable by
  ``ChunkEncoder``/``encode_job`` (reference: tags select
  encoding.Encoding per leaf, schema.go:734-771),
- ``compression``    — column -> page codec (``snappy``/``zstd``/...)
  with the same per-column semantics as the reference's per-leaf
  compress.Codec (schema.go:716-733),
- ``to_table(objs)`` / ``from_table(table)`` — row-model converters,
  the analogue of the reference's row reconstruct/deconstruct
  (row.go, column_mapping.go) built on pyarrow instead of reflection.

Tag grammar (identical to the reference, schema.go:582-607):
``"<name>[,option[(args)]]*"`` — the first comma-separated item renames
the column (empty keeps the field name; ``-`` drops the field; ``-,``
names the column literally ``-``).  Supported options and their type
constraints mirror schema.go:704-860:

====================  =======================================================
``optional``          nullable column (on a list field it applies to the
                      ELEMENTS, mirroring schema.go:846-860)
``snappy`` ``gzip`` ``brotli`` ``lz4`` ``zstd`` ``uncompressed``
                      page compression for this column
``plain`` ``dict``    force the engine codec
``delta``             ints -> delta_binary_packed, str/bytes ->
                      delta_byte_array (schema.go:743-764)
``split``             floats -> byte_stream_split (schema.go:765-771)
``json``              store any value as a JSON string column
``enum``              string logical type ENUM (dict-forced)
``uuid``              16-byte fixed-len binary (bytes or uuid.UUID)
``decimal(s:p)``      int -> decimal128(p, s) (schema.go:801-818)
``date``              datetime.date / int -> date32
``timestamp(unit)``   int / datetime -> timestamp; unit in
                      millisecond|microsecond|nanosecond, default
                      millisecond (schema.go:626-646)
``list``              explicit list annotation for a list field
====================  =======================================================

Untagged defaults follow nodeOf (schema.go:480-540): bool, int->int64,
float->float64, str->string, bytes->binary, datetime->timestamp[ns]
(schema.go:494-495), date->date32, uuid.UUID->FLBA(16), numpy scalar
types keep their width (the analogue of Go's sized ints), nested
dataclass->struct, list[T]->list, dict[K,V]->map (key/value tags via
``parquet-key`` / ``parquet-value`` metadata, schema.go:540-570).
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import decimal as _decimal
import json as _json
import types as _types
import typing
import uuid as _uuid

import numpy as np
import pyarrow as pa

_COMPRESSIONS = {
    "snappy": "snappy",
    "gzip": "gzip",
    "brotli": "brotli",
    "lz4": "lz4",
    "zstd": "zstd",
    "uncompressed": None,
}

_TIME_UNITS = {"millisecond": "ms", "microsecond": "us", "nanosecond": "ns"}

_SCALAR_TYPES: dict[type, pa.DataType] = {
    bool: pa.bool_(),
    int: pa.int64(),
    float: pa.float64(),
    str: pa.string(),
    bytes: pa.binary(),
    _dt.datetime: pa.timestamp("ns"),
    _dt.date: pa.date32(),
    _uuid.UUID: pa.binary(16),
    np.int8: pa.int8(),
    np.int16: pa.int16(),
    np.int32: pa.int32(),
    np.int64: pa.int64(),
    np.uint8: pa.uint8(),
    np.uint16: pa.uint16(),
    np.uint32: pa.uint32(),
    np.uint64: pa.uint64(),
    np.float32: pa.float32(),
    np.float64: pa.float64(),
    np.float16: pa.float16(),
}

_INT_TYPES = (int, np.int8, np.int16, np.int32, np.int64,
              np.uint8, np.uint16, np.uint32, np.uint64)
_FLOAT_TYPES = (float, np.float32, np.float64)


class InvalidTagError(ValueError):
    """A tag option is invalid for the field's type — the analogue of
    the reference's throwInvalidTag/throwUnknownTag (schema.go:862+)."""


def _split_tag(tag: str) -> tuple[str, list[tuple[str, str]]]:
    """First item = name override; rest = (option, args) pairs.

    Mirrors split/splitOptionArgs (schema.go:582-607): args are the
    parenthesized suffix, defaulting to ``()``.
    """
    head, _, tail = tag.partition(",")
    opts = []
    items = tail.split(",") if tail else []
    for item in items:
        i = item.find("(")
        if i >= 0:
            opts.append((item[:i], item[i:]))
        else:
            opts.append((item, "()"))
    return head, opts


def _parse_args(args: str, what: str) -> str:
    if not (args.startswith("(") and args.endswith(")")):
        raise InvalidTagError(f"malformed {what} args: {args}")
    return args[1:-1]


@dataclasses.dataclass
class _FieldSpec:
    name: str               # column name
    attr: str               # dataclass attribute
    type: pa.DataType
    nullable: bool = False
    codec: str | None = None        # engine codec override
    compression: str | None = None  # page codec (None = engine default)
    logical: str | None = None      # json|enum|uuid|date|timestamp|decimal
    py_type: type | None = None     # leaf python type for conversion
    elem_nullable: bool = False     # list fields: optional elements
    decimal_scale: int = 0          # decimal fields: 10^-scale factor
    is_map: bool = False            # dict fields stored as arrow map


@dataclasses.dataclass
class ModelSchema:
    """Derived schema + converters for one dataclass model."""

    model: type
    fields: list[_FieldSpec]

    @property
    def arrow_schema(self) -> pa.Schema:
        return pa.schema(
            [pa.field(f.name, f.type, nullable=f.nullable) for f in self.fields]
        )

    @property
    def codec_overrides(self) -> dict[str, str]:
        return {f.name: f.codec for f in self.fields if f.codec}

    @property
    def compression(self) -> dict[str, str]:
        return {
            f.name: f.compression for f in self.fields if f.compression
        }

    # -- row-model conversion (reference: row deconstruct/reconstruct,
    #    row.go + column_mapping.go — here pyarrow does the shredding) --

    def to_table(self, objs: typing.Sequence) -> pa.Table:
        cols = {}
        for f in self.fields:
            vals = [getattr(o, f.attr) for o in objs]
            cols[f.name] = pa.array(
                [_to_storage(v, f) for v in vals], type=f.type
            )
        return pa.table(cols)

    def from_table(self, table: pa.Table) -> list:
        objs = []
        cols = {
            f.attr: (f, table.column(f.name).to_pylist())
            for f in self.fields
        }
        # fields tagged "-" are absent from storage; they come back as
        # their dataclass default (mirrors the reference's zero value)
        for i in range(table.num_rows):
            kw = {
                attr: _from_storage(vals[i], f)
                for attr, (f, vals) in cols.items()
            }
            objs.append(self.model(**kw))
        return objs


def _to_storage(v, f: _FieldSpec):
    if v is None:
        return None
    if f.logical == "json":
        return _json.dumps(v, sort_keys=True, separators=(",", ":"))
    if isinstance(v, _uuid.UUID):
        return v.bytes
    if f.logical == "decimal" and isinstance(v, _INT_TYPES):
        # the int is the UNSCALED value, exactly like the reference's
        # int32/int64 decimal leaves (schema.go:801-818)
        return _decimal.Decimal(int(v)).scaleb(-f.decimal_scale)
    return _plainify(v)


def _plainify(v):
    """Nested dataclasses -> dicts keyed by their (possibly renamed)
    column names, recursively; UUIDs -> 16 raw bytes."""
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        ms = schema_of(type(v))
        return {f.name: _to_storage(getattr(v, f.attr), f) for f in ms.fields}
    if isinstance(v, list):
        return [_plainify(x) for x in v]
    if isinstance(v, _uuid.UUID):
        return v.bytes
    return v


def _from_storage(v, f: _FieldSpec):
    if v is None:
        return None
    if f.logical == "json":
        return _json.loads(v)
    if f.py_type is _uuid.UUID:
        return _uuid.UUID(bytes=v)
    if f.logical == "decimal" and f.py_type in _INT_TYPES:
        return int(_decimal.Decimal(v).scaleb(f.decimal_scale))
    if (
        f.logical == "timestamp"
        and f.py_type in _INT_TYPES
        and isinstance(v, _dt.datetime)
    ):
        # int fields tagged timestamp round-trip as epoch ints in the
        # declared unit, like the reference's int64 timestamp leaves
        micros = (v - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
        unit = f.type.unit
        return {
            "ms": micros // 1000,
            "us": micros,
            "ns": micros * 1000,
        }[unit]
    if f.is_map and isinstance(v, list):
        # arrow map scalars read back as [(key, value), ...]
        return dict(v)
    if (
        f.py_type is not None
        and dataclasses.is_dataclass(f.py_type)
        and isinstance(v, dict)
    ):
        ms = schema_of(f.py_type)
        return ms.model(
            **{sf.attr: _from_storage(v.get(sf.name), sf) for sf in ms.fields}
        )
    return v


def _scalar_type(t: type, where: str) -> pa.DataType:
    ty = _SCALAR_TYPES.get(t)
    if ty is None:
        raise InvalidTagError(
            f"cannot build a parquet node from python type {t!r} ({where})"
        )
    return ty


def schema_of(cls: type) -> ModelSchema:
    """Derive a ModelSchema from a dataclass — parquet.SchemaOf parity.

    Reference: schema.go:380-460 (SchemaOf/structNodeOf) with the tag
    grammar of schema.go:582-880.
    """
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"schema_of expects a dataclass, got {cls!r}")
    hints = typing.get_type_hints(cls, include_extras=True)
    specs: list[_FieldSpec] = []
    for fl in dataclasses.fields(cls):
        spec = _field_spec(fl, hints[fl.name])
        if spec is not None:
            specs.append(spec)
    return ModelSchema(model=cls, fields=specs)


def _unwrap(hint):
    """Returns (base_type, tag_from_annotated, optional_from_hint)."""
    tag = None
    if typing.get_origin(hint) is typing.Annotated:
        args = typing.get_args(hint)
        hint = args[0]
        for extra in args[1:]:
            if isinstance(extra, str):
                tag = extra
    optional = False
    origin = typing.get_origin(hint)
    if origin is typing.Union or origin is _types.UnionType:
        args = [a for a in typing.get_args(hint) if a is not type(None)]
        if len(args) != 1 or len(typing.get_args(hint)) != 2:
            raise InvalidTagError(
                f"only Optional[T] unions are supported, got {hint!r}"
            )
        hint, optional = args[0], True
    return hint, tag, optional


def _field_spec(fl: dataclasses.Field, hint) -> _FieldSpec | None:
    base, ann_tag, optional = _unwrap(hint)
    tag = fl.metadata.get("parquet", ann_tag) if fl.metadata else ann_tag
    tag = tag or ""
    name, opts = _split_tag(tag)
    if name == "-" and "," not in tag:
        return None  # `parquet:"-"` drops the field (schema_test.go:73)
    col = name if name else fl.name

    spec = _FieldSpec(name=col, attr=fl.name, type=pa.null(), nullable=optional)
    spec.py_type = base if isinstance(base, type) else None

    encoded = compressed = None
    node: pa.DataType | None = None
    want_list = False
    tag_optional = False

    origin = typing.get_origin(base)

    def set_encoding(codec: str):
        nonlocal encoded
        if encoded is not None:
            raise InvalidTagError(
                f"field {fl.name} has encoding declared multiple times"
            )
        encoded = codec

    def set_compression(c: str | None):
        nonlocal compressed
        if compressed == "SET":
            raise InvalidTagError(
                f"field {fl.name} has compression declared multiple times"
            )
        compressed = "SET"
        spec.compression = c

    def set_node(ty: pa.DataType, logical: str | None = None):
        nonlocal node
        node = ty
        if logical:
            spec.logical = logical

    for option, args in opts:
        if origin is dict and option not in ("", "json", "optional"):
            raise InvalidTagError(
                f"unknown map tag option {option!r} on field {fl.name}"
            )
        if option == "":
            continue
        elif option == "optional":
            spec.nullable = True
            tag_optional = True
        elif option in _COMPRESSIONS:
            set_compression(_COMPRESSIONS[option])
        elif option == "plain":
            set_encoding("plain")
        elif option == "dict":
            set_encoding("dict")
        elif option == "json":
            set_node(pa.string(), "json")
        elif option == "delta":
            if isinstance(base, type) and issubclass(base, _INT_TYPES):
                set_encoding("delta_binary_packed")
            elif base is str or base is bytes:
                set_encoding("delta_byte_array")
            else:
                raise InvalidTagError(
                    f"delta is not valid for field {fl.name} of {base!r}"
                )
        elif option == "split":
            if isinstance(base, type) and issubclass(base, _FLOAT_TYPES):
                set_encoding("byte_stream_split")
            else:
                raise InvalidTagError(
                    f"split is not valid for field {fl.name} of {base!r}"
                )
        elif option == "list":
            if origin is not list:
                raise InvalidTagError(
                    f"list is not valid for field {fl.name} of {base!r}"
                )
            want_list = True
        elif option == "enum":
            if base is not str:
                raise InvalidTagError(
                    f"enum is not valid for field {fl.name} of {base!r}"
                )
            set_node(pa.string(), "enum")
            set_encoding("dict")
        elif option == "uuid":
            if base not in (bytes, _uuid.UUID):
                raise InvalidTagError(
                    f"uuid is not valid for field {fl.name} of {base!r}"
                )
            set_node(pa.binary(16), "uuid")
        elif option == "decimal":
            body = _parse_args(args, "decimal")
            parts = body.split(":")
            if len(parts) != 2:
                raise InvalidTagError(f"malformed decimal args: ({body})")
            scale, precision = int(parts[0]), int(parts[1])
            if not (isinstance(base, type) and issubclass(base, _INT_TYPES)):
                raise InvalidTagError(
                    f"decimal is not valid for field {fl.name} of {base!r}"
                )
            set_node(pa.decimal128(precision, scale), "decimal")
            spec.decimal_scale = scale
        elif option == "date":
            if base not in (_dt.date, int, np.int32):
                raise InvalidTagError(
                    f"date is not valid for field {fl.name} of {base!r}"
                )
            set_node(pa.date32(), "date")
        elif option == "timestamp":
            body = _parse_args(args, "timestamp")
            unit = _TIME_UNITS.get(body or "millisecond")
            if unit is None:
                raise InvalidTagError(f"unknown time unit: {body}")
            if base not in (int, np.int64, _dt.datetime):
                raise InvalidTagError(
                    f"timestamp is not valid for field {fl.name} of {base!r}"
                )
            set_node(pa.timestamp(unit), "timestamp")
        else:
            raise InvalidTagError(
                f"unknown tag option {option!r} on field {fl.name}"
            )

    if node is None and origin is dict and fl.metadata and (
        "parquet-key" in fl.metadata or "parquet-value" in fl.metadata
    ):
        # map key/value sub-tags (schema.go:540-570: the parquet-key /
        # parquet-value struct tags); only TYPE options apply here
        k, v = typing.get_args(base)
        k, _, _ = _unwrap(k)
        v, _, _ = _unwrap(v)
        node = pa.map_(
            _tagged_node(k, fl.metadata.get("parquet-key", ""), fl.name),
            _tagged_node(v, fl.metadata.get("parquet-value", ""), fl.name),
        )
    if node is None:
        node = _node_of(base, fl.name)
        # a TAGGED "optional" on a list applies to the elements
        # (schema.go:846-860); an Optional[list[T]] ANNOTATION instead
        # makes the list column itself nullable (the Pythonic reading)
        if origin is list and tag_optional and not optional:
            elem, _, _ = _unwrap(typing.get_args(base)[0])
            if elem is not bytes:
                node = pa.list_(pa.field("item", node.value_type, nullable=True))
                spec.elem_nullable = True
                spec.nullable = False
    elif origin is list and want_list:
        node = pa.list_(node)

    spec.type = node
    spec.codec = encoded
    spec.is_map = pa.types.is_map(node)
    return spec


def _tagged_node(t, tag: str, where: str) -> pa.DataType:
    """Map-key/value node with type-option tags applied (the subset of
    the grammar valid inside a map per schema.go:540-570 — logical
    types only; encodings/compression are per-LEAF-column and invalid
    here, mirroring throwUnknownTag)."""
    name, opts = _split_tag(tag)
    node = None
    for option, args in opts:
        if option in ("", "optional"):
            continue
        elif option == "json":
            node = pa.string()
        elif option == "enum":
            if t is not str:
                raise InvalidTagError(f"enum on non-string map part ({where})")
            node = pa.string()
        elif option == "uuid":
            node = pa.binary(16)
        elif option == "date":
            node = pa.date32()
        elif option == "timestamp":
            body = _parse_args(args, "timestamp")
            unit = _TIME_UNITS.get(body or "millisecond")
            if unit is None:
                raise InvalidTagError(f"unknown time unit: {body}")
            node = pa.timestamp(unit)
        elif option == "decimal":
            body = _parse_args(args, "decimal")
            parts = body.split(":")
            if len(parts) != 2:
                raise InvalidTagError(f"malformed decimal args: ({body})")
            node = pa.decimal128(int(parts[1]), int(parts[0]))
        else:
            raise InvalidTagError(
                f"unknown map key/value tag option {option!r} ({where})"
            )
    return node if node is not None else _node_of(t, where)


def _node_of(t, where: str) -> pa.DataType:
    """Untagged type mapping — nodeOf parity (schema.go:480-540)."""
    origin = typing.get_origin(t)
    if origin is list:
        (elem,) = typing.get_args(t)
        elem, _, e_opt = _unwrap(elem)
        inner = _node_of(elem, where)
        if e_opt:
            return pa.list_(pa.field("item", inner, nullable=True))
        return pa.list_(inner)
    if origin is dict:
        k, v = typing.get_args(t)
        k, _, _ = _unwrap(k)
        v, _, v_opt = _unwrap(v)
        return pa.map_(_node_of(k, where), _node_of(v, where))
    if dataclasses.is_dataclass(t):
        sub = schema_of(t)
        return pa.struct(
            [pa.field(f.name, f.type, nullable=f.nullable) for f in sub.fields]
        )
    if isinstance(t, type):
        return _scalar_type(t, where)
    raise InvalidTagError(f"cannot map python type {t!r} ({where})")


# -- store round-trip convenience (parquet.Write / parquet.Read parity,
#    reference writer.go Write(T) / reader.go Read(T)) ------------------


def write_model(
    objs: typing.Sequence, out_dir: str, *, schema: ModelSchema | None = None, **kw
) -> dict:
    """Encode a sequence of dataclass instances into a chunk store,
    honoring the model's per-column codec and compression tags."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..pipelines.encode import encode_job

    if not objs:
        raise ValueError("write_model needs at least one row")
    ms = schema or schema_of(type(objs[0]))
    table = ms.to_table(objs)
    tmp = tempfile.mkdtemp(prefix="model_in_")
    try:
        staged = f"{tmp}/rows.parquet"
        pq.write_table(table, staged)
        kw.setdefault("bloom_columns", ())
        kw.setdefault("codec_overrides", ms.codec_overrides)
        comp = ms.compression
        if comp and "compression" not in kw:
            kw["compression"] = comp
        return encode_job([staged], out_dir, **kw)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def read_model(cls: type, store_dir: str, *, schema: ModelSchema | None = None) -> list:
    """Decode a chunk store back into dataclass instances."""
    from ..pipelines.decode import decode_dataset

    ms = schema or schema_of(cls)
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in decode_dataset(store_dir).iter_batches(batch_format="pyarrow")
    ]
    table = pa.concat_tables(tables) if tables else ms.arrow_schema.empty_table()
    names = [f.name for f in ms.fields if f.name in table.column_names]
    return ms.from_table(table.select(names))
