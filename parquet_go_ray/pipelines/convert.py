"""Schema conversion / evolution (ConvertRowGroup parity, the
reference's convert.go:243-580 with its value-conversion matrix
convert.go:583 ff — bool/int/float/string/temporal cross-casts),
re-expressed as a vectorized per-batch projection+cast.

Rules, matching the reference's Convert semantics:
- column in target and source: value-cast to the target type;
- column only in target: filled with nulls (schema evolution);
- column only in source: dropped (projection);
- order follows the target schema.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def convert_value(arr: pa.ChunkedArray | pa.Array, target: pa.DataType):
    """One column cast covering the reference's conversion matrix."""
    src = arr.type
    if src == target:
        return arr
    # temporal: unit changes and date<->timestamp go through cast;
    # numeric <-> temporal goes through the epoch integer view
    if pa.types.is_timestamp(target) and pa.types.is_integer(src):
        return pc.cast(arr, target)
    if pa.types.is_integer(target) and pa.types.is_timestamp(src):
        return pc.cast(pc.cast(arr, pa.int64()), target)
    # bool -> number: cast; number -> bool: !=0 (Go-truthiness used by
    # the reference's convert matrix)
    if pa.types.is_boolean(src) and (pa.types.is_integer(target) or pa.types.is_floating(target)):
        return pc.cast(arr, target)
    if pa.types.is_boolean(target) and (pa.types.is_integer(src) or pa.types.is_floating(src)):
        return pc.not_equal(arr, pa.scalar(0).cast(src))
    # UUID (FLBA-16) <-> canonical string (type.go:1040 be128 semantics:
    # the textual form is the big-endian hex of the 16 bytes)
    if (
        pa.types.is_fixed_size_binary(src)
        and src.byte_width == 16
        and (pa.types.is_string(target) or pa.types.is_large_string(target))
    ):
        return _uuid_to_string(arr, target)
    if (
        (pa.types.is_string(src) or pa.types.is_large_string(src))
        and pa.types.is_fixed_size_binary(target)
        and target.byte_width == 16
    ):
        return _string_to_uuid(arr, target)
    # FLBA (non-16) <-> binary: plain byte reinterpretation
    if pa.types.is_fixed_size_binary(src) and pa.types.is_binary(target):
        return pc.cast(arr, target)
    # float -> integer narrows by rounding half away from zero (matching
    # SQL CAST semantics, so the DuckDB oracle agrees on non-integral
    # inputs), not by the unsafe cast's truncation toward zero
    if pa.types.is_floating(src) and pa.types.is_integer(target):
        rounded = pc.round(arr, 0, round_mode="half_towards_infinity")
        return pc.cast(rounded, target, safe=False)
    # everything else (numeric widening/narrowing, string<->number,
    # string<->temporal): Arrow cast, unsafe to permit narrowing like
    # the reference's lossy numeric conversions
    try:
        return pc.cast(arr, target)
    except pa.ArrowInvalid:
        return pc.cast(arr, target, safe=False)
    except pa.ArrowNotImplementedError:
        # e.g. binary -> string roundabout
        return pc.cast(pc.cast(arr, pa.string()), target, safe=False)


def _uuid_to_string(arr, target: pa.DataType):
    import uuid as _uuid

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = [
        None if v is None else str(_uuid.UUID(bytes=v))
        for v in arr.to_pylist()
    ]
    return pa.array(out, type=target)


def _string_to_uuid(arr, target: pa.DataType):
    import uuid as _uuid

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = [
        None if v is None else _uuid.UUID(v).bytes
        for v in arr.to_pylist()
    ]
    return pa.array(out, type=target)


def convert_table(t: pa.Table, target: pa.Schema) -> pa.Table:
    cols = []
    for field in target:
        if field.name in t.column_names:
            cols.append(convert_value(t.column(field.name), field.type))
        else:
            cols.append(pa.nulls(t.num_rows, type=field.type))
    return pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
        schema=target,
    )


def convert_dataset(ds: ray.data.Dataset, target: pa.Schema) -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: convert_table(t, target),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
