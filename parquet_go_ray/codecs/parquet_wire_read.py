"""Wire-level Parquet READER: parses real ``.parquet`` files — thrift
compact footer, page headers, def levels, and every page payload —
with THIS repo's own decoders (plain / rle / dictionary / delta /
bytestreamsplit), no pyarrow parquet involvement.

Together with codecs/parquet_wire (the writer) this closes the interop
loop at the byte level: files written by the reference (its golden
corpus under /root/reference/testdata, the same set file_test.go:13-30
iterates) or by pyarrow decode through our own code paths, and files
we write decode through theirs. Reference semantics: file_.go /
column.go:541-690 (chunk+page iteration), format/parquet.thrift
(metadata structs), deprecated/int96.go (INT96 timestamps — decoded
here as timestamp[ns], closing that compat gap).

Scope: flat primitive columns (optional or required), data pages V1
and V2, PLAIN / RLE / PLAIN_DICTIONARY / RLE_DICTIONARY /
DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY /
BYTE_STREAM_SPLIT encodings, snappy/zstd/gzip/brotli page compression,
INT96 and INT32/INT64/FLBA/BYTE_ARRAY decimals.
"""

from __future__ import annotations

import struct
import zlib
from decimal import Decimal

import numpy as np
import pyarrow as pa

from . import bytestreamsplit as bss
from . import delta, plain, rle

# thrift compact type codes
_CT_STOP = 0
_CT_TRUE, _CT_FALSE = 1, 2
_CT_BYTE, _CT_I16, _CT_I32, _CT_I64 = 3, 4, 5, 6
_CT_DOUBLE, _CT_BINARY, _CT_LIST, _CT_SET, _CT_MAP, _CT_STRUCT = 7, 8, 9, 10, 11, 12


class WireFormatError(ValueError):
    pass


def _uvarint(buf, pos):
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _unzig(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


class _TR:
    """Thrift compact-protocol struct reader (just what footers need)."""

    def __init__(self, buf, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def struct(self) -> dict:
        out = {}
        last = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            if b == _CT_STOP:
                return out
            t = b & 0x0F
            delta_id = b >> 4
            if delta_id:
                fid = last + delta_id
            else:
                z, self.pos = _uvarint(self.buf, self.pos)
                fid = _unzig(z)
            out[fid] = self._value(t)
            last = fid

    def _value(self, t: int):
        if t == _CT_TRUE:
            return True
        if t == _CT_FALSE:
            return False
        if t == _CT_BYTE:
            v = self.buf[self.pos]
            self.pos += 1
            return v
        if t in (_CT_I16, _CT_I32, _CT_I64):
            z, self.pos = _uvarint(self.buf, self.pos)
            return _unzig(z)
        if t == _CT_DOUBLE:
            (v,) = struct.unpack_from("<d", self.buf, self.pos)
            self.pos += 8
            return v
        if t == _CT_BINARY:
            n, self.pos = _uvarint(self.buf, self.pos)
            v = bytes(self.buf[self.pos : self.pos + n])
            self.pos += n
            return v
        if t in (_CT_LIST, _CT_SET):
            h = self.buf[self.pos]
            self.pos += 1
            n = h >> 4
            if n == 15:
                n, self.pos = _uvarint(self.buf, self.pos)
            et = h & 0x0F
            if et in (_CT_TRUE, _CT_FALSE):
                # bool collection elements are one byte each (1=true),
                # unlike field-header bools
                vals = [self.buf[self.pos + i] == _CT_TRUE for i in range(n)]
                self.pos += n
                return vals
            return [self._value(et) for _ in range(n)]
        if t == _CT_STRUCT:
            return self.struct()
        raise WireFormatError(f"unsupported thrift type {t}")


# parquet enums
_T_BOOLEAN, _T_INT32, _T_INT64, _T_INT96 = 0, 1, 2, 3
_T_FLOAT, _T_DOUBLE, _T_BYTE_ARRAY, _T_FLBA = 4, 5, 6, 7

_DECOMP = {1: "snappy", 2: "gzip", 4: "brotli", 6: "zstd", 7: "lz4_raw"}


def _decompress(data: bytes, codec: int, raw_len: int) -> bytes:
    if codec == 0:
        return data
    name = _DECOMP.get(codec)
    if name is None:
        raise WireFormatError(f"unsupported compression codec {codec}")
    return pa.Codec(name).decompress(data, raw_len, asbytes=True)


class _Column:
    """Leaf schema element + arrow type mapping."""

    def __init__(self, el: dict):
        self.name = el[4].decode()
        self.ptype = el.get(1)
        self.type_length = el.get(2)
        self.optional = el.get(3, 0) == 1
        self.converted = el.get(6)
        self.scale = el.get(7, 0)
        self.precision = el.get(8, 0)
        self.logical = el.get(10) or {}

    def annotation(self) -> str | None:
        """ENUM/JSON/BSON tag, surfaced as field metadata so a
        read->write round trip re-emits the annotation."""
        c, lt = self.converted, self.logical
        if c == 4 or 4 in lt:
            return "ENUM"
        if c == 19 or 12 in lt:
            return "JSON"
        if c == 20 or 13 in lt:
            return "BSON"
        return None

    def arrow_type(self) -> pa.DataType:
        p, c = self.ptype, self.converted
        lt = self.logical
        if p == _T_BOOLEAN:
            return pa.bool_()
        if p == _T_INT32:
            if 11 in lt:  # LogicalType NULL/UNKNOWN
                return pa.null()
            if c == 5 or 5 in lt:
                d = lt.get(5, {})
                return pa.decimal128(d.get(2, self.precision), d.get(1, self.scale))
            if c == 6 or 6 in lt:
                return pa.date32()
            if c == 7 or 7 in lt:  # TIME_MILLIS
                return pa.time32("ms")
            if 10 in lt:
                bits, signed = lt[10].get(1, 32), lt[10].get(2, True)
                return getattr(pa, f"{'' if signed else 'u'}int{bits}")()
            if c in (11, 12, 13):
                return getattr(pa, f"uint{8 << (c - 11)}")()
            if c in (15, 16, 17):
                return getattr(pa, f"int{8 << (c - 15)}")()
            return pa.int32()
        if p == _T_INT64:
            if c == 5 or 5 in lt:
                d = lt.get(5, {})
                return pa.decimal128(d.get(2, self.precision), d.get(1, self.scale))
            if 8 in lt:  # TIMESTAMP logical
                unit = {1: "ms", 2: "us", 3: "ns"}[next(iter(lt[8].get(2, {1: {}})))]
                return pa.timestamp(unit, tz="UTC" if lt[8].get(1) else None)
            if c == 8:  # TIME_MICROS
                return pa.time64("us")
            if 7 in lt:  # TIME logical on INT64
                unit = {2: "us", 3: "ns"}[next(iter(lt[7].get(2, {2: {}})))]
                return pa.time64(unit)
            if c == 9:
                return pa.timestamp("ms")
            if c == 10:
                return pa.timestamp("us")
            if c == 14 or (10 in lt and not lt[10].get(2, True)):
                return pa.uint64()
            return pa.int64()
        if p == _T_INT96:
            return pa.timestamp("ns")
        if p == _T_FLOAT:
            return pa.float32()
        if p == _T_DOUBLE:
            return pa.float64()
        if p == _T_BYTE_ARRAY:
            # UTF8 / STRING / ENUM / JSON are all utf8 payloads; BSON
            # (c==20 / lt 13) falls through to binary below
            if c in (0, 4, 19) or 1 in lt or 4 in lt or 12 in lt:
                return pa.string()
            if c == 5 or 5 in lt:
                d = lt.get(5, {})
                return pa.decimal128(d.get(2, self.precision), d.get(1, self.scale))
            return pa.binary()
        if p == _T_FLBA:
            if c == 5 or 5 in lt:
                d = lt.get(5, {})
                return pa.decimal128(d.get(2, self.precision), d.get(1, self.scale))
            return pa.binary(self.type_length)
        raise WireFormatError(f"unsupported physical type {self.ptype}")


def _decode_plain(data: bytes, n: int, col: _Column):
    """PLAIN page payload -> 'dense values' in an intermediate form."""
    p = col.ptype
    if p == _T_BOOLEAN:
        return plain.decode_booleans(data, n)
    if p == _T_INT32:
        return plain.decode_fixed(data, np.int32, n)
    if p == _T_INT64:
        return plain.decode_fixed(data, np.int64, n)
    if p == _T_FLOAT:
        return plain.decode_fixed(data, np.float32, n)
    if p == _T_DOUBLE:
        return plain.decode_fixed(data, np.float64, n)
    if p == _T_INT96:
        raw = np.frombuffer(data, dtype=np.uint8, count=n * 12).reshape(n, 12)
        nanos = raw[:, :8].copy().view("<u8").ravel().astype(np.int64)
        julian = raw[:, 8:12].copy().view("<u4").ravel().astype(np.int64)
        return (julian - 2440588) * 86_400_000_000_000 + nanos
    if p == _T_BYTE_ARRAY:
        return plain.decode_byte_array(data, n)  # (data, offsets)
    if p == _T_FLBA:
        w = col.type_length
        return np.frombuffer(data, dtype=np.uint8, count=n * w).reshape(n, w)
    raise WireFormatError(f"PLAIN decode: type {p}")


def _decode_values(data: bytes, enc: int, n: int, col: _Column, dictionary):
    if enc == 0:  # PLAIN
        return ("plain", _decode_plain(data, n, col))
    if enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
        width = data[0]
        idx = rle.decode(data[1:], width, n).astype(np.int64)
        return ("idx", idx)
    if enc == 3:  # RLE (boolean values); v1 pages carry a 4-byte length
        # prefix, v2 writers differ — detect by exact-length match
        (blen,) = struct.unpack_from("<I", data, 0)
        body = data[4 : 4 + blen] if blen == len(data) - 4 else data
        return ("plain", rle.decode(body, 1, n).astype(bool))
    if enc == 5:
        bits = 32 if col.ptype == _T_INT32 else 64
        vals, _ = delta.decode_binary_packed(data, bits)
        return ("plain", vals)
    if enc == 6:
        return ("plain", delta.decode_length_byte_array(data))
    if enc == 7:
        return ("plain", delta.decode_byte_array(data))
    if enc == 9:
        dtype = {
            _T_FLOAT: np.float32,
            _T_DOUBLE: np.float64,
            _T_INT32: np.int32,
            _T_INT64: np.int64,
        }[col.ptype]
        return ("plain", bss.decode(data, dtype, n))
    raise WireFormatError(f"unsupported data encoding {enc}")


def _dense_to_arrow(vals, col: _Column, ty: pa.DataType) -> pa.Array:
    """Dense decoded values -> arrow array of the column's final type."""
    p = col.ptype
    if pa.types.is_null(ty):
        n = len(vals[1]) - 1 if isinstance(vals, tuple) else len(vals)
        return pa.nulls(n)
    if isinstance(vals, tuple):  # byte array (data, offsets)
        data, offsets = vals
        n = len(offsets) - 1
        if pa.types.is_decimal(ty):
            out = []
            for i in range(n):
                raw = data[int(offsets[i]) : int(offsets[i + 1])]
                out.append(
                    Decimal(int.from_bytes(raw, "big", signed=True)).scaleb(-ty.scale)
                )
            return pa.array(out, type=ty)
        base = pa.string() if pa.types.is_string(ty) else pa.binary()
        arr = pa.Array.from_buffers(
            base,
            n,
            [
                None,
                pa.py_buffer(offsets.astype(np.int32).tobytes()),
                pa.py_buffer(data),
            ],
        )
        return arr
    if p == _T_FLBA and isinstance(vals, np.ndarray) and vals.ndim == 2:
        if pa.types.is_decimal(ty):
            out = [
                Decimal(int.from_bytes(row.tobytes(), "big", signed=True)).scaleb(
                    -ty.scale
                )
                for row in vals
            ]
            return pa.array(out, type=ty)
        return pa.Array.from_buffers(
            pa.binary(col.type_length), len(vals), [None, pa.py_buffer(vals.tobytes())]
        )
    if pa.types.is_decimal(ty):  # INT32/INT64 decimal
        return pa.array(
            [Decimal(int(v)).scaleb(-ty.scale) for v in vals], type=ty
        )
    if pa.types.is_timestamp(ty):
        return pa.array(np.asarray(vals, dtype=np.int64)).cast(pa.int64()).view(ty)
    if pa.types.is_date32(ty):
        return pa.array(np.asarray(vals, dtype=np.int32)).view(ty)
    if pa.types.is_time(ty):
        bits = 32 if pa.types.is_time32(ty) else 64
        return pa.array(np.asarray(vals, dtype=f"int{bits}")).view(ty)
    if pa.types.is_boolean(ty):
        return pa.array(np.asarray(vals, dtype=bool))
    np_ty = np.dtype(ty.to_pandas_dtype())
    arr = np.asarray(vals)
    if arr.dtype != np_ty:
        if (
            np_ty.kind == "u"
            and arr.dtype.kind == "i"
            and arr.dtype.itemsize == np_ty.itemsize
        ):
            # stored as two's complement in the signed physical type
            arr = arr.view(np_ty)
        else:
            arr = arr.astype(np_ty, copy=False)
    return pa.array(arr, type=ty)


def _with_nulls(dense: pa.Array, validity: np.ndarray) -> pa.Array:
    if validity.all():
        return dense
    idx = np.cumsum(validity) - 1
    take = pa.array(
        np.where(validity, idx, 0).astype(np.int64), mask=~validity
    )
    return dense.take(take)


def _read_column_chunk(buf, meta: dict, desc: dict, num_rows: int) -> pa.Array:
    col: _Column = desc["col"]
    is_list = desc["kind"] == "list"
    is_nested = desc["kind"] == "nested"
    is_gen = desc["kind"] == "general"
    wr = 1
    if is_list:
        outer_opt, elem_opt = desc["outer_opt"], desc["elem_opt"]
        max_def = (1 if outer_opt else 0) + 1 + (1 if elem_opt else 0)
        max_rep = 1
        d_empty = 1 if outer_opt else 0
        wd = max(1, max_def.bit_length())
    elif is_gen:
        max_def, max_rep = desc["max_def"], desc["max_rep"]
        wd = max(1, max_def.bit_length())
        wr = max(1, max_rep.bit_length())
        is_list = True  # share the level-parsing branches below
    elif is_nested:
        max_def = desc["max_def"]
        wd = max(1, max_def.bit_length())
    codec = meta.get(4, 0)
    total_values = meta[5]
    offs = [meta[9]]
    # some writers emit dictionary_page_offset=0 to mean "absent"
    # (the dict-page-offset-zero golden file exists to test exactly this)
    if meta.get(11):
        offs.append(meta[11])
    pos = min(offs)
    ty = col.arrow_type()

    dictionary = None
    seen = 0
    dense_parts: list = []
    validity_parts: list[np.ndarray] = []
    rep_parts: list[np.ndarray] = []
    def_parts: list[np.ndarray] = []
    while seen < total_values:
        tr = _TR(buf, pos)
        header = tr.struct()
        page_type = header[1]
        raw_len, comp_len = header[2], header[3]
        body = bytes(buf[tr.pos : tr.pos + comp_len])
        pos = tr.pos + comp_len
        # page checksum (file.go:658-678 semantics): crc32 over the
        # serialized page body exactly as stored; 0/absent means the
        # writer didn't checksum (pyarrow's default) — fatal on mismatch
        crc = header.get(4)
        if crc and (zlib.crc32(body) & 0xFFFFFFFF) != (crc & 0xFFFFFFFF):
            raise WireFormatError(
                f"crc32 checksum mismatch in page of column {col.name!r}: "
                f"want=0x{crc & 0xFFFFFFFF:08X} got=0x{zlib.crc32(body) & 0xFFFFFFFF:08X}"
            )
        if page_type in (0, 3):
            DECODE_COUNTERS["data_pages"] += 1

        if page_type == 2:  # dictionary page
            dh = header[7]
            data = _decompress(body, codec, raw_len)
            dictionary = _decode_plain(data, dh[1], col)
            continue
        if page_type == 0:  # data page v1
            dh = header[5]
            n_page, enc = dh[1], dh[2]
            data = _decompress(body, codec, raw_len)
            dpos = 0
            if is_list:
                if max_rep > 0:
                    (rlen,) = struct.unpack_from("<I", data, 0)
                    rep = rle.decode(data[4 : 4 + rlen], wr, n_page).astype(np.uint8)
                    dpos = 4 + rlen
                else:
                    rep = np.zeros(n_page, dtype=np.uint8)
                if max_def > 0:
                    (blen,) = struct.unpack_from("<I", data, dpos)
                    deff = rle.decode(
                        data[dpos + 4 : dpos + 4 + blen], wd, n_page
                    ).astype(np.uint8)
                    dpos += 4 + blen
                else:
                    deff = np.zeros(n_page, dtype=np.uint8)
                n_vals = int((deff == max_def).sum())
                rep_parts.append(rep)
                def_parts.append(deff)
            elif is_nested and max_def > 0:
                (blen,) = struct.unpack_from("<I", data, 0)
                deff = rle.decode(data[4 : 4 + blen], wd, n_page).astype(np.uint8)
                dpos = 4 + blen
                validity = deff == max_def
                n_vals = int(validity.sum())
                validity_parts.append(validity)
                def_parts.append(deff)
            elif col.optional:
                (blen,) = struct.unpack_from("<I", data, 0)
                levels = rle.decode(data[4 : 4 + blen], 1, n_page)
                validity = levels.astype(bool)
                dpos = 4 + blen
                n_vals = int(validity.sum())
                validity_parts.append(validity)
            else:
                validity = np.ones(n_page, dtype=bool)
                n_vals = n_page
                validity_parts.append(validity)
                if is_nested:
                    def_parts.append(np.zeros(n_page, dtype=np.uint8))
            kind, vals = _decode_values(
                data[dpos:], enc, n_vals, col, dictionary
            )
        elif page_type == 3:  # data page v2
            dh = header[8]
            n_page, n_nulls, enc = dh[1], dh[2], dh[4]
            def_len, rep_len = dh[5], dh[6]
            # flat columns have max_rep=0, but some writers still emit a
            # (vacuously all-zero) rep-level stream — skip those bytes
            levels_raw = bytes(body[: def_len + rep_len])
            values_raw = body[def_len + rep_len :]
            if dh.get(7, True) and codec:
                values_raw = _decompress(
                    values_raw, codec, raw_len - def_len - rep_len
                )
            if is_list:
                rep = (
                    rle.decode(levels_raw[:rep_len], wr, n_page).astype(np.uint8)
                    if rep_len
                    else np.zeros(n_page, dtype=np.uint8)
                )
                deff = (
                    rle.decode(levels_raw[rep_len:], wd, n_page).astype(np.uint8)
                    if def_len
                    else np.zeros(n_page, dtype=np.uint8)
                )
                n_vals = int((deff == max_def).sum())
                rep_parts.append(rep)
                def_parts.append(deff)
            elif is_nested and max_def > 0 and def_len:
                deff = rle.decode(levels_raw[rep_len:], wd, n_page).astype(np.uint8)
                validity = deff == max_def
                n_vals = int(validity.sum())
                validity_parts.append(validity)
                def_parts.append(deff)
            elif col.optional and def_len:
                levels = rle.decode(levels_raw[rep_len:], 1, n_page)
                validity = levels.astype(bool)
                n_vals = n_page - n_nulls
                validity_parts.append(validity)
            else:
                validity = np.ones(n_page, dtype=bool)
                n_vals = n_page - n_nulls
                validity_parts.append(validity)
                if is_nested:
                    def_parts.append(np.zeros(n_page, dtype=np.uint8))
            kind, vals = _decode_values(values_raw, enc, n_vals, col, dictionary)
        elif page_type == 1:  # index page: skip
            continue
        else:
            raise WireFormatError(f"unsupported page type {page_type}")

        seen += n_page
        if kind == "idx":
            dense_parts.append(("idx", vals))
        else:
            dense_parts.append(("plain", _dense_to_arrow(vals, col, ty)))

    # materialize: dictionary indexes -> take from decoded dict values
    dict_arrow = None
    if dictionary is not None:
        dict_arrow = _dense_to_arrow(dictionary, col, ty)
    chunks = []
    for kind, part in dense_parts:
        if kind == "idx":
            chunks.append(dict_arrow.take(pa.array(part)))
        else:
            chunks.append(part)
    if not chunks:
        dense = pa.array([], type=ty)
    elif len(chunks) == 1:
        dense = chunks[0]
    else:
        dense = pa.concat_arrays(chunks)
    if is_nested:
        validity = (
            np.concatenate(validity_parts)
            if validity_parts
            else np.empty(0, dtype=bool)
        )
        defs = (
            np.concatenate(def_parts) if def_parts else np.empty(0, dtype=np.uint8)
        )
        return _with_nulls(dense, validity), defs
    if is_gen:
        rep = (
            np.concatenate(rep_parts) if rep_parts else np.empty(0, dtype=np.uint8)
        )
        defs = (
            np.concatenate(def_parts) if def_parts else np.empty(0, dtype=np.uint8)
        )
        return dense, rep, defs
    if not is_list:
        if not validity_parts:
            return dense
        validity = (
            np.concatenate(validity_parts)
            if len(validity_parts) != 1
            else validity_parts[0]
        )
        return _with_nulls(dense, validity)
    if not rep_parts:
        return pa.array([], type=pa.list_(ty))

    # list reconstruction from rep/def levels (column.go:541-690 /
    # node.go:393-415 semantics): rep==0 starts a row; def distinguishes
    # null list / empty list / null element / value
    rep = np.concatenate(rep_parts) if len(rep_parts) != 1 else rep_parts[0]
    deff = np.concatenate(def_parts) if len(def_parts) != 1 else def_parts[0]
    starts = np.nonzero(rep == 0)[0]
    n_rows_chunk = len(starts)
    is_elem = deff > d_empty
    counts = (
        np.add.reduceat(is_elem.astype(np.int64), starts)
        if n_rows_chunk
        else np.empty(0, dtype=np.int64)
    )
    offsets = np.zeros(n_rows_chunk + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    elem_valid = deff[is_elem] == max_def
    child = _with_nulls(dense, elem_valid)
    vbuf = None
    if outer_opt:
        row_valid = deff[starts] >= d_empty
        if not row_valid.all():
            vbuf = pa.py_buffer(np.packbits(row_valid, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.list_(child.type),
        n_rows_chunk,
        [vbuf, pa.py_buffer(offsets.astype(np.int32).tobytes())],
        children=[child],
    )


def corrupt_as_wire_error(fn):
    """Public read entry points fail with WireFormatError on ANY
    malformed input (file.go's ErrCorrupted discipline): corruption the
    page CRC doesn't cover (thrift footer bytes, header fields) can
    surface as arbitrary parse exceptions deep in the decoders —
    normalize them instead of leaking IndexError/struct.error."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (WireFormatError, FileNotFoundError, IsADirectoryError):
            raise
        except Exception as e:
            raise WireFormatError(
                f"corrupt or unsupported parquet input ({type(e).__name__}: {e})"
            ) from e

    return wrapped


def read_metadata(path: str) -> dict:
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != b"PAR1" or raw[-4:] != b"PAR1":
        raise WireFormatError("not a parquet file (bad magic)")
    (flen,) = struct.unpack_from("<I", raw, len(raw) - 8)
    footer = raw[len(raw) - 8 - flen : len(raw) - 8]
    return {"file": raw, "meta": _TR(memoryview(footer)).struct()}


@corrupt_as_wire_error
def read_footer(path: str) -> dict:
    """Parse ONLY the footer (tail read, no full-file load): the cheap
    metadata probe for planning row-group-granular distributed reads."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as f:
        f.seek(max(0, size - 8))
        tail = f.read(8)
        if tail[-4:] != b"PAR1":
            raise WireFormatError("not a parquet file (bad magic)")
        (flen,) = struct.unpack_from("<I", tail, 0)
        f.seek(size - 8 - flen)
        footer = f.read(flen)
    return _TR(memoryview(footer)).struct()


def num_row_groups(path: str) -> int:
    return len(read_footer(path).get(4, []))


def _schema_tree(els: list[dict], i: int):
    el = els[i]
    i += 1
    children = []
    for _ in range(el.get(5, 0)):
        child, i = _schema_tree(els, i)
        children.append(child)
    return {"el": el, "children": children}, i


def _is_list_group(node: dict) -> bool:
    el = node["el"]
    return (
        bool(node["children"])
        and len(node["children"]) == 1
        and node["children"][0]["el"].get(3) == 2
    )


def _parse_schema(els: list[dict]) -> list[dict]:
    """Schema elements -> top-level column descriptors. Supports flat
    primitives, single-level lists (3-level standard, 2-level legacy,
    bare `repeated <primitive>`), and arbitrarily nested NON-repeated
    structs; repetition below the top level raises."""
    root, end = _schema_tree(els, 0)
    if end != len(els):
        raise WireFormatError("malformed schema tree")
    out = []
    for node in root["children"]:
        try:
            out.append(_classify_column(node))
        except WireFormatError:
            # anything beyond the fast shapes: full Dremel assembly
            out.append(_dremel_entry(node))
    return out


def _classify_column(node: dict) -> dict:
    el = node["el"]
    name = el[4].decode()
    if not node["children"]:
        if el.get(3) == 2:  # bare repeated primitive under root
            return {
                "kind": "list",
                "name": name,
                "col": _Column(el),
                "outer_opt": False,
                "elem_opt": False,
                "path": name,
            }
        return {"kind": "flat", "name": name, "col": _Column(el), "path": name}
    if _is_list_group(node):
        mid = node["children"][0]
        outer_opt = el.get(3, 0) == 1
        if not mid["children"]:
            return {
                "kind": "list",
                "name": name,
                "col": _Column(mid["el"]),
                "outer_opt": outer_opt,
                "elem_opt": False,
                "path": f"{name}.{mid['el'][4].decode()}",
            }
        if len(mid["children"]) != 1 or mid["children"][0]["children"]:
            raise WireFormatError("nested lists: use the Dremel path")
        leaf = mid["children"][0]["el"]
        return {
            "kind": "list",
            "name": name,
            "col": _Column(leaf),
            "outer_opt": outer_opt,
            "elem_opt": leaf.get(3, 0) == 1,
            "path": f"{name}.{mid['el'][4].decode()}.{leaf[4].decode()}",
        }
    # non-repeated group subtree -> struct column
    leaves: list[dict] = []

    def walk(nd: dict, prefix: str, def_level: int) -> dict:
        e = nd["el"]
        nm = e[4].decode()
        p = f"{prefix}.{nm}" if prefix else nm
        if e.get(3) == 2:
            raise WireFormatError("repeated inside struct: use the Dremel path")
        opt = e.get(3, 0) == 1
        dl = def_level + (1 if opt else 0)
        if nd["children"]:
            return {
                "group": True,
                "name": nm,
                "optional": opt,
                "def_level": dl,
                "children": [walk(c, p, dl) for c in nd["children"]],
            }
        leaf = {"kind": "nested", "col": _Column(e), "path": p, "max_def": dl}
        leaves.append(leaf)
        return {"group": False, "name": nm, "leaf": leaf, "optional": opt}

    tree = walk(node, "", 0)
    return {"kind": "struct", "name": name, "tree": tree, "leaves": leaves}


def _dremel_entry(node: dict) -> dict:
    """General descriptor for a top-level column subtree with arbitrary
    non-flat nesting — full Dremel record shredding/assembly (the
    algorithm behind the reference's schema/column layers,
    schema.go:216-280 / column.go:541-690)."""
    leaves: list[dict] = []

    def walk(nd: dict, prefix: str, d: int, r: int) -> dict:
        e = nd["el"]
        nm = e[4].decode()
        p = f"{prefix}.{nm}" if prefix else nm
        reptn = e.get(3, 0)
        dd = d + (1 if reptn in (1, 2) else 0)
        rr = r + (1 if reptn == 2 else 0)
        info = {
            "name": nm,
            "reptn": reptn,
            "d": dd,
            "r": rr,
            "path": p,
            "converted": e.get(6),
            "logical": e.get(10) or {},
            "children": None,
        }
        if nd["children"]:
            info["children"] = [walk(c, p, dd, rr) for c in nd["children"]]
        else:
            leaf = {
                "kind": "general",
                "col": _Column(e),
                "path": p,
                "max_def": dd,
                "max_rep": rr,
            }
            info["leaf"] = leaf
            leaves.append(leaf)
        return info

    tree = walk(node, "", 0, 0)

    # LIST-annotated groups: the repeated mid group is transparent (its
    # single child is the element) unless the legacy naming rules say
    # the mid group itself is a one-field struct element
    def mark(info: dict) -> None:
        if info["children"] is None:
            return
        is_list_wrap = info["converted"] == 3 or 3 in info["logical"]
        if is_list_wrap and len(info["children"]) == 1:
            mid = info["children"][0]
            if (
                mid["reptn"] == 2
                and mid["children"] is not None
                and len(mid["children"]) == 1
                and mid["name"] != "array"
                and not mid["name"].endswith("_tuple")
            ):
                mid["transparent"] = True
        for c in info["children"]:
            mark(c)

    mark(tree)
    return {
        "kind": "dremel",
        "name": node["el"][4].decode(),
        "tree": tree,
        "leaves": leaves,
    }


def _mask_nulls(arr: pa.Array, valid: np.ndarray) -> pa.Array:
    idx = pa.array(np.arange(len(arr), dtype=np.int64), mask=~valid)
    return arr.take(idx)


def _collapse(content: pa.Array, rep, deff, r_n: int, d_n: int):
    """One repeated level: entries -> ListArray over parent slots."""
    starts = np.nonzero(rep < r_n)[0]
    is_elem = deff >= d_n
    counts = (
        np.add.reduceat(is_elem.astype(np.int64), starts)
        if len(starts)
        else np.empty(0, dtype=np.int64)
    )
    offsets = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    if is_elem.all():
        elements = content
    else:
        elements = content.take(
            pa.array(np.nonzero(is_elem)[0], type=pa.int64())
        )
    lst = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32)), elements
    )
    return lst, rep[starts], deff[starts]


def _list_to_map(lst: pa.ListArray) -> pa.Array:
    st = lst.values
    return pa.MapArray.from_arrays(lst.offsets, st.field(0), st.field(1))


def _dremel_assemble(info: dict, data: dict):
    """Assemble one node's value, aligned to its parent-context slots.
    Returns (array, rep-projection, def-projection)."""
    if info["children"] is None:
        dense, rep, deff = data[info["path"]]
        out = _with_nulls(dense, deff == info["leaf"]["max_def"])
    else:
        built = [_dremel_assemble(c, data) for c in info["children"]]
        arrs = [b[0] for b in built]
        rep, deff = built[0][1], built[0][2]
        is_list_wrap = info["converted"] == 3 or 3 in info["logical"]
        is_map_wrap = info["converted"] in (1, 2) or 2 in info["logical"]
        if (
            len(info["children"]) == 1
            and info["children"][0]["reptn"] == 2
            and (is_list_wrap or is_map_wrap)
        ):
            out = arrs[0]  # transparent LIST/MAP wrapper
            if is_map_wrap:
                out = _list_to_map(out)
        elif info.get("transparent"):
            out = arrs[0]
        else:
            fields = [
                pa.field(c["name"], a.type, nullable=c["reptn"] == 1)
                for c, a in zip(info["children"], arrs)
            ]
            n = len(arrs[0]) if arrs else 0
            out = pa.Array.from_buffers(
                pa.struct(fields), n, [None], children=arrs
            )
    if info["reptn"] == 1:
        valid = deff >= info["d"]
        if not valid.all():
            out = _mask_nulls(out, valid)
    if info["reptn"] == 2:
        out, rep, deff = _collapse(out, rep, deff, info["r"], info["d"])
    return out, rep, deff


def _first_leaf(node: dict) -> dict:
    while node["group"]:
        node = node["children"][0]
    return node["leaf"]


def _assemble_struct(node: dict, data: dict) -> pa.Array:
    """Rebuild a struct column from its leaves' (array, def levels),
    preserving per-field nullability from the schema repetitions."""
    if not node["group"]:
        return data[node["leaf"]["path"]][0]
    children = [_assemble_struct(c, data) for c in node["children"]]
    fields = [
        pa.field(c["name"], child.type, nullable=c.get("optional", True))
        for c, child in zip(node["children"], children)
    ]
    n = len(children[0]) if children else 0
    vbuf = None
    if node["optional"]:
        defs = data[_first_leaf(node)["path"]][1]
        valid = defs >= node["def_level"]
        if not valid.all():
            vbuf = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.struct(fields), n, [vbuf], children=children
    )


def _entry_type(d: dict) -> pa.DataType:
    if d["kind"] == "dremel":

        def t(info):
            if info["children"] is None:
                base = info["leaf"]["col"].arrow_type()
            else:
                is_list_wrap = info["converted"] == 3 or 3 in info["logical"]
                is_map_wrap = info["converted"] in (1, 2) or 2 in info["logical"]
                single_rep = (
                    len(info["children"]) == 1
                    and info["children"][0]["reptn"] == 2
                )
                if single_rep and is_map_wrap:
                    kv = info["children"][0]
                    base = pa.map_(t(kv["children"][0]), t(kv["children"][1]))
                    return base  # map wrapper consumes the repetition
                if (single_rep and is_list_wrap) or info.get("transparent"):
                    base = t(info["children"][0])
                else:
                    base = pa.struct(
                        [
                            pa.field(c["name"], t(c), nullable=c["reptn"] == 1)
                            for c in info["children"]
                        ]
                    )
            if info["reptn"] == 2:
                base = pa.list_(base)
            return base

        return t(d["tree"])
    if d["kind"] == "struct":

        def t(node):
            if not node["group"]:
                return node["leaf"]["col"].arrow_type()
            return pa.struct(
                [
                    pa.field(c["name"], t(c), nullable=c.get("optional", True))
                    for c in node["children"]
                ]
            )

        return t(d["tree"])
    ty = d["col"].arrow_type()
    return pa.list_(ty) if d["kind"] == "list" else ty


@corrupt_as_wire_error
def read_table(
    path: str,
    columns: list[str] | None = None,
    row_groups: list[int] | None = None,
) -> pa.Table:
    """Read a parquet file (any schema the Dremel assembler covers)
    entirely with our own decoders; `row_groups` selects a subset for
    distributed row-group-granular reads."""
    parsed = read_metadata(path)
    raw, meta = memoryview(parsed["file"]), parsed["meta"]
    if row_groups is not None:
        groups = meta.get(4, [])
        meta = dict(meta)
        meta[4] = [groups[i] for i in row_groups]
    descs = _parse_schema(meta[2])
    by_name = {d["name"]: d for d in descs}
    want = columns or [d["name"] for d in descs]
    by_path: dict[str, tuple[str, dict]] = {}
    for d in descs:
        if d["kind"] in ("struct", "dremel"):
            for leaf in d["leaves"]:
                by_path[leaf["path"]] = (d["name"], leaf)
        else:
            by_path[d["path"]] = (d["name"], d)

    arrays: dict[str, list[pa.Array]] = {n: [] for n in want}
    for rg in meta.get(4, []):
        n_rows = rg[3]
        rg_leaf_data: dict[str, tuple] = {}
        for cc in rg[1]:
            cmeta = cc[3]
            pth = b".".join(cmeta[3]).decode()
            ent = by_path.get(pth)
            if ent is None or ent[0] not in arrays:
                continue
            top, d = ent
            res = _read_column_chunk(raw, cmeta, d, n_rows)
            if d["kind"] in ("nested", "general"):
                rg_leaf_data[pth] = res
            else:
                arrays[top].append(res)
        for n in want:
            d = by_name[n]
            if d["kind"] == "struct" and rg_leaf_data:
                arrays[n].append(_assemble_struct(d["tree"], rg_leaf_data))
            elif d["kind"] == "dremel" and rg_leaf_data:
                arr, _, _ = _dremel_assemble(d["tree"], rg_leaf_data)
                arrays[n].append(arr)
    out = {}
    for n in want:
        parts = arrays[n] or [pa.array([], type=_entry_type(by_name[n]))]
        out[n] = pa.chunked_array(parts)
    t = pa.table(out)
    anns = {}
    for n in want:
        d = by_name[n]
        col = d.get("col")
        if col is not None and d.get("kind") not in ("list",):
            a = col.annotation()
            if a:
                anns[n] = a
    if anns:
        fields = [
            f.with_metadata({b"parquet.logical_type": anns[f.name].encode()})
            if f.name in anns
            else f
            for f in t.schema
        ]
        t = pa.Table.from_arrays(
            [t.column(i) for i in range(t.num_columns)],
            schema=pa.schema(fields),
        )
    kv = key_value_metadata(meta)
    return t.replace_schema_metadata(kv) if kv else t


def key_value_metadata(meta: dict) -> dict[bytes, bytes]:
    """Footer key/value pairs (FileMetaData field 5) as a bytes dict."""
    return {e[1]: e.get(2, b"") for e in meta.get(5, [])}


# ---------------------------------------------------------------------------
# page index (ColumnIndex / OffsetIndex), bloom filters, pruned reads

# module-level decode counters so tests can prove page skipping:
# every decoded data page increments "data_pages"
DECODE_COUNTERS = {"data_pages": 0}


def _plain_single(raw: bytes, col: _Column):
    """Decode one ColumnIndex/Statistics bound (plain single value)."""
    p = col.ptype
    if p == _T_BOOLEAN:
        return bool(raw[0])
    if p == _T_INT32:
        return struct.unpack("<i", raw)[0]
    if p == _T_INT64:
        return struct.unpack("<q", raw)[0]
    if p == _T_FLOAT:
        return struct.unpack("<f", raw)[0]
    if p == _T_DOUBLE:
        return struct.unpack("<d", raw)[0]
    if p == _T_BYTE_ARRAY:
        ty = col.arrow_type()
        if pa.types.is_string(ty):
            try:
                return raw.decode()
            except UnicodeDecodeError:
                # foreign writers may byte-truncate a bound mid-codepoint;
                # an unusable bound means "cannot prune", not "corrupt"
                return None
        return raw
    return raw


@corrupt_as_wire_error
def read_page_index(path: str) -> list[dict]:
    """Per row group: {leaf_path: {"column_index": dict|None,
    "offset_index": {"locations": [(offset, size, first_row)]}|None}}.
    column_index: {"null_pages", "mins", "maxs", "boundary_order",
    "null_counts"} with decoded py bound values."""
    parsed = read_metadata(path)
    raw, meta = memoryview(parsed["file"]), parsed["meta"]
    descs = _parse_schema(meta[2])
    by_path: dict[str, _Column] = {}
    for d in descs:
        if d["kind"] in ("struct", "dremel"):
            for leaf in d["leaves"]:
                by_path[leaf["path"]] = leaf["col"]
        else:
            by_path[d["path"]] = d["col"]
    out = []
    for rg in meta.get(4, []):
        entry: dict = {}
        for cc in rg[1]:
            cmeta = cc[3]
            pth = b".".join(cmeta[3]).decode()
            col = by_path.get(pth)
            rec = {"column_index": None, "offset_index": None}
            if cc.get(6) is not None and col is not None:
                ci = _TR(raw, cc[6]).struct()
                mins = [
                    None if np_ else _plain_single(bytes(mv), col)
                    for np_, mv in zip(ci[1], ci[2])
                ]
                maxs = [
                    None if np_ else _plain_single(bytes(mv), col)
                    for np_, mv in zip(ci[1], ci[3])
                ]
                rec["column_index"] = {
                    "null_pages": ci[1],
                    "mins": mins,
                    "maxs": maxs,
                    "boundary_order": ci.get(4, 0),
                    "null_counts": ci.get(5),
                }
            if cc.get(4) is not None:
                oi = _TR(raw, cc[4]).struct()
                rec["offset_index"] = {
                    "locations": [
                        (loc[1], loc[2], loc[3]) for loc in oi[1]
                    ]
                }
            entry[pth] = rec
        out.append(entry)
    return out


def read_bloom_filters(path: str, column: str) -> list:
    """Per row group: the column's split-block bloom filter (or None).
    Works on ANY parquet file carrying standard SBBF sidecars — ours or
    a foreign writer's (file.go:113-150 parity)."""
    from .sbbf import SplitBlockFilter

    parsed = read_metadata(path)
    raw, meta = memoryview(parsed["file"]), parsed["meta"]
    out = []
    for rg in meta.get(4, []):
        f = None
        for cc in rg[1]:
            cmeta = cc[3]
            pth = b".".join(cmeta[3]).decode()
            if pth == column and cmeta.get(14) is not None:
                f = SplitBlockFilter.deserialize(parsed["file"], cmeta[14])
                break
        out.append(f)
    return out


@corrupt_as_wire_error
def bloom_may_contain(path: str, column: str, values) -> np.ndarray:
    """Per-value: could this value appear anywhere in the file? ORs the
    per-row-group probes; exact False means provably absent."""
    from . import parquet_wire as W
    from .sbbf import plain_segments, xxhash64

    parsed = read_metadata(path)
    descs = _parse_schema(parsed["meta"][2])
    col = next(d["col"] for d in descs if d.get("path") == column)
    arr = pa.array(values)
    if col.ptype == 7 and col.type_length:
        # FLBA (e.g. UUID): probes arrive as plain bytes — cast to the
        # column's fixed width so plain_segments hashes the exact PLAIN
        # layout the filter was built from
        arr = arr.cast(pa.binary(col.type_length))
    phys = {0: W.T_BOOLEAN, 1: W.T_INT32, 2: W.T_INT64, 4: W.T_FLOAT,
            5: W.T_DOUBLE, 6: W.T_BYTE_ARRAY, 7: W.T_FLBA}[col.ptype]
    data, offsets = plain_segments(arr, phys)
    if data is None:
        raise WireFormatError(f"no bloom hashing for physical type {col.ptype}")
    h = xxhash64(data, offsets)
    out = np.zeros(len(arr), dtype=bool)
    any_filter = False
    for f in read_bloom_filters(path, column):
        if f is None:
            out[:] = True  # a group without a filter may contain anything
            continue
        any_filter = True
        out |= f.check_hashes(h)
    if not any_filter:
        return np.ones(len(arr), dtype=bool)
    return out


def _merge_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    if not ranges:
        return []
    ranges = sorted(ranges)
    out = [list(ranges[0])]
    for s, e in ranges[1:]:
        if s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


def _read_flat_pages(buf, cmeta: dict, desc: dict, locations, keep_idx):
    """Decode ONLY the selected data pages of a flat column chunk (the
    page-skipping read path: search.go:6-116 over the ColumnIndex).
    Returns (array, covered_starts, covered_counts by ROW)."""
    col: _Column = desc["col"]
    codec = cmeta.get(4, 0)
    ty = col.arrow_type()
    dictionary = None
    if cmeta.get(11):
        tr = _TR(buf, cmeta[11])
        header = tr.struct()
        body = bytes(buf[tr.pos : tr.pos + header[3]])
        dictionary = _decode_plain(
            _decompress(body, codec, header[2]), header[7][1], col
        )
    dict_arrow = (
        _dense_to_arrow(dictionary, col, ty) if dictionary is not None else None
    )
    chunks, starts, counts = [], [], []
    for i in keep_idx:
        off, _size, first_row = locations[i]
        tr = _TR(buf, off)
        header = tr.struct()
        body = bytes(buf[tr.pos : tr.pos + header[3]])
        DECODE_COUNTERS["data_pages"] += 1
        if header[1] == 0:  # v1
            dh = header[5]
            n_page, enc = dh[1], dh[2]
            data = _decompress(body, codec, header[2])
            dpos = 0
            if col.optional:
                (blen,) = struct.unpack_from("<I", data, 0)
                validity = rle.decode(data[4 : 4 + blen], 1, n_page).astype(bool)
                dpos = 4 + blen
            else:
                validity = np.ones(n_page, dtype=bool)
            kind, vals = _decode_values(
                data[dpos:], enc, int(validity.sum()), col, dictionary
            )
        elif header[1] == 3:  # v2
            dh = header[8]
            n_page, n_nulls, enc = dh[1], dh[2], dh[4]
            def_len, rep_len = dh[5], dh[6]
            levels_raw = bytes(body[: def_len + rep_len])
            values_raw = body[def_len + rep_len :]
            if dh.get(7, True) and codec:
                values_raw = _decompress(
                    values_raw, codec, header[2] - def_len - rep_len
                )
            if col.optional and def_len:
                validity = rle.decode(levels_raw[rep_len:], 1, n_page).astype(bool)
            else:
                validity = np.ones(n_page, dtype=bool)
            kind, vals = _decode_values(
                values_raw, enc, n_page - n_nulls, col, dictionary
            )
        else:
            raise WireFormatError(f"page-skip read hit page type {header[1]}")
        dense = (
            dict_arrow.take(pa.array(vals))
            if kind == "idx"
            else _dense_to_arrow(vals, col, ty)
        )
        arr = dense if validity.all() else _with_nulls(dense, validity)
        chunks.append(arr)
        starts.append(first_row)
        counts.append(n_page)
    if not chunks:
        return pa.array([], type=ty), [], []
    return (
        pa.concat_arrays(chunks) if len(chunks) > 1 else chunks[0]
    ), starts, counts


@corrupt_as_wire_error
def read_table_pruned(
    path: str,
    column: str,
    lo,
    hi,
    columns: list[str] | None = None,
):
    """Range-predicate read (lo <= column <= hi) that uses the file's
    own ColumnIndex/OffsetIndex to decode only pages whose [min, max]
    intersects the range (search.go:6-116 page pruning at wire level).
    Residual exact filtering is applied, so the result equals a full
    read + filter. Returns (table, info) with page-count evidence."""
    parsed = read_metadata(path)
    raw, meta = memoryview(parsed["file"]), parsed["meta"]
    descs = _parse_schema(meta[2])
    want = columns or [d["name"] for d in descs]
    by_name = {d["name"]: d for d in descs}
    for n in want + [column]:
        if by_name[n]["kind"] not in ("flat",):
            raise WireFormatError("pruned read supports flat columns only")
    index = read_page_index(path)
    arrays: dict[str, list] = {n: [] for n in want}
    info = {"pages_read": 0, "pages_total": 0, "row_groups_read": 0}
    for gi, rg in enumerate(meta.get(4, [])):
        n_rows = rg[3]
        idx = index[gi]
        by_path = {b".".join(cc[3][3]).decode(): cc for cc in rg[1]}
        tgt = idx[column]
        info["pages_total"] += sum(
            len(idx[n]["offset_index"]["locations"])
            for n in want
            if idx[n]["offset_index"]
        )
        if tgt["column_index"] is None or tgt["offset_index"] is None:
            keep = None  # no index: read every page of the group
        else:
            ci = tgt["column_index"]
            locs = tgt["offset_index"]["locations"]
            keep = [
                i
                for i in range(len(locs))
                if not ci["null_pages"][i]
                and (ci["maxs"][i] is None or ci["maxs"][i] >= lo)
                and (ci["mins"][i] is None or ci["mins"][i] <= hi)
            ]
        locs_t = tgt["offset_index"]["locations"] if tgt["offset_index"] else None
        if keep is not None and not keep:
            continue  # whole row group pruned
        info["row_groups_read"] += 1
        if keep is None or locs_t is None:
            # fallback: full chunk decode for this group
            for n in want:
                arrays[n].append(
                    _read_column_chunk(raw, by_path[n][3], by_name[n], n_rows)
                )
            continue
        # target row ranges from kept pages
        ranges = []
        for i in keep:
            start = locs_t[i][2]
            end = locs_t[i + 1][2] if i + 1 < len(locs_t) else n_rows
            ranges.append((start, end))
        ranges = _merge_ranges(ranges)
        for n in want:
            oi = idx[n]["offset_index"]
            locs = oi["locations"]
            sel = []
            for i, (off, size, first) in enumerate(locs):
                end = locs[i + 1][2] if i + 1 < len(locs) else n_rows
                if any(s < end and first < e for s, e in ranges):
                    sel.append(i)
            arr, starts, counts = _read_flat_pages(
                raw, by_path[n][3], by_name[n], locs, sel
            )
            info["pages_read"] += len(sel)
            # slice decoded coverage down to the exact target ranges
            mask = np.zeros(len(arr), dtype=bool)
            pos = 0
            for st, cnt in zip(starts, counts):
                for s, e in ranges:
                    a = max(s, st)
                    b = min(e, st + cnt)
                    if a < b:
                        mask[pos + (a - st) : pos + (b - st)] = True
                pos += cnt
            arrays[n].append(arr.filter(pa.array(mask)))
    out = {}
    for n in want:
        parts = arrays[n] or [pa.array([], type=by_name[n]["col"].arrow_type())]
        out[n] = pa.chunked_array(parts)
    table = pa.table(out)
    # residual exact filter
    import pyarrow.compute as _pc

    m = _pc.and_(
        _pc.greater_equal(table.column(column), pa.scalar(lo)),
        _pc.less_equal(table.column(column), pa.scalar(hi)),
    )
    return table.filter(m), info


@corrupt_as_wire_error
def read_table_rows(
    path: str,
    start: int,
    stop: int,
    columns: list[str] | None = None,
):
    """Absolute-row-range read: rows [start, stop) in file order — the
    wire form of the reference's SeekToRow (column.go:127-149,
    reader.go SeekToRow): whole row groups outside the range are never
    touched past the footer, and when the file carries an OffsetIndex,
    only pages whose first_row_index range intersects are decoded.
    Returns (table, info) with page/row-group evidence counters."""
    parsed = read_metadata(path)
    raw, meta = memoryview(parsed["file"]), parsed["meta"]
    descs = _parse_schema(meta[2])
    want = columns or [d["name"] for d in descs]
    by_name = {d["name"]: d for d in descs}
    info = {"pages_read": 0, "pages_total": 0, "row_groups_read": 0}
    groups = meta.get(4, [])

    if any(by_name[n]["kind"] != "flat" for n in want):
        # nested columns: row-group-granular skip + assembled decode,
        # then an exact slice (the record assembler owns these kinds)
        g0, sel, offs = 0, [], []
        for gi, rg in enumerate(groups):
            n_rows = rg[3]
            ls, le = max(start - g0, 0), min(stop - g0, n_rows)
            if ls < le:
                sel.append(gi)
                offs.append((ls, le))
            g0 += n_rows
        info["row_groups_read"] = len(sel)
        if not sel:
            return empty_table(path, columns), info
        t = read_table(path, columns=want, row_groups=sel)
        # per-group local offsets to one global slice over the subset
        parts, pos = [], 0
        for (ls, le), gi in zip(offs, sel):
            n_rows = groups[gi][3]
            parts.append(t.slice(pos + ls, le - ls))
            pos += n_rows
        return pa.concat_tables(parts), info

    index = read_page_index(path)
    arrays: dict[str, list] = {n: [] for n in want}
    g0 = 0
    for gi, rg in enumerate(groups):
        n_rows = rg[3]
        ls, le = max(start - g0, 0), min(stop - g0, n_rows)
        g0 += n_rows
        if ls >= le:
            continue
        info["row_groups_read"] += 1
        by_path = {b".".join(cc[3][3]).decode(): cc for cc in rg[1]}
        for n in want:
            d = by_name[n]
            oi = index[gi][n]["offset_index"] if index[gi].get(n) else None
            if oi is None:
                full = _read_column_chunk(raw, by_path[n][3], d, n_rows)
                arrays[n].append(full.slice(ls, le - ls))
                continue
            locs = oi["locations"]
            info["pages_total"] += len(locs)
            sel = [
                i
                for i, loc in enumerate(locs)
                if (locs[i + 1][2] if i + 1 < len(locs) else n_rows) > ls
                and loc[2] < le
            ]
            arr, starts, counts = _read_flat_pages(
                raw, by_path[n][3], d, locs, sel
            )
            info["pages_read"] += len(sel)
            mask = np.zeros(len(arr), dtype=bool)
            pos = 0
            for st, cnt in zip(starts, counts):
                a, b = max(ls, st), min(le, st + cnt)
                if a < b:
                    mask[pos + (a - st) : pos + (b - st)] = True
                pos += cnt
            arrays[n].append(arr.filter(pa.array(mask)))
    out = {}
    for n in want:
        parts = arrays[n] or [pa.array([], type=by_name[n]["col"].arrow_type())]
        out[n] = pa.chunked_array(parts)
    return pa.table(out), info


def empty_table(path: str, columns: list[str] | None = None) -> pa.Table:
    """Zero-row table with the file's schema, from a footer-only tail
    read (used when bloom filters prove every probe value absent — the
    data region is never touched)."""
    meta = read_footer(path)
    descs = _parse_schema(meta[2])
    want = columns or [d["name"] for d in descs]
    by_name = {d["name"]: d for d in descs}
    return pa.table(
        {n: pa.array([], type=_entry_type(by_name[n])) for n in want}
    )
