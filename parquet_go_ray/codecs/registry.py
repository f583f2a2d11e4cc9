"""Codec / physical-type registry and support matrix.

Mirrors the role of the reference's `canEncode` dispatch
(/root/reference/encoding.go:119-143): each physical type has a set of
valid codecs; unsupported combinations are rejected up front. Codec ids
are part of the chunk wire format — append-only.
"""

from __future__ import annotations

# wire format version: bump on ANY chunk/codec/manifest layout change so
# cached encoded stores are invalidated (a store written by version X
# must be decoded by version X)
FORMAT_VERSION = 7  # v7: chunk-header magic embeds the format version
                    # ("RC" + version byte + NUL); decode rejects any
                    # other version instead of silently misdecoding.
                    # (v6: delta codecs emit exact parquet wire form —
                    # no framing around self-terminating delta blocks)

# ---- codec ids (wire format: append-only) ----
PLAIN = 0
RLE = 1  # RLE/bit-packed hybrid with frame-of-reference header
DICT = 2  # dictionary page + RLE/bit-packed indexes
DELTA_BINARY_PACKED = 3
DELTA_LENGTH_BYTE_ARRAY = 4
DELTA_BYTE_ARRAY = 5
BYTE_STREAM_SPLIT = 6
FSST = 7
ARROW_IPC = 8  # fallback container for other/exotic types
LIST = 9  # structural: offsets chunk + child chunk
STRUCT = 10  # structural: validity + per-field child chunks
MAP = 11  # structural: list-of-struct shredding (offsets + key/value)
DICT_SHARED = 12  # indexes only; dictionary lives in the file's dict page
DICT_PAGE = 13  # row label for a file-level dict page (payload is a
# self-contained chunk of the dictionary values)
XOR_FLOAT = 14  # byte-aligned Gorilla XOR-previous (xorfloat.py);
# append-only addition — stores written before it decode unchanged
ALP_FLOAT = 15  # adaptive lossless decimal floats (alp.py, VLDB 2023);
# append-only addition, same contract as XOR_FLOAT

CODEC_NAMES = {
    PLAIN: "plain",
    RLE: "rle",
    DICT: "dict",
    DELTA_BINARY_PACKED: "delta_binary_packed",
    DELTA_LENGTH_BYTE_ARRAY: "delta_length_byte_array",
    DELTA_BYTE_ARRAY: "delta_byte_array",
    BYTE_STREAM_SPLIT: "byte_stream_split",
    FSST: "fsst",
    ARROW_IPC: "arrow_ipc",
    LIST: "list",
    STRUCT: "struct",
    MAP: "map",
    DICT_SHARED: "dict_shared",
    DICT_PAGE: "dict_page",
    XOR_FLOAT: "xor_float",
    ALP_FLOAT: "alp",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}

# ---- physical types (wire format: append-only) ----
BOOLEAN = 0
INT32 = 1
INT64 = 2
FLOAT = 3
DOUBLE = 4
BYTE_ARRAY = 5
FIXED_LEN_BYTE_ARRAY = 6
P_LIST = 7
OTHER = 8
P_STRUCT = 9
P_MAP = 10

PTYPE_NAMES = {
    BOOLEAN: "BOOLEAN",
    INT32: "INT32",
    INT64: "INT64",
    FLOAT: "FLOAT",
    DOUBLE: "DOUBLE",
    BYTE_ARRAY: "BYTE_ARRAY",
    FIXED_LEN_BYTE_ARRAY: "FIXED_LEN_BYTE_ARRAY",
    P_LIST: "LIST",
    OTHER: "OTHER",
    P_STRUCT: "STRUCT",
    P_MAP: "MAP",
}

# valid codecs per physical type (order = deterministic selector tie-break)
SUPPORTED: dict[int, tuple[int, ...]] = {
    BOOLEAN: (RLE, PLAIN),
    INT32: (PLAIN, RLE, DICT, DELTA_BINARY_PACKED, BYTE_STREAM_SPLIT),
    INT64: (PLAIN, RLE, DICT, DELTA_BINARY_PACKED, BYTE_STREAM_SPLIT),
    FLOAT: (PLAIN, DICT, BYTE_STREAM_SPLIT, XOR_FLOAT, ALP_FLOAT),
    DOUBLE: (PLAIN, DICT, BYTE_STREAM_SPLIT, XOR_FLOAT, ALP_FLOAT),
    BYTE_ARRAY: (PLAIN, DICT, DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY, FSST),
    FIXED_LEN_BYTE_ARRAY: (PLAIN, DICT, BYTE_STREAM_SPLIT),
    P_LIST: (LIST,),
    OTHER: (ARROW_IPC,),
    P_STRUCT: (STRUCT,),
    P_MAP: (MAP,),
}


def can_encode(ptype: int, codec: int) -> bool:
    return codec in SUPPORTED.get(ptype, ())


# ---- user-extension codecs (§2.7 parity with the reference's public
# encoding.Encoding interface, encoding/encoding.go:20 + node.go:417).
# Ids 64-127 are RESERVED for extensions: built-ins stay append-only
# below 64, so an extension store never collides with a future
# built-in. An extension encode_fn takes the null-free pyarrow values
# array and returns payload bytes; decode_fn takes (payload, n) and
# returns the values back as a pyarrow array (or numpy for numeric
# types — both are accepted). Registration is PER PROCESS: like a Go
# user compiling their Encoding into the binary, register at import
# time of the module your pipeline ships to the workers (e.g. in your
# map_batches callable's __init__), so every worker process has the
# codec before it encodes or decodes. Selection is explicit per column
# (codec_overrides={col: name}) — extensions do not enter the
# automatic selector, mirroring Node.Encoding()'s per-column contract.

EXTENSION_MIN, EXTENSION_MAX = 64, 127
EXTENSION_CODECS: dict[int, tuple] = {}  # id -> (encode_fn, decode_fn)


def register_codec(
    codec_id: int,
    name: str,
    ptypes: tuple[int, ...],
    encode_fn,
    decode_fn,
) -> None:
    """Idempotent per-process registration of an extension codec."""
    if not (EXTENSION_MIN <= codec_id <= EXTENSION_MAX):
        raise ValueError(
            f"extension codec ids are {EXTENSION_MIN}-{EXTENSION_MAX}, got {codec_id}"
        )
    existing = CODEC_IDS.get(name)
    if existing is not None and existing != codec_id:
        raise ValueError(f"codec name {name!r} already taken by id {existing}")
    CODEC_NAMES[codec_id] = name
    CODEC_IDS[name] = codec_id
    EXTENSION_CODECS[codec_id] = (encode_fn, decode_fn)
    for pt in ptypes:
        if codec_id not in SUPPORTED[pt]:
            SUPPORTED[pt] = SUPPORTED[pt] + (codec_id,)


def is_extension(codec: int) -> bool:
    return EXTENSION_MIN <= codec <= EXTENSION_MAX


# ---- chunk-level general compression (parity with the reference's
# compress.Codec layer, compress/compress.go:19-37; applied after the
# lightweight encoding like pages are compressed after encode,
# writer.go:1130-1135). id 0 = uncompressed (the reference's default,
# writer.go:318-321).
COMPRESSIONS = {0: None, 1: "zstd", 2: "snappy", 3: "lz4", 4: "gzip", 5: "brotli"}
COMPRESSION_IDS = {v: k for k, v in COMPRESSIONS.items()}
