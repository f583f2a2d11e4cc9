"""Pure per-chunk codec kernels (numpy / pyarrow — no Ray).

Public API:
    encode_array(arr, codec=None) -> bytes   (codec=None: auto-select)
    decode_array(buf) -> pa.Array            (bit-identical round-trip)
    registry: codec ids / names / support matrix
"""

from . import bytestreamsplit, delta, dictionary, fsst, plain, registry, rle, selector
from .chunk import ChunkError, decode_array, encode_array, physical_type

__all__ = [
    "encode_array",
    "decode_array",
    "physical_type",
    "ChunkError",
    "registry",
    "plain",
    "rle",
    "delta",
    "bytestreamsplit",
    "dictionary",
    "fsst",
    "selector",
]
