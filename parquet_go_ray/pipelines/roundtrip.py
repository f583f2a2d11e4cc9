"""In-memory encode->decode round-trip as a Ray Data stage.

Used by the correctness-gate queries: running a table through the full
codec path inside `map_batches` and handing the result to the DuckDB
oracle (`SELECT *`) proves the engine end-to-end through the SQL hash
compare.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..stages.decode import decode_chunk_table
from ..stages.encode import encode_table


class RoundTrip:
    """map_batches callable: encode every column, decode back, return."""

    def __init__(self, codec_overrides: dict[str, str] | None = None):
        self.codec_overrides = codec_overrides

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        from ..codecs import registry as R

        overrides = (
            {k: R.CODEC_IDS[v] for k, v in self.codec_overrides.items()}
            if self.codec_overrides
            else None
        )
        chunks = encode_table(batch, "mem", overrides)
        return decode_chunk_table(chunks)


def roundtrip_dataset(ds: ray.data.Dataset, **kwargs) -> ray.data.Dataset:
    return ds.map_batches(
        RoundTrip(), batch_format="pyarrow", zero_copy_batch=True, **kwargs
    )
