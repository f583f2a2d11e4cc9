"""The decode job: encoded chunk store -> original table (bit-identical).

Each chunk file is self-contained, so decode is an embarrassingly
parallel `read_binary_files -> map_batches(ChunkFileDecoder)` stream —
no shuffle, no driver materialization.
"""

from __future__ import annotations

from pathlib import Path

import ray.data

from ..stages.decode import ChunkFileDecoder


def chunk_files(encoded_dir: str) -> list[str]:
    return sorted(str(p) for p in (Path(encoded_dir) / "data").glob("*/*.parquet"))


def decode_dataset(encoded_dir: str, concurrency: int | None = None) -> ray.data.Dataset:
    files = chunk_files(encoded_dir)
    if not files:
        raise FileNotFoundError(f"no encoded chunks under {encoded_dir}")
    ds = ray.data.read_binary_files(files)
    # stateless task form: decode holds no state worth amortizing
    return ds.map_batches(
        ChunkFileDecoder(),
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )
