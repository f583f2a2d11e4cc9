"""Round-trip verification: decoded output ≡ original input.

Distributed, order-insensitive, O(1) driver memory: each batch maps to
one (row_count, sum-of-row-hashes mod 2^64) pair; equal multisets of
rows give equal sums. Row hashes come from pandas' vectorized siphash
(`pd.util.hash_pandas_object`, fixed key) over columns sorted by name —
the per-url byte-identical `text` check reduces to hash equality here,
and pytest additionally does exact per-row comparison at small scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

_MOD = np.uint64(0xFFFFFFFFFFFFFFFF)


def _batch_hash(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    # accumulate mod 2^64 (uint64 wraparound)
    with np.errstate(over="ignore"):
        s = np.add.reduce(h.astype(np.uint64), dtype=np.uint64)
    # keep uint64 precision (a python int > 2^63 would coerce to float64)
    return pd.DataFrame({"rows": [len(df)], "hsum": np.array([s], dtype=np.uint64)})


def dataset_checksum(ds: ray.data.Dataset) -> tuple[int, int]:
    """Return (row_count, order-insensitive checksum)."""
    parts = ds.map_batches(_batch_hash, batch_format="pandas").to_pandas()
    rows = int(parts["rows"].sum())
    hsum = int(np.bitwise_and(
        np.add.reduce(parts["hsum"].to_numpy(dtype=np.uint64), dtype=np.uint64),
        _MOD,
    )) if len(parts) else 0
    return rows, hsum


def verify_roundtrip(
    input_ds: ray.data.Dataset, decoded_ds: ray.data.Dataset
) -> dict:
    in_rows, in_sum = dataset_checksum(input_ds)
    out_rows, out_sum = dataset_checksum(decoded_ds)
    return {
        "rows_in": in_rows,
        "rows_out": out_rows,
        "checksum_in": in_sum,
        "checksum_out": out_sum,
        "ok": in_rows == out_rows and in_sum == out_sum,
    }
