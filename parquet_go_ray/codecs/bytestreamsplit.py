"""BYTE_STREAM_SPLIT: transpose fixed-width values into per-byte planes so
downstream general-purpose compression sees long runs of similar bytes
(semantics of the reference's encoding/bytestreamsplit/bytestreamsplit.go:23-51,
expressed as a numpy transpose).
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray) -> bytes:
    """values: any fixed-width dtype; emits width byte planes."""
    a = np.ascontiguousarray(values)
    w = a.dtype.itemsize
    return a.view(np.uint8).reshape(-1, w).T.copy().tobytes()


def decode(buf: bytes, dtype, n: int) -> np.ndarray:
    dt = np.dtype(dtype)
    w = dt.itemsize
    planes = np.frombuffer(buf, dtype=np.uint8, count=n * w).reshape(w, n)
    return np.ascontiguousarray(planes.T).reshape(-1).view(dt)[:n]
