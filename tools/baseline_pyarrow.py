"""Measure the proxy reference: pyarrow's parquet writer with encodings
matching the reference's defaults (dictionary on, DELTA_BINARY_PACKED
for timestamps, DELTA_LENGTH_BYTE_ARRAY for byte arrays — node.go:417-433)
on the same web-page table. Records encode seconds, MB/s and compressed
bytes for BASELINE.md; our engine must be <= this compressed size (north
rule) and in the same throughput class.

Usage: python tools/baseline_pyarrow.py [sf]
"""

from __future__ import annotations

import json
import sys
import time

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
from parquet_go_ray.sources import webpages  # noqa: E402


def measure(sf: float) -> dict:
    files = webpages.shard_files(webpages.ensure(sf))
    tables = [pq.read_table(f) for f in files]
    raw = sum(t.nbytes for t in tables)
    results = {}
    for label, kwargs in {
        "snappy_dict": dict(compression="snappy", use_dictionary=True),
        "uncompressed_dict": dict(compression="NONE", use_dictionary=True),
        "uncompressed_delta": dict(
            compression="NONE",
            use_dictionary=False,
            column_encoding={
                "url": "DELTA_BYTE_ARRAY",
                "warc_ts": "DELTA_BINARY_PACKED",
                "html": "DELTA_LENGTH_BYTE_ARRAY",
                "text": "DELTA_LENGTH_BYTE_ARRAY",
                "lang": "DELTA_LENGTH_BYTE_ARRAY",
            },
        ),
        "zstd_dict": dict(compression="zstd", use_dictionary=True),
    }.items():
        t0 = time.time()
        out_bytes = 0
        for i, t in enumerate(tables):
            path = f"/tmp/pyarrow_ref_{label}_{i}.parquet"
            pq.write_table(t, path, **kwargs)
            import os

            out_bytes += os.path.getsize(path)
            os.remove(path)
        sec = time.time() - t0
        results[label] = {
            "sec": round(sec, 3),
            "mb_per_s": round(raw / 1e6 / sec, 2),
            "out_mb": round(out_bytes / 1e6, 2),
            "ratio": round(out_bytes / raw, 4),
        }
    return {"sf": sf, "raw_mb": round(raw / 1e6, 2), "writers": results}


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    print(json.dumps(measure(sf)))
