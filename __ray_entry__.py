"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in parquet_go_ray) calls ray.init()/ray.shutdown().

- entry(): flagship pipeline — encode the deterministic Common-Crawl-style
  web-page table (sf0.001) through the full codec engine (auto codec
  selection, chunk store + lineage manifest), decode it back, verify
  bit-identity, and return a summary DataFrame.
- queries(): one entry per implemented operator/pipeline (SURVEY.md §2 +
  training-data additions); each callable takes sf_dir.
- oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _tune() -> None:
    from parquet_go_ray.tuning import apply_data_context_tuning

    apply_data_context_tuning()


def entry() -> Any:
    import shutil

    import pandas as pd
    import ray.data

    _tune()

    from parquet_go_ray.pipelines.decode import decode_dataset
    from parquet_go_ray.pipelines.encode import encode_job
    from parquet_go_ray.pipelines.verify import verify_roundtrip
    from parquet_go_ray.sources import webpages
    from parquet_go_ray.state import manifest

    indir = webpages.ensure(0.001)
    files = webpages.shard_files(indir)
    out = "/tmp/graft_flagship_encode"
    shutil.rmtree(out, ignore_errors=True)
    summary = encode_job(files, out)
    res = verify_roundtrip(
        ray.data.read_parquet(files), decode_dataset(out)
    )
    hist = manifest.codec_histogram(out)
    return pd.DataFrame(
        {
            "rows": [summary["rows"]],
            "raw_nbytes": [summary["raw_nbytes"]],
            "enc_nbytes": [summary["enc_nbytes"]],
            "compression_ratio": [
                round(summary["enc_nbytes"] / max(1, summary["raw_nbytes"]), 4)
            ],
            "roundtrip_ok": [res["ok"]],
            "codecs_used": [",".join(sorted(hist))],
        }
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from parquet_go_ray.pipelines.queries import QUERIES

    _tune()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from parquet_go_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
