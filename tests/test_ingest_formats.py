"""ingest CLI: ORC and Feather(Arrow-IPC) sources stage one task per
input file through the pyarrow readers (stem-named shards, re-run
skips), then the normal encode job runs — decoded store must equal the
source rows exactly."""

import argparse

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _src_table(i: int) -> pa.Table:
    n = 100
    return pa.table(
        {
            "doc_id": pa.array(np.arange(i * n, (i + 1) * n, dtype=np.int64)),
            "text": pa.array([f"doc {i} row {j}" for j in range(n)]),
            "score": pa.array(np.linspace(0, 1, n)),
        }
    )


def _run_ingest(in_dir, out_dir, fmt):
    from parquet_go_ray.__main__ import cmd_ingest

    args = argparse.Namespace(
        input_dir=str(in_dir),
        out_dir=str(out_dir),
        format=fmt,
        staging=None,
        rows_per_chunk=64,
        compression=None,
        bloom=None,
        num_cpus=None,
        address=None,
    )
    assert cmd_ingest(args) == 0


@pytest.mark.parametrize("fmt", ["orc", "feather"])
def test_ingest_orc_feather_roundtrip(tmp_path, ray_session, fmt):
    from parquet_go_ray.pipelines.decode import decode_dataset

    src = tmp_path / "src"
    src.mkdir()
    want = []
    for i in range(3):
        t = _src_table(i)
        want.append(t.to_pandas())
        if fmt == "orc":
            from pyarrow import orc

            orc.write_table(t, str(src / f"in{i}.orc"))
        else:
            from pyarrow import feather

            feather.write_feather(t, str(src / f"in{i}.feather"))
    out = tmp_path / "store"
    _run_ingest(src, out, fmt)
    got = (
        decode_dataset(str(out))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    exp = pd.concat(want, ignore_index=True).sort_values("doc_id", ignore_index=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()
    assert np.allclose(got["score"], exp["score"])
    # staging is resumable: re-running the ingest is a no-op for staging
    # (stem-named shards already exist) and the encode job resume-skips
    _run_ingest(src, out, fmt)
    again = decode_dataset(str(out)).to_pandas()
    assert len(again) == len(exp)
