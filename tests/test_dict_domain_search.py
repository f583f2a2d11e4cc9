"""Encoded-domain predicate evaluation: dict_domain_mask computes row
masks from dictionary codes without materializing row values, and
search_dict_domain skips whole chunk groups whose dictionary proves
zero matches."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.codecs import chunk as C
from parquet_go_ray.codecs import registry as R


class TestDictDomainMask:
    def test_string_dict_with_nulls(self):
        a = pa.array((["en", "de", "fr", "en"] * 200) + [None] * 8)
        blob = C.encode_array(a)
        assert R.CODEC_NAMES[blob[4]] == "dict"
        m = C.dict_domain_mask(blob, ["en", "de"])
        exp = np.array(
            [v in ("en", "de") if v is not None else False for v in a.to_pylist()]
        )
        assert m is not None and (m == exp).all()

    def test_int_dict(self):
        a = pa.array(([7, 7, 7, 9, 9, 11] * 100), type=pa.int64())
        blob = C.encode_array(a, codec=R.CODEC_IDS["dict"])
        m = C.dict_domain_mask(blob, [9])
        assert (m == (a.to_numpy() == 9)).all()

    def test_no_encoded_domain_returns_none(self):
        blob = C.encode_array(pa.array(np.arange(10_000, dtype=np.int64)))
        assert R.CODEC_NAMES[blob[4]] != "dict"
        assert C.dict_domain_mask(blob, [5]) is None

    def test_value_absent_from_dictionary(self):
        a = pa.array(["x", "y"] * 50)
        blob = C.encode_array(a, codec=R.CODEC_IDS["dict"])
        m = C.dict_domain_mask(blob, ["zz"])
        assert m is not None and not m.any()


class TestSearchDictDomain:
    @pytest.fixture()
    def store(self, ray_session, tmp_path):
        from parquet_go_ray.pipelines.encode import encode_job

        n = 4000
        rng = np.random.default_rng(5)
        langs = np.array(["en", "de", "fr", "ja", "ar"])[
            rng.integers(0, 5, n)
        ]
        # one shard whose chunks NEVER contain 'ja' so the group skip
        # has something to skip (ids 0..999 drawn from en/de only)
        langs[:1000] = np.array(["en", "de"])[rng.integers(0, 2, 1000)]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "lang": pa.array(list(langs)),
                "n_chars": pa.array(
                    rng.integers(10, 500, n).astype(np.int64)
                ),
            }
        )
        src = tmp_path / "docs.parquet"
        pq.write_table(t, src)
        out = str(tmp_path / "store")
        encode_job([str(src)], out, rows_per_chunk=256)
        return out, t

    def test_matches_brute_force(self, store):
        from parquet_go_ray.pipelines.decode import search_dict_domain

        out_dir, t = store
        df = (
            search_dict_domain(
                out_dir, "lang", ["ja"], columns=["doc_id", "lang"]
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        langs = np.asarray(t.column("lang").to_pylist())
        exp_ids = np.nonzero(langs == "ja")[0]
        assert (df["doc_id"].to_numpy() == exp_ids).all()
        assert (df["lang"] == "ja").all()
        # rows 0..999 were built without 'ja': their chunk groups must
        # contribute nothing (the dictionary-domain skip is what makes
        # this cheap, correctness-checkable here as absence)
        assert (df["doc_id"].to_numpy() >= 1000).all()

    def test_projection_excluding_search_column(self, store):
        from parquet_go_ray.pipelines.decode import search_dict_domain

        out_dir, t = store
        df = search_dict_domain(
            out_dir, "lang", ["fr"], columns=["doc_id"]
        ).to_pandas()
        langs = np.asarray(t.column("lang").to_pylist())
        assert set(df.columns) == {"doc_id"}
        assert set(df["doc_id"]) == set(np.nonzero(langs == "fr")[0])

    def test_fallback_codec_column(self, store):
        """Searching on a column the selector did NOT dict-encode
        (n_chars: wide int range) exercises the decode+compare
        fallback inside the same task."""
        from parquet_go_ray.pipelines.decode import search_dict_domain

        out_dir, t = store
        wanted = [17, 123, 400]
        df = search_dict_domain(
            out_dir, "n_chars", wanted, columns=["doc_id", "n_chars"]
        ).to_pandas()
        nc = t.column("n_chars").to_numpy()
        assert set(df["doc_id"]) == set(np.nonzero(np.isin(nc, wanted))[0])
