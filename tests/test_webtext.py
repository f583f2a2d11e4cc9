import pyarrow as pa
import pytest


def test_extract_functions():
    from parquet_go_ray.functions import webtext as W

    html = pa.array(
        [
            b"<html><head><title>t</title></head><body><nav>x | y</nav>"
            b"<article><p>hello world two</p></article>"
            b"<footer>&copy; 2020 u</footer></body></html>",
            b"<html><body>no article here</body></html>",
        ],
        type=pa.binary(),
    )
    got = W.extract_main_text(html)
    assert got[0].as_py() == "hello world two"
    assert got[1].as_py() is None
    stripped = W.strip_tags(html)
    assert "hello world two" in stripped[0].as_py()
    assert "nav" not in stripped[0].as_py() or "x | y" in stripped[0].as_py()
    hosts = W.extract_host(pa.array(["https://WWW.Ex.org/a/b?q=1", "ftp://h2/x", "relative/only"]))
    assert hosts.to_pylist() == ["www.ex.org", "h2", None]


def test_extract_text_verified_roundtrip(ray_session):
    from parquet_go_ray.pipelines.webtext import extract_text_verified, host_stats
    from parquet_go_ray.sources import webpages
    from parquet_go_ray.sources.pathwise import read_parquet_pathwise

    files = webpages.shard_files(webpages.ensure(0.001))
    ds = read_parquet_pathwise(files)
    res = extract_text_verified(ds)
    assert res["ok"] and res["mismatches"] == 0 and res["rows"] == 6250

    hs = host_stats(read_parquet_pathwise(files)).to_pandas()
    assert hs["sum(n)"].sum() == 6250
    assert (hs["host"].str.startswith("www.")).all()


def test_extract_detects_corruption(ray_session):
    """The verifier actually fails on a changed byte (not vacuous)."""
    import pandas as pd

    import ray.data

    from parquet_go_ray.pipelines.webtext import extract_text_verified

    df = pd.DataFrame(
        {
            "url": ["https://a/x", "https://b/y"],
            "html": [
                b"<html><body><article><p>good text</p></article></body></html>",
                b"<html><body><article><p>tampered text</p></article></body></html>",
            ],
            "text": ["good text", "original text"],
        }
    )
    res = extract_text_verified(ray.data.from_pandas(df))
    assert res["rows"] == 2 and res["mismatches"] == 1 and not res["ok"]


class TestGeneralExtractor:
    """extract_main_text_general: template-independent density-based
    boilerplate removal, fully Arrow-vectorized."""

    def _extract(self, pages, **kw):
        import pyarrow as pa

        from parquet_go_ray.functions.webtext import (
            extract_main_text_general,
        )

        return [
            v.as_py() for v in extract_main_text_general(pa.array(pages), **kw)
        ]

    def test_drops_link_dense_and_short_blocks(self):
        page = (
            "<html><head><title>t</title><style>b{}</style></head><body>"
            '<nav><a href="/">home</a> <a href="/a">about the site</a> '
            '<a href="/c">contact us today</a></nav>'
            "<div><p>the quick brown fox jumps over the lazy dog "
            "daily</p></div>"
            "<footer>&copy; 2020 example</footer>"
            "<script>var x=1; if (x<2) { x = 3; }</script></body></html>"
        )
        (out,) = self._extract([page])
        assert out == "the quick brown fox jumps over the lazy dog daily"

    def test_multiple_content_blocks_join_with_newline(self):
        page = (
            "<div>first paragraph with enough words to clear the rule</div>"
            "<div>second paragraph also has enough words to clear it</div>"
        )
        (out,) = self._extract([page])
        assert out == (
            "first paragraph with enough words to clear the rule\n"
            "second paragraph also has enough words to clear it"
        )

    def test_moderate_links_in_long_text_survive(self):
        words = " ".join(f"w{i}" for i in range(40))
        page = f'<p>{words} see <a href="/x">this reference</a> too</p>'
        (out,) = self._extract([page])
        assert out.startswith("w0 w1") and "reference" in out

    def test_null_empty_and_tagless(self):
        outs = self._extract(
            [
                None,
                "",
                "plain words with no markup but easily enough of them here",
            ]
        )
        assert outs[0] == "" and outs[1] == ""
        assert outs[2].startswith("plain words")

    def test_thresholds_are_parameters(self):
        page = "<p>five words in here ok</p><p>tiny</p>"
        (strict,) = self._extract([page], min_words=6)
        assert strict == ""
        (loose,) = self._extract([page], min_words=1)
        assert loose == "five words in here ok\ntiny"
