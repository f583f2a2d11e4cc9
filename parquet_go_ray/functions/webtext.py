"""Web-page text extraction (the boilerplate-removal stage of a
Common-Crawl-style pipeline).

Fully vectorized with Arrow RE2 kernels — no Python per-row work. The
north rule's per-row invariant is byte-identical extracted text per
url; `pipelines.webtext.extract_text_verified` asserts exactly that
against the corpus's stored text column, distributed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# main-content pattern: the <article> body. RE2 is non-backtracking, so
# this is linear in the html size; (?s) lets the body span newlines.
_ARTICLE_RE = r"(?s)<article><p>(?P<txt>.*?)</p></article>"


def _as_string(col) -> pa.Array:
    ty = col.type if hasattr(col, "type") else None
    if ty is not None and (pa.types.is_binary(ty) or pa.types.is_large_binary(ty)):
        return pc.cast(col, pa.large_string())
    return col


def extract_main_text(html_col) -> pa.Array:
    """The main-content text of each page: the <article> body with no
    surrounding nav/footer boilerplate. Null where no article exists."""
    s = _as_string(html_col)
    m = pc.extract_regex(s, _ARTICLE_RE)
    return pc.struct_field(m, "txt")


def strip_tags(html_col) -> pa.Array:
    """Generic tag stripping for arbitrary html: tags removed, runs of
    whitespace collapsed, ends trimmed. Keeps boilerplate text (use
    extract_main_text for main-content extraction)."""
    s = _as_string(html_col)
    no_tags = pc.replace_substring_regex(s, r"<[^>]*>", " ")
    collapsed = pc.replace_substring_regex(no_tags, r"\s+", " ")
    return pc.utf8_trim_whitespace(collapsed)


def extract_host(url_col) -> pa.Array:
    """The host of each url (scheme and path dropped), lowercase."""
    m = pc.extract_regex(
        _as_string(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<host>[^/:?#]+)"
    )
    return pc.utf8_lower(pc.struct_field(m, "host"))
