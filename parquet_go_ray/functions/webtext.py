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


# block-level boundaries for the general extractor: splitting on these
# tags yields candidate text blocks (jusText/Readability's unit of
# classification). RE2, non-backtracking.
_BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|article|section|aside|nav|header|footer|main|li|ul"
    r"|ol|table|tr|td|th|blockquote|pre|h[1-6]|br)[^>]*>"
)
# RE2 has no backreferences, so script/style pre-removal is one pass per
# element kind instead of <(script|style)>.*?</\1>
_SCRIPT_RE = r"(?si)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?si)<style[^>]*>.*?</style>"
_LINK_RE = r"(?i)<a[\s>]"


def extract_main_text_general(
    html_col,
    min_words: int = 5,
    max_links_per_10_words: int = 1,
) -> pa.Array:
    """General density-based boilerplate removal (jusText/Readability
    family) for arbitrary html — NOT bound to any page template, unlike
    `extract_main_text`'s <article> fast path.

    Fully vectorized, no per-row Python: script/style elements are
    removed with RE2 passes, each page is split into candidate blocks at
    block-level tag boundaries (one big flattened string array across
    the whole batch), every block is scored with Arrow kernels — word
    count of its tag-stripped text and anchor-tag count — and blocks
    survive iff they have >= min_words words AND at most
    max_links_per_10_words links per 10 words (integer-exact compare,
    no float density). Surviving block texts re-join per page with a
    newline via offset arithmetic + pc.binary_join. Pages where nothing
    survives yield the empty string.

    The classic block-classification heuristics this implements are the
    stopword-free subset of jusText (Pomikalek 2011): length + link
    density. Stopword density is available separately via
    functions.text stopword kernels if a caller wants to compose it."""
    import numpy as np

    s = _as_string(html_col)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    s = pc.fill_null(s, "")
    s = pc.replace_substring_regex(s, _SCRIPT_RE, " ")
    s = pc.replace_substring_regex(s, _STYLE_RE, " ")
    blocks = pc.split_pattern_regex(s, _BLOCK_SPLIT_RE)
    if isinstance(blocks, pa.ChunkedArray):
        blocks = blocks.combine_chunks()
    offsets = np.asarray(blocks.offsets)
    raw = blocks.values  # flattened: every block of every page

    n_links = pc.count_substring_regex(raw, _LINK_RE).to_numpy(
        zero_copy_only=False
    )
    text = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.replace_substring_regex(raw, r"<[^>]*>", " "), r"\s+", " "
        )
    )
    n_words = pc.count_substring_regex(text, r"\S+").to_numpy(
        zero_copy_only=False
    )
    keep = (n_words >= min_words) & (
        n_links * 10 <= n_words * max_links_per_10_words
    )

    n_pages = len(offsets) - 1
    counts = offsets[1:] - offsets[:-1]
    parent = np.repeat(np.arange(n_pages, dtype=np.int64), counts)
    kept_parent = parent[keep]
    kept_counts = np.bincount(kept_parent, minlength=n_pages)
    new_offsets = np.zeros(n_pages + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=new_offsets[1:])
    kept_list = pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int32())
        if new_offsets[-1] < 2**31
        else pa.array(new_offsets, type=pa.int64()),
        text.filter(pa.array(keep)),
    )
    return pc.binary_join(kept_list, "\n")


def canonicalize_urls(url_col) -> pa.Array:
    """Canonical form of each url — the dedup key a crawl pipeline
    groups on (the same page is typically crawled under many spellings):

      1. fragment stripped (#... never reaches the server),
      2. utm_* tracking params removed (with their separator),
      3. the first '&' promoted to '?' if the '?' was removed in 2,
      4. scheme and host lowercased (they are case-insensitive; the
         path is NOT touched — it is case-sensitive),
      5. trailing '/' and trailing '?' stripped.

    Every step is one RE2 pass (pyarrow and DuckDB both compile RE2, so
    the SQL oracle runs the LITERAL same patterns — the redact_pii
    verification pattern). No per-row Python."""
    u = _as_string(url_col)
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    c = pc.replace_substring_regex(u, r"#.*", "")
    c = pc.replace_substring_regex(c, r"[?&]utm_[a-zA-Z]+=[^&]*", "")
    c = pc.replace_substring_regex(c, r"^([^?]*)&", r"\1?")
    # lowercase the scheme://host prefix in place (one anchored match)
    m = pc.extract_regex(c, r"^(?P<pfx>[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)")
    pfx = pc.struct_field(m, "pfx")
    rest = pc.replace_substring_regex(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+", ""
    )
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pc.fill_null(pfx, "")), rest, ""
    )
    c = pc.if_else(pc.is_valid(pfx), lowered, c)
    c = pc.replace_substring_regex(c, r"/$", "")
    c = pc.replace_substring_regex(c, r"\?$", "")
    return c
