"""URL parsing and canonicalization kernels for web-page tables.

The CC-style pipeline ops the reference has no analogue for: split a
``url`` column into components and normalize it to a canonical form so
exact URL-dedup (the first dedup pass of every web-corpus build) keys
on meaning, not spelling. Everything is one RE2/Arrow kernel per batch
— no Python per row — and every rule is mirrored 1:1 by oracle SQL
regexes (DuckDB's regex engine is RE2 too, so the behaviors agree by
construction).

Canonicalization contract (documented order):

1. scheme and host lowercased;
2. default port stripped (``:80`` for http, ``:443`` for https);
3. fragment dropped;
4. every ``utm_*`` query parameter removed; an emptied query drops its
   ``?``;
5. trailing slashes stripped from a non-root path; an empty path
   becomes ``/``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

URL_RE = (r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://(?P<hostport>[^/?#]*)"
          r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$")
_HOSTPORT_RE = r"^(?P<host>[^:]*)(?::(?P<port>[0-9]*))?$"


def _as_array(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def parse_urls(urls) -> dict[str, pa.Array]:
    """Split a url string array into scheme/host/port/path/query/
    fragment arrays (unparticipating components are ``""``, matching
    DuckDB ``regexp_extract``'s convention — including strings that
    are not ``scheme://…`` URLs at all, which parse to all-``""``;
    :func:`canonicalize_urls` re-checks validity and nulls those)."""
    parts = pc.extract_regex(_as_array(urls), URL_RE)
    hp = pc.extract_regex(parts.field("hostport"), _HOSTPORT_RE)
    return {
        "scheme": parts.field("scheme"),
        "host": hp.field("host"),
        "port": hp.field("port"),
        "path": parts.field("path"),
        "query": parts.field("query"),
        "fragment": parts.field("fragment"),
    }


def add_url_parts(batch: pa.Table, url_col: str = "url",
                  parts: tuple = ("host", "path")) -> pa.Table:
    """Append selected parsed URL component columns to the batch."""
    p = parse_urls(batch[url_col])
    for name in parts:
        batch = batch.append_column(f"url_{name}", p[name])
    return batch


def canonicalize_urls(urls) -> pa.Array:
    """Vectorized canonical form of a url string array (see the module
    contract). Non-URL strings canonicalize to null."""
    p = parse_urls(urls)
    scheme = pc.utf8_lower(p["scheme"])
    host = pc.utf8_lower(p["host"])
    port = p["port"]
    default = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")))
    keep_port = pc.and_(pc.invert(default), pc.not_equal(port, ""))
    port_part = pc.if_else(keep_port,
                           pc.binary_join_element_wise(":", port, ""), "")
    path = pc.replace_substring_regex(p["path"], "/+$", "")
    path = pc.if_else(pc.equal(path, ""), "/", path)
    q = pc.replace_substring_regex(p["query"], "(?:^|&)utm_[^&]*", "")
    q = pc.replace_substring_regex(q, "^&", "")
    q_part = pc.if_else(pc.equal(q, ""), "",
                        pc.binary_join_element_wise("?", q, ""))
    out = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path, q_part, "")
    valid = pc.match_substring_regex(_as_array(urls), URL_RE)
    return pc.if_else(valid, out, pa.scalar(None, pa.string()))


def add_canonical_url(batch: pa.Table, url_col: str = "url",
                      out_col: str = "url_canon") -> pa.Table:
    return batch.append_column(out_col, canonicalize_urls(batch[url_col]))
