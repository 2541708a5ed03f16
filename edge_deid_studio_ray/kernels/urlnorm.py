"""URL canonicalization for web-corpus dedup.

Common-Crawl-style pipelines dedup by canonical URL before any content
hashing: the same page is typically crawled under many surface forms
(scheme/host case, default ports, tracking params, fragments, param
order).  This kernel normalizes those — and ONLY those — differences:

1. scheme and host lowercased;
2. a leading ``www.`` host label dropped;
3. default ports stripped (``:80`` for http, ``:443`` for https);
4. the fragment removed;
5. query parameters with tracking prefixes (``utm_``) or names
   (``fbclid``, ``gclid``) dropped;
6. surviving query parameters sorted bytewise (stable dedup key even
   when crawlers reorder them); an empty survivor set drops the ``?``.

Path case, path trailing slashes and percent-encoding are deliberately
NOT touched: they are semantically significant on real origins, and a
canonicalizer that merges distinct resources is worse than one that
misses a duplicate.

Pure function of its input — safe to call from any Ray worker without
state.  The rules are simple enough to mirror exactly in SQL (see the
``url_canonical_dedup`` oracle), which is what makes this operator
value-checkable end to end.
"""

from __future__ import annotations

_TRACKING_EXACT = {"fbclid", "gclid"}
_TRACKING_PREFIX = "utm_"


def _split_once(s: str, sep: str) -> tuple[str, str | None]:
    i = s.find(sep)
    if i < 0:
        return s, None
    return s[:i], s[i + len(sep) :]


def canonicalize_url(url: str) -> str:
    """Canonical form of an absolute http(s) URL (rules in module doc).

    Non-http(s) or scheme-less inputs are returned unchanged (query
    included) except for fragment removal — the caller decides whether to
    dedup those at all.  Case-sensitive userinfo survives verbatim.
    """
    base, _frag = _split_once(url, "#")
    head, query = _split_once(base, "?")

    scheme_part, rest = _split_once(head, "://")
    if rest is None:
        return base  # scheme-less: only the fragment is stripped
    scheme = scheme_part.lower()
    if scheme not in ("http", "https"):
        return base

    authority, slash_path = _split_once(rest, "/")
    path = "" if slash_path is None else "/" + slash_path

    # case-sensitive userinfo (user:pass@) is preserved verbatim; only the
    # host[:port] part is case-insensitive per RFC 3986
    userinfo = ""
    hostport = authority
    at = authority.rfind("@")
    if at >= 0:
        userinfo, hostport = authority[: at + 1], authority[at + 1 :]

    host = hostport.lower()
    if host.startswith("www."):
        host = host[4:]
    default_port = ":80" if scheme == "http" else ":443"
    if host.endswith(default_port):
        host = host[: -len(default_port)]

    out = f"{scheme}://{userinfo}{host}{path}"
    if query:
        kept = sorted(
            p
            for p in query.split("&")
            if p
            and not p.startswith(_TRACKING_PREFIX)
            and p.split("=", 1)[0] not in _TRACKING_EXACT
        )
        if kept:
            out += "?" + "&".join(kept)
    return out
