"""HTML → text extraction on the stdlib parser.

The reference extracts HTML as
``BeautifulSoup(html, "html.parser").get_text(separator="\\n")`` over the
whole file read with ``errors="replace"``
(/root/reference/src/deid_pipeline/handlers/text.py:14-24).  bs4 is not a
baked-in dependency here, so this kernel reimplements those semantics
directly on :class:`html.parser.HTMLParser` (the same underlying tokenizer
bs4's "html.parser" tree builder wraps):

- ``convert_charrefs=True``: character/entity references are decoded and do
  NOT split a text run;
- one text node per maximal character-data run (consecutive ``handle_data``
  calls between tag/markup events merge, mirroring bs4's ``endData``
  buffering);
- comments, doctype, processing instructions are excluded; CDATA content is
  included (bs4 ``CData`` is an interesting string type);
- contents of ``<script>``/``<style>`` are excluded (bs4 >= 4.9 containers
  ``Script``/``Stylesheet`` are not part of ``get_text``);
- nodes are joined with the separator (``"\\n"``), including whitespace-only
  inter-tag runs, exactly like ``get_text``.

Output offsets are Python code points; malformed UTF-8 input bytes must be
decoded upstream with ``errors="replace"`` to match the reference.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_SKIP_CONTAINERS = {"script", "style"}
# Void elements never get a closing tag; html.parser still reports them via
# handle_starttag, which is sufficient — we only track skip-container depth.
_CDATA_PREFIX = "CDATA["


class _TextCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.strings: list[str] = []
        self._buffer: list[str] = []
        self._skip_depth = 0

    # -- buffering ---------------------------------------------------------
    def _flush(self) -> None:
        if self._buffer:
            self.strings.append("".join(self._buffer))
            self._buffer.clear()

    # -- markup events (all flush the current text run) --------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        self._flush()
        if tag in _SKIP_CONTAINERS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        self._flush()
        if tag in _SKIP_CONTAINERS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        self._flush()

    def handle_comment(self, data: str) -> None:
        self._flush()

    def handle_decl(self, decl: str) -> None:
        self._flush()

    def handle_pi(self, data: str) -> None:
        self._flush()

    def unknown_decl(self, data: str) -> None:
        self._flush()
        if data.startswith(_CDATA_PREFIX):
            self.strings.append(data[len(_CDATA_PREFIX):])

    # -- character data ----------------------------------------------------
    def handle_data(self, data: str) -> None:
        if data and not self._skip_depth:
            self._buffer.append(data)

    def close(self) -> None:
        super().close()
        self._flush()


# -- fast path ----------------------------------------------------------------
#
# A single-pass scanner producing byte-identical strings for the common,
# well-formed subset of html.parser's grammar (verified branch-by-branch
# against CPython 3.11 html/parser.py); ANYTHING outside that subset raises
# _FastBail and the document re-parses through _TextCollector, so the fast
# path can only ever change speed, never output.  ~3-4x on tag-dense pages:
# HTMLParser pays per-attribute regex matching, attr-value unescaping and
# line/column bookkeeping that text extraction never uses.

class _FastBail(Exception):
    pass


# strict start tag: name + well-formed attrs only.  Stricter than
# locatestarttagend_tolerant by construction (unquoted values exclude
# quotes/'/'/'<'), so every accepted match ends at the same '>' with the
# same tag name and the same startendtag ('/>') decision as HTMLParser;
# atomic groups keep rejection linear-time.
_FAST_START = re.compile(
    r'<([a-zA-Z][-.a-zA-Z0-9:_]*)(?=[ \t\n\r\f/>])'
    r'(?>\s+[^\s/>"\'=]+(?:\s*=\s*(?>"[^"]*"|\'[^\']*\'|[^\s>"\'=/`<]+))?)*'
    r"\s*(/?)>"
)
# The lookahead after the tag name is a correctness guard, not a nicety:
# html.parser's tag-NAME charset is [^\t\n\r\f />\x00] — Unicode whitespace
# like \x0b or \xa0 directly after our (narrower) name match is part of the
# parser's name (`<script\xa0>` is tag 'script\xa0', NOT a skip container),
# while our \s+ separator would silently treat it as an attribute break.
# Only ASCII [ \t\n\r\f/>] may legally follow; anything else bails.
# Separators DEEPER in the tag are safe as \s: the parser's own
# attrfind_tolerant/locatestarttagend use Unicode \s there too.
# html.parser's endtagfind, verbatim semantics
_FAST_END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
# html.parser's tagfind_tolerant (end-tag fallback name scan)
_FAST_END_NAME = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)")
_COMMENT_CLOSE = re.compile(r"--\s*>")  # html.parser commentclose
_MARKED_CLOSE = re.compile(r"\]\s*\]\s*>")  # _markupbase _markedsectionclose
# set_cdata_mode's interesting pattern per container
_CDATA_CLOSE = {t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE) for t in _SKIP_CONTAINERS}


def _fast_strings(html: str) -> list[str]:
    strings: list[str] = []
    buf: list[str] = []
    i, n = 0, len(html)
    find = html.find
    startswith = html.startswith
    while i < n:
        lt = find("<", i)
        if lt < 0:
            seg = html[i:]
            if seg:
                buf.append(unescape(seg) if "&" in seg else seg)
            break
        if lt > i:
            seg = html[i:lt]
            buf.append(unescape(seg) if "&" in seg else seg)
        c = html[lt + 1 : lt + 2]
        if c and ("a" <= c <= "z" or "A" <= c <= "Z"):
            m = _FAST_START.match(html, lt)
            if not m:
                raise _FastBail  # tolerant-parse / bogus-input territory
            if m.group(2):
                # Ambiguity guard: HTMLParser's attrfind_tolerant folds a '/'
                # that directly follows an UNQUOTED attribute value into that
                # value (`<a data=x/>` is a plain start tag with data='x/').
                # Our '/' is safe only after whitespace, a quote, an attr
                # name, or the tag name; `...=value/>` must bail.
                p = m.end() - 3
                if html[p] not in ' \t\n\r\f"\'':
                    j = p
                    while j > lt and html[j] not in " \t\n\r\f=":
                        j -= 1
                    while j > lt and html[j] in " \t\n\r\f":
                        j -= 1
                    if html[j] == "=":
                        raise _FastBail
            if buf:
                strings.append("".join(buf))
                buf.clear()
            i = m.end()
            if not m.group(2):
                tag = m.group(1).lower()
                if tag in _SKIP_CONTAINERS:
                    # CDATA mode: content until the full `</tag\s*>` is
                    # handle_data (dropped by the skip container); no close
                    # tag means the rest of the document is dropped too.
                    endm = _CDATA_CLOSE[tag].search(html, i)
                    if not endm:
                        break
                    i = endm.end()
        elif c == "/":
            m = _FAST_END.match(html, lt)
            if m:
                end = m.end()
            else:
                nm = _FAST_END_NAME.match(html, lt + 2)
                if nm:  # `</name junk>`: endtag(name), skip to '>'
                    gt = find(">", nm.end())
                    if gt < 0:
                        raise _FastBail
                    end = gt + 1
                elif startswith("</>", lt):
                    i = lt + 3  # consumed, no event, text run continues
                    continue
                else:  # bogus comment: handle_comment up to first '>'
                    gt = find(">", lt + 2)
                    if gt < 0:
                        raise _FastBail
                    end = gt + 1
            if buf:
                strings.append("".join(buf))
                buf.clear()
            i = end
        elif c == "!":
            if startswith("<!--", lt):
                mm = _COMMENT_CLOSE.search(html, lt + 4)
                if not mm:
                    raise _FastBail
                end = mm.end()
            elif startswith("<![", lt):
                if not startswith("<![CDATA[", lt):
                    raise _FastBail  # other/odd-case marked sections
                mm = _MARKED_CLOSE.search(html, lt + 3)
                if not mm:
                    raise _FastBail
                if buf:
                    strings.append("".join(buf))
                    buf.clear()
                # unknown_decl('CDATA[...') -> collector appends the content
                strings.append(html[lt + 9 : mm.start()])
                i = mm.end()
                continue
            elif html[lt : lt + 9].lower() == "<!doctype":
                gt = find(">", lt + 9)
                if gt < 0:
                    raise _FastBail
                end = gt + 1
            else:  # parse_bogus_comment
                gt = find(">", lt + 2)
                if gt < 0:
                    raise _FastBail
                end = gt + 1
            if buf:
                strings.append("".join(buf))
                buf.clear()
            i = end
        elif c == "?":
            gt = find(">", lt + 2)
            if gt < 0:
                raise _FastBail
            if buf:
                strings.append("".join(buf))
                buf.clear()
            i = gt + 1
        else:  # lone '<' (incl. at EOF): literal character data
            buf.append("<")
            i = lt + 1
    if buf:
        strings.append("".join(buf))
    return strings


def _parser_strings(html: str) -> list[str]:
    collector = _TextCollector()
    collector.feed(html)
    collector.close()
    return collector.strings


def _parser_internals_match() -> bool:
    """The fast path reproduces html.parser's 3.11-era grammar; the 2025
    HTML5-conformance backports change comment/bogus-markup handling on
    maintenance branches.  Pin the stdlib regexes the equivalence was
    verified against — ANY deviation disables the fast path entirely (a
    pure slowdown) instead of silently diverging."""
    try:
        import _markupbase
        import html.parser as hp

        return (
            hp.commentclose.pattern == r"--\s*>"
            and hp.endtagfind.pattern == r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>"
            and hp.tagfind_tolerant.pattern
            == r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*"
            and hp.attrfind_tolerant.pattern
            == (
                r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
                r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*'
            )
            and _markupbase._markedsectionclose.pattern == r"]\s*]\s*>"
        )
    except (ImportError, AttributeError):
        return False


_FAST_PATH_SAFE = _parser_internals_match()


def html_to_text(html: str, separator: str = "\n") -> str:
    """Extract all text nodes of an HTML document joined by ``separator``."""
    if _FAST_PATH_SAFE:
        try:
            return separator.join(_fast_strings(html))
        except _FastBail:
            pass
    return separator.join(_parser_strings(html))


def decode_html_bytes(raw: bytes) -> str:
    """Decode page bytes as UTF-8 with ``errors="replace"`` (text.py:15,22)."""
    return raw.decode("utf-8", errors="replace")


class _LinkCollector(HTMLParser):
    """Collect ``(href, anchor_text)`` pairs — the WAT-file side of a
    Common-Crawl extraction pass.  Anchor text is the concatenation of the
    TEXT nodes inside the <a> — <script>/<style> bodies are excluded, same
    as :class:`_TextCollector`; an opening <a> implicitly closes any open
    one (browser behavior for invalid nesting); <a> without href is not a
    link and collects nothing."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []
        self._skip_depth = 0

    def _close(self) -> None:
        if self._href is not None:
            self.links.append((self._href, "".join(self._buf)))
        self._href = None
        self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_CONTAINERS:
            self._skip_depth += 1
        elif tag == "a":
            self._close()
            self._href = next((v for k, v in attrs if k == "href"), None)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "a":  # <a href=x/> opens and closes empty
            self._close()
            self._href = next((v for k, v in attrs if k == "href"), None)
            self._close()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTAINERS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
        elif tag == "a":
            self._close()

    def handle_data(self, data: str) -> None:
        if self._href is not None and not self._skip_depth:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._close()


def extract_links(html: str) -> list[tuple[str, str]]:
    """All ``(href, anchor_text)`` pairs of a document, in document order."""
    collector = _LinkCollector()
    collector.feed(html)
    collector.close()
    return collector.links
