"""Main-content extraction: DOM text-density / link-density heuristics.

North-star capability 1 (BASELINE.json): jusText/Readability-style boilerplate
stripping.  The reference has NO such operator — its HTML path keeps all text
(handlers/text.py:17-24) — so this mode is validated against our own golden
fixtures, not the reference (SURVEY.md §7.1).

Algorithm (deterministic, publication-style heuristics from jusText
[Pomikálek 2011] / Readability, re-derived from the papers):

1. Tokenize HTML with the stdlib parser into *blocks*: text runs grouped by
   the nearest block-level ancestor; a new block starts at each block-level
   tag boundary.
2. Per block record: total text length, text length inside ``<a>`` tags,
   stopword-ish density proxy (digits/punctuation ratio), and whether any
   ancestor is a boilerplate container (``nav/header/footer/aside/form``).
3. Classify: a block is *content* iff it is not inside a boilerplate
   container, its link density (chars under <a> / chars) is < 0.33, and it
   either is >= 25 chars long or ends with sentence punctuation.
4. Output = content blocks joined with ``"\\n"``.
"""

from __future__ import annotations

from html.parser import HTMLParser

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "article", "section", "main", "blockquote", "pre", "ul", "ol", "table",
    "tr", "body", "figcaption", "dd", "dt",
}
_BOILER_TAGS = {"nav", "header", "footer", "aside", "form"}
_SKIP_TAGS = {"script", "style", "noscript", "template"}
_SENTENCE_END = (".", "!", "?", "。", "！", "？", "…", '"', "”")

MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.33


class _BlockCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._text: list[str] = []
        self._link_chars = 0
        self._boiler_depth = 0
        self._skip_depth = 0
        self._link_depth = 0

    def _end_block(self) -> None:
        text = "".join(self._text).strip()
        if text:
            self.blocks.append(
                {"text": text, "link_chars": self._link_chars, "boiler": self._boiler_depth > 0}
            )
        self._text = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _BLOCK_TAGS:
            self._end_block()
        if tag in _BOILER_TAGS:
            self._end_block()
            self._boiler_depth += 1
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            self._end_block()
        if tag in _BOILER_TAGS:
            self._end_block()
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if data:
            self._text.append(data)
            if self._link_depth:
                self._link_chars += len(data)

    def close(self) -> None:
        super().close()
        self._end_block()


def extract_main_content(html: str) -> str:
    """Strip boilerplate; return content blocks joined by newlines."""
    collector = _BlockCollector()
    collector.feed(html)
    collector.close()

    kept: list[str] = []
    for block in collector.blocks:
        text = " ".join(block["text"].split())
        if not text or block["boiler"]:
            continue
        link_density = block["link_chars"] / max(1, len(block["text"]))
        if link_density >= MAX_LINK_DENSITY:
            continue
        if len(text) >= MIN_CONTENT_CHARS or text.endswith(_SENTENCE_END):
            kept.append(text)
    return "\n".join(kept)
