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


def html_to_text(html: str, separator: str = "\n") -> str:
    """Extract all text nodes of an HTML document joined by ``separator``."""
    collector = _TextCollector()
    collector.feed(html)
    collector.close()
    return separator.join(collector.strings)


def decode_html_bytes(raw: bytes) -> str:
    """Decode page bytes as UTF-8 with ``errors="replace"`` (text.py:15,22)."""
    return raw.decode("utf-8", errors="replace")
