"""Format rebuild sinks (S9).

The parquet-native pipeline's primary "rebuild" is the ``clean_text`` column
itself plus the partitioned parquet sink.  For structured formats the
reference rewrites the original artifact cell-by-cell; the pure kernels here
reproduce that for the text and CSV handlers:

- :func:`rebuild_text` — the ``.deid.txt`` artifact body (text.py:43-52:
  just the output text);
- :func:`rebuild_csv` — cell-targeted replacement (csv.py:41-93): for each
  entity carrying a cell anchor, replace the first occurrence of the
  original value in that cell with ``replacement_map[f"{type}:{original}"]``.

DOCX/XLSX/PPTX rebuilds rewrite the raw XML inside the zip (below); PDF
redaction (rect plan + text blanking + fill ops) lives in
:mod:`.pdf_redact` for the minipdf-parseable subset; image black-box fill
still requires a raster library (absent here) and stays gated in
stages/image_deid.py.
"""

from __future__ import annotations

import csv
import io
from typing import Any

from .contracts import replacement_key


def rebuild_text(output_text: str) -> str:
    return output_text


def rebuild_csv(
    payload: str,
    entities: list[dict[str, Any]],
    replacement_map: dict[str, str],
) -> str:
    """Rewrite a CSV payload with per-cell targeted replacements.

    ``entities`` use the engine's Arrow shape (``cell_address`` like "R2C1"
    or a ``cell`` dict with row/col); rows/cols are 1-based.
    """
    rows = list(csv.reader(io.StringIO(payload, newline="")))

    for entity in entities:
        cell = entity.get("cell")
        if cell:
            row, col = int(cell.get("row", 0)), int(cell.get("col", 0))
        else:
            address = entity.get("cell_address")
            if not address or not address.startswith("R") or "C" not in address:
                continue
            row_s, col_s = address[1:].split("C", 1)
            try:
                row, col = int(row_s), int(col_s)
            except ValueError:
                continue
        if row <= 0 or col <= 0 or row > len(rows) or col > len(rows[row - 1]):
            continue

        original = entity.get("text")
        entity_type = entity.get("type")
        if not original or not entity_type:
            continue
        replacement = replacement_map.get(replacement_key(str(entity_type), str(original)))
        if replacement is None:
            continue
        current = str(rows[row - 1][col - 1] or "")
        rows[row - 1][col - 1] = current.replace(str(original), str(replacement), 1)

    out = io.StringIO()
    csv.writer(out).writerows(rows)
    return out.getvalue()


# ---------------------------------------------------------------------------
# OOXML rebuilds (zip rewrite, no office libraries)
# ---------------------------------------------------------------------------


def _replacement_pairs(
    entities: list[dict[str, Any]], replacement_map: dict[str, str]
) -> list[tuple[str, str]]:
    """(original, replacement) pairs resolvable through the map — the shared
    preamble of the reference docx/pptx rebuilds (docx.py:61-71)."""
    pairs: list[tuple[str, str]] = []
    for entity in entities:
        original = entity.get("text")
        entity_type = entity.get("type")
        if not original or not entity_type:
            continue
        repl = replacement_map.get(replacement_key(str(entity_type), str(original)))
        if repl is None:
            continue
        pairs.append((str(original), str(repl)))
    return pairs


def _rewrite_zip(raw: bytes, transform) -> bytes:
    """Rewrite selected members of an OOXML zip in memory."""
    import io
    import zipfile

    src = zipfile.ZipFile(io.BytesIO(raw))
    out_buf = io.BytesIO()
    with zipfile.ZipFile(out_buf, "w", zipfile.ZIP_DEFLATED) as dst:
        for info in src.infolist():
            data = src.read(info.filename)
            new = transform(info.filename, data)
            dst.writestr(info.filename, new if new is not None else data)
    return out_buf.getvalue()


def _replace_in_text_nodes(xml: bytes, tag: str, pairs: list[tuple[str, str]]) -> bytes:
    """Apply replacements inside <tag>…</tag> text nodes of an XML payload.

    Paragraph-level semantics caveat vs the reference: python-docx replaces
    over the *joined* paragraph text (collapsing run formatting on change,
    docx.py:73-79); values split across runs are rare for machine-inserted
    PII, so this per-node replace matches on the reference's own fixtures
    while preserving run formatting.
    """
    import re as _re

    pattern = _re.compile(
        (r"(<%s(?:\s[^>]*)?>)(.*?)(</%s>)" % (_re.escape(tag), _re.escape(tag))).encode(),
        _re.DOTALL,
    )

    def sub(match: "_re.Match[bytes]") -> bytes:
        text = match.group(2).decode("utf-8")
        for original, repl in pairs:
            text = text.replace(original, repl)
        return match.group(1) + text.encode("utf-8") + match.group(3)

    return pattern.sub(sub, xml)


def rebuild_docx(raw: bytes, entities: list[dict[str, Any]], replacement_map: dict[str, str]) -> bytes:
    """DOCX text replace in w:t runs (docx.py:34-96 semantics)."""
    pairs = _replacement_pairs(entities, replacement_map)
    if not pairs:
        return raw
    return _rewrite_zip(
        raw,
        lambda name, data: _replace_in_text_nodes(data, "w:t", pairs)
        if name == "word/document.xml"
        else None,
    )


def rebuild_pptx(raw: bytes, entities: list[dict[str, Any]], replacement_map: dict[str, str]) -> bytes:
    """PPTX shape-text replace in a:t runs (pptx.py:47-102 semantics)."""
    import re as _re

    pairs = _replacement_pairs(entities, replacement_map)
    if not pairs:
        return raw
    return _rewrite_zip(
        raw,
        lambda name, data: _replace_in_text_nodes(data, "a:t", pairs)
        if _re.fullmatch(r"ppt/slides/slide\d+\.xml", name)
        else None,
    )


def rebuild_xlsx(raw: bytes, entities: list[dict[str, Any]], replacement_map: dict[str, str]) -> bytes:
    """XLSX cell-targeted replace (xlsx.py:53-113 semantics): only cells an
    entity is anchored to change; shared strings referenced by other cells
    stay intact by rewriting the target cell to an inline string."""
    import io
    import re as _re
    import zipfile
    from xml.sax.saxutils import escape

    from .ooxml import S_NS, _cell_value_str
    from xml.etree import ElementTree

    # per (address) replacement list; sheet scoping: single-sheet payloads
    # cover the engine's extraction fixtures — multi-sheet needs sheet names
    by_address: dict[str, list[tuple[str, str]]] = {}
    for entity in entities:
        address = entity.get("cell_address") or (entity.get("cell") or {}).get("address")
        original, entity_type = entity.get("text"), entity.get("type")
        if not address or not original or not entity_type:
            continue
        repl = replacement_map.get(replacement_key(str(entity_type), str(original)))
        if repl is None:
            continue
        by_address.setdefault(str(address), []).append((str(original), str(repl)))
    if not by_address:
        return raw

    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sroot = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sroot.iter(f"{S_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{S_NS}t")))

    cell_re = _re.compile(rb"<c [^>]*r='(?P<ref>[A-Z]+\d+)'[^>]*>.*?</c>|<c [^>]*r=\"(?P<ref2>[A-Z]+\d+)\"[^>]*>.*?</c>", _re.DOTALL)

    def rewrite_sheet(data: bytes) -> bytes:
        def sub(match: "_re.Match[bytes]") -> bytes:
            ref = (match.group("ref") or match.group("ref2")).decode()
            if ref not in by_address:
                return match.group(0)
            try:
                cell_el = ElementTree.fromstring(
                    match.group(0)
                    .replace(b"<c ", b"<c xmlns='http://schemas.openxmlformats.org/spreadsheetml/2006/main' ", 1)
                )
            except ElementTree.ParseError:
                # e.g. a self-closing cell dragged into the non-greedy span
                return match.group(0)
            value = _cell_value_str(cell_el, shared)
            if value is None:
                return match.group(0)
            for original, repl in by_address[ref]:
                value = value.replace(original, repl, 1)
            escaped = escape(value)
            return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escaped}</t></is></c>'.encode()

        return cell_re.sub(sub, data)

    return _rewrite_zip(
        raw,
        lambda name, data: rewrite_sheet(data)
        if _re.fullmatch(r"xl/worksheets/sheet\d+\.xml", name)
        else None,
    )


# ---------------------------------------------------------------------------
# Route dispatcher
# ---------------------------------------------------------------------------


def rebuild_artifact(
    route: str,
    raw: bytes | None,
    *,
    output_text: str,
    entities: list[dict[str, Any]],
    replacement_map: dict[str, str],
) -> dict[str, Any]:
    """One entry point per processed row: route → format rebuild, the
    HandlerRegistry-``rebuild`` analogue (each reference handler exposes
    ``rebuild(document, output_text=..., entities=..., replacement_map=...)``;
    registry in handlers/registry.py).

    Returns ``{"artifact": bytes|str|None, "kind", "rebuild_supported"}``
    plus the redaction fields for the pdf route.  Unknown / text-like
    routes return the output text itself (text.py:43-52 semantics).
    """
    if route == "csv":
        return {
            "artifact": rebuild_csv(
                (raw or b"").decode("utf-8", "replace"), entities, replacement_map
            ),
            "kind": "csv",
            "rebuild_supported": True,
        }
    if route == "pdf":
        from .pdf_redact import redact_pdf_document

        result = redact_pdf_document(raw or b"", entities)
        return {
            "artifact": result["pdf"],
            "kind": "pdf",
            "rebuild_supported": result["rebuild_supported"],
            "rebuild_mode": result["rebuild_mode"],
            "redaction_count": result["redaction_count"],
            "redaction_rects": result["redaction_rects"],
        }
    if route in ("docx", "pptx", "xlsx"):
        fn = {"docx": rebuild_docx, "pptx": rebuild_pptx, "xlsx": rebuild_xlsx}[route]
        return {
            "artifact": fn(raw or b"", entities, replacement_map),
            "kind": route,
            "rebuild_supported": True,
        }
    return {
        "artifact": rebuild_text(output_text),
        "kind": "text",
        "rebuild_supported": True,
    }
