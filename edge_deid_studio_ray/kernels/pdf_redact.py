"""PDF redaction rebuild (S9) without PyMuPDF.

The reference redacts PDFs with fitz redact annotations
(/root/reference/src/deid_pipeline/handlers/pdf.py:44-159): collect one rect
per anchored entity (``search_for`` narrowing when possible, else the block
bbox), add black-fill redact annots, apply (which REMOVES the text under the
rect), save, and report the rect list.

This module reproduces that contract for the minipdf-parseable subset in
pure Python:

- :func:`plan_pdf_redactions` — entity list → rect plan, the exact payload
  shape the reference returns (``page_index, bbox, strategy``).  Without a
  glyph index the narrowing step is unavailable, so every rect uses the
  ``block_bbox`` strategy (PyMuPDF, when installed, slots into the same
  plan through ``fitz_extract_blocks`` bboxes).
- :func:`redact_pdf_bytes` — rebuild the document with (a) every occurrence
  of each redacted entity's text inside literal strings of the page content
  streams blanked to spaces (the text-removal half of ``apply_redactions``)
  and (b) a black rectangle fill op (``q 0 g x y w h re f Q``) appended per
  rect (the visual half).  Streams re-emit uncompressed with corrected
  /Length; the document is reassembled object-by-object WITHOUT an xref
  table — round-trips through :mod:`minipdf` (which scans objects, not
  xref), flagged ``rebuild_mode="redact_noxref"`` so callers know a
  viewer-grade writer needs a real PDF library.

Limitations (documented, not silent): needles split across multiple show
strings or encoded as hex strings are not blanked (the covering rect still
applies); encrypted/object-stream PDFs are rejected by minipdf upstream.
"""

from __future__ import annotations

import zlib
from typing import Any

from .minipdf import (
    _MEDIABOX_RE,
    _OBJ_RE,
    _STREAM_RE,
    DEFAULT_PAGE_HEIGHT,
    _page_objects,
    _scan_objects,
)


def plan_pdf_redactions(entities: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Anchored entities → redaction rect plan (handlers/pdf.py:70-131
    contract: one rect per entity with page_index + bbox; entities without
    anchors are skipped, as in the reference)."""
    rects: list[dict[str, Any]] = []
    for ent in entities:
        page_index = ent.get("page_index")
        bbox = ent.get("bbox")
        if page_index is None or bbox is None:
            continue
        rects.append(
            {
                "page_index": int(page_index),
                "bbox": (int(bbox[0]), int(bbox[1]), int(bbox[2]), int(bbox[3])),
                "strategy": "block_bbox",
                "text": str(ent.get("text") or ""),
            }
        )
    return rects


def _blank_literals(content: bytes, needles: list[bytes]) -> bytes:
    """Blank every occurrence of each needle inside ``(...)`` literal
    strings with same-length spaces (layout-preserving text removal)."""
    out = content
    for needle in needles:
        if not needle:
            continue
        out = out.replace(needle, b" " * len(needle))
    return out


def _rect_ops(rects: list[dict[str, Any]], page_height: float) -> bytes:
    """Black-fill ops for the visual half; bbox is top-left-origin ints, PDF
    drawing space is bottom-left-origin."""
    ops = []
    for rect in rects:
        left, top, right, bottom = rect["bbox"]
        width = max(right - left, 1)
        height = max(bottom - top, 1)
        y = page_height - top - height
        ops.append(b"q 0 g %d %d %d %d re f Q" % (left, int(y), width, height))
    return b"\n" + b"\n".join(ops) if ops else b""


def redact_pdf_bytes(raw: bytes, rects: list[dict[str, Any]]) -> dict[str, Any]:
    """Rebuild ``raw`` with the plan's text blanked + rects drawn.

    Returns ``{"pdf": bytes, "rebuild_supported": bool, "rebuild_mode",
    "redaction_count", "redaction_rects"}`` — the reference's rebuild dict
    shape (handlers/pdf.py:149-159) with the artifact inline instead of a
    path."""
    objects = _scan_objects(raw)
    pages = _page_objects(objects)
    if not pages:
        return {
            "pdf": raw,
            "rebuild_supported": False,
            "rebuild_mode": None,
            "redaction_count": 0,
            "redaction_rects": [],
        }

    by_page: dict[int, list[dict[str, Any]]] = {}
    for rect in rects:
        by_page.setdefault(int(rect["page_index"]), []).append(rect)

    replacements: dict[int, bytes] = {}
    for page_index, (content_num, page_body) in enumerate(pages):
        page_rects = by_page.get(page_index, [])
        if not page_rects:
            continue
        body = objects.get(content_num)
        if body is None:
            continue
        m = _STREAM_RE.search(body)
        if m is None:
            continue
        data = m.group(1)
        if b"/FlateDecode" in body[: m.start()]:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        needles = [
            r["text"].encode("latin-1", "replace") for r in page_rects if r.get("text")
        ]
        mb = _MEDIABOX_RE.search(page_body)
        page_height = float(mb.group(4)) if mb else DEFAULT_PAGE_HEIGHT
        new_stream = _blank_literals(data, needles) + _rect_ops(page_rects, page_height)
        replacements[content_num] = (
            b"<< /Length %d >> stream\n" % len(new_stream) + new_stream + b"\nendstream "
        )

    pieces = [b"%PDF-1.4\n"]
    for m in _OBJ_RE.finditer(raw):
        num = int(m.group(1))
        if num in replacements:
            pieces.append(b"%d 0 obj " % num + replacements[num] + b"endobj\n")
        else:
            pieces.append(m.group(0) + b"\n")
    pieces.append(b"%%EOF\n")
    plan_out = [
        {"page_index": r["page_index"], "bbox": tuple(r["bbox"]), "strategy": r["strategy"]}
        for r in rects
    ]
    return {
        "pdf": b"".join(pieces),
        "rebuild_supported": True,
        "rebuild_mode": "redact_noxref",
        "redaction_count": len(plan_out),
        "redaction_rects": plan_out,
    }


def redact_pdf_document(raw: bytes, entities: list[dict[str, Any]]) -> dict[str, Any]:
    """Entity list (process_document output shape) → redacted PDF rebuild."""
    return redact_pdf_bytes(raw, plan_pdf_redactions(entities))
