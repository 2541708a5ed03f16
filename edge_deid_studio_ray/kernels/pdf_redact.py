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
  of each redacted entity's text blanked to spaces INSIDE ``(...)`` literal
  strings of the page content streams only (operator operands — Td/Tm
  coordinates, font sizes — can never match, unlike a raw byte replace)
  and (b) a black rectangle fill op (``q 0 g x y w h re f Q``) appended per
  rect (the visual half).  Streams re-emit uncompressed with corrected
  /Length; the document is reassembled object-by-object WITH a standard
  xref table + trailer (/Size /Root + startxref), so strict viewers that
  seek via xref accept the artifact.
- **Verified removal**: the rebuilt PDF is re-parsed with minipdf and each
  rect's needle checked against the re-extracted text.  Every rect carries
  a ``blanked`` flag; if any needle survives (hex-encoded shows, needles
  split across show strings) the result says so via ``verified=False`` +
  a ``warning`` — never a silent "redacted" artifact that still leaks.

RC4-encrypted inputs are DECRYPTED and rewritten as plain documents:
every stream re-emits decrypted (the rewritten trailer carries no
/Encrypt), so blanking and the verified-removal re-parse operate on real
text — ciphertext is never left in an artifact the trailer claims is
unencrypted.  AES inputs return ``rebuild_supported=False`` with
``warning="unsupported_encryption"``.

Limitations (documented, not silent): needles split across multiple show
strings are not blanked, and hex-string blanking requires a reverse
ToUnicode mapping (``_blank_hex_strings``, glyph-code-boundary-aligned
matches only) — in both miss cases the covering rect still applies and
``verified``/``blanked`` report the miss.
"""

from __future__ import annotations

import re
from typing import Any

from .minipdf import (
    _MEDIABOX_RE,
    DEFAULT_PAGE_HEIGHT,
    _decode_stream,
    _load_document,
    _page_fonts,
    _page_objects,
    _raw_stream_span,
    _scan_object_spans,
    minipdf_parse,
)

_CATALOG_RE = re.compile(rb"/Type\s*/Catalog\b")


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


def _string_spans(content: bytes) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """(literal spans, hex spans): byte spans of the INSIDE of every
    ``(...)`` literal (escape-aware, nesting-aware) and every ``<...>`` hex
    string (dicts ``<<`` excluded).  Operator operands are never part of a
    span."""
    lits: list[tuple[int, int]] = []
    hexes: list[tuple[int, int]] = []
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # (
            start = i + 1
            depth = 1
            i += 1
            while i < n and depth:
                b = content[i]
                if b == 0x5C:  # backslash: skip escaped byte
                    i += 2
                    continue
                if b == 0x28:
                    depth += 1
                elif b == 0x29:
                    depth -= 1
                i += 1
            lits.append((start, i - 1 if depth == 0 else i))
        elif c == 0x3C and content[i : i + 2] != b"<<":  # <hex>
            end = content.find(b">", i)
            if end == -1:
                end = n
            hexes.append((i + 1, end))
            i = end + 1
        elif c == 0x3C:  # << dict
            i += 2
        else:
            i += 1
    return lits, hexes


def _literal_spans(content: bytes) -> list[tuple[int, int]]:
    return _string_spans(content)[0]


def _blank_hex_strings(
    content: bytes,
    needles: list[str],
    fonts: dict[bytes, tuple[dict[int, str], int]],
) -> bytes:
    """Blank needles shown as CID hex strings: each page font's ToUnicode
    CMap is reversed (unicode → code), the needle re-encoded to its code
    hex, and matches inside ``<...>`` hex-string spans overwritten with
    zero codes (.notdef) of identical length — layout-preserving removal
    for CJK/Type0 content that literal-string blanking cannot reach.
    Needles whose characters lack a reverse mapping are left for the
    verified-removal report to flag."""
    if not fonts or not needles:
        return content
    encodings: list[bytes] = []
    for _name, (cmap, width) in fonts.items():
        rev: dict[str, int] = {}
        for code, string in cmap.items():
            rev.setdefault(string, code)
        for needle in needles:
            if not needle:
                continue
            codes = [rev.get(ch) for ch in needle]
            if all(c is not None for c in codes):
                encodings.append(
                    (
                        b"".join(b"%0*X" % (2 * width, c) for c in codes),  # type: ignore[misc]
                        width,
                    )
                )
    if not encodings:
        return content
    out = bytearray(content)
    _lits, hexes = _string_spans(content)
    for start, end in hexes:
        for enc, width in encodings:
            # only accept matches on glyph-code boundaries (multiples of
            # 2·width hex digits): an offset match straddling two codes
            # would blank glyphs the needle never contained
            code_hex = 2 * width
            upper = bytes(out[start:end]).upper()
            pos = upper.find(enc)
            while pos != -1:
                if pos % code_hex == 0:
                    out[start + pos : start + pos + len(enc)] = b"0" * len(enc)
                    upper = bytes(out[start:end]).upper()
                    pos = upper.find(enc, pos + len(enc))
                else:
                    pos = upper.find(enc, pos + 1)
    return bytes(out)


def _blank_literals(content: bytes, needles: list[bytes]) -> bytes:
    """Blank every occurrence of each needle with same-length spaces, only
    inside literal-string spans (layout-preserving text removal that cannot
    corrupt operator operands).  The post-rebuild re-parse is the source of
    truth for whether a needle is gone — no per-call hit tracking here."""
    needles = [nd for nd in needles if nd]
    if not needles:
        return content
    out = bytearray(content)
    for start, end in _literal_spans(content):
        segment = content[start:end]
        changed = False
        for needle in needles:
            if needle in segment:
                segment = segment.replace(needle, b" " * len(needle))
                changed = True
        if changed:
            out[start:end] = segment
    return bytes(out)


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


def _assemble_with_xref(raw: bytes, replacements: dict[int, bytes], objects: dict[int, bytes]) -> bytes:
    """Reassemble the document object-by-object and append a standard xref
    table + trailer: offsets are tracked at write time, /Root points at the
    catalog, startxref at the table — the artifact satisfies offset-seeking
    viewers, not just sequential scanners."""
    header = b"%PDF-1.4\n"
    pieces: list[bytes] = [header]
    offsets: dict[int, int] = {}
    pos = len(header)
    for num, hstart, _bstart, end in _scan_object_spans(raw):
        if num in replacements:
            chunk = b"%d 0 obj " % num + replacements[num] + b"endobj\n"
        else:
            chunk = raw[hstart:end] + b"\n"
        if num not in offsets:
            offsets[num] = pos
        pos += len(chunk)
        pieces.append(chunk)
    max_num = max(offsets) if offsets else 0
    root_num = next(
        (num for num, body in objects.items() if _CATALOG_RE.search(body)), 1
    )
    entries = [b"0000000000 65535 f \n"]
    for num in range(1, max_num + 1):
        if num in offsets:
            entries.append(b"%010d 00000 n \n" % offsets[num])
        else:
            entries.append(b"0000000000 65535 f \n")
    xref_pos = pos
    pieces.append(
        b"xref\n0 %d\n" % (max_num + 1)
        + b"".join(entries)
        + b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_num + 1, root_num, xref_pos)
    )
    return b"".join(pieces)


def redact_pdf_bytes(raw: bytes, rects: list[dict[str, Any]]) -> dict[str, Any]:
    """Rebuild ``raw`` with the plan's text blanked + rects drawn.

    Returns ``{"pdf": bytes, "rebuild_supported": bool, "rebuild_mode",
    "redaction_count", "redaction_rects", "verified", "warning"}`` — the
    reference's rebuild dict shape (handlers/pdf.py:149-159) with the
    artifact inline instead of a path, plus the verified-removal report:
    each rect carries ``blanked`` (its text no longer extractable from the
    rebuilt PDF), ``verified`` is the conjunction, and ``warning`` names the
    failure mode when any needle survives.

    RC4-encrypted inputs are DECRYPTED and rewritten as a plain document:
    every stream re-emits decrypted (the fresh trailer carries no /Encrypt),
    so blanking and the verified-removal re-parse operate on real text —
    never on ciphertext that a decrypting reader could still recover."""
    objects, decrypt_factory = _load_document(raw)
    if decrypt_factory == "unsupported":
        return {
            "pdf": raw,
            "rebuild_supported": False,
            "rebuild_mode": None,
            "redaction_count": 0,
            "redaction_rects": [],
            "verified": False,
            "warning": "unsupported_encryption",
        }
    pages = _page_objects(objects)
    if not pages:
        return {
            "pdf": raw,
            "rebuild_supported": False,
            "rebuild_mode": None,
            "redaction_count": 0,
            "redaction_rects": [],
            "verified": False,
            "warning": "no_parseable_pages",
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
        data = _decode_stream(
            body, decrypt=decrypt_factory(content_num) if decrypt_factory else None
        )
        if data is None:
            continue
        needles = [
            r["text"].encode("latin-1", "replace") for r in page_rects if r.get("text")
        ]
        mb = _MEDIABOX_RE.search(page_body)
        page_height = float(mb.group(4)) if mb else DEFAULT_PAGE_HEIGHT
        blanked_data = _blank_literals(data, needles)
        blanked_data = _blank_hex_strings(
            blanked_data,
            [r["text"] for r in page_rects if r.get("text")],
            _page_fonts(page_body, objects, decrypt_factory),
        )
        new_stream = blanked_data + _rect_ops(page_rects, page_height)
        replacements[content_num] = (
            b"<< /Length %d >> stream\n" % len(new_stream) + new_stream + b"\nendstream "
        )

    if decrypt_factory is not None:
        # decrypt-rewrite every remaining stream object: the output trailer
        # has no /Encrypt, so ciphertext left in place would be garbage to
        # readers AND an un-auditable leak to anyone holding the key
        for num, _hstart, body_start, end in _scan_object_spans(raw):
            if num in replacements:
                continue
            body = raw[body_start:end]
            if body.endswith(b"endobj"):
                body = body[: -len(b"endobj")]
            span = _raw_stream_span(body)
            if span is None:
                continue
            dec = decrypt_factory(num)(body[span[0] : span[1]])
            if dec is None:
                continue
            head = body[: span[0]]
            # AES plaintext is shorter than the IV+padded ciphertext: keep
            # /Length honest so readers can slice the stream directly
            head = re.sub(
                rb"/Length\s+\d+(?!\d)(?!\s+\d+\s+R)",
                b"/Length %d" % len(dec),
                head,
                count=1,
            )
            replacements[num] = head + dec + body[span[1] :]

    out_pdf = _assemble_with_xref(raw, replacements, objects)

    # verified removal: re-extract the rebuilt PDF and check each needle is
    # gone from its page's text (ADVICE: never report a clean redaction when
    # hex-encoded or split show strings kept the bytes extractable)
    respecs, _ = minipdf_parse(out_pdf)
    page_text: dict[int, str] = {}
    for spec in respecs:
        page_text[spec["page_index"]] = (
            page_text.get(spec["page_index"], "") + "\n" + spec["text"]
        )
    plan_out = []
    all_blanked = True
    unverifiable = False
    for r in rects:
        needle = r.get("text") or ""
        idx = int(r["page_index"])
        if idx not in page_text:
            # the rect's page is invisible to the re-parse (array-form
            # /Contents, exotic layout, undecodable rebuilt stream): removal
            # CANNOT be verified — "no text extracted" must never read as
            # "needle removed", or unredacted PII ships as verified
            survives = bool(needle)
            unverifiable = unverifiable or bool(needle)
        else:
            survives = bool(needle) and needle in page_text[idx]
        all_blanked &= not survives
        plan_out.append(
            {
                "page_index": r["page_index"],
                "bbox": tuple(r["bbox"]),
                "strategy": r["strategy"],
                "blanked": not survives,
            }
        )
    warning = None
    if not all_blanked:
        warning = "page_unverifiable" if unverifiable else "needle_survives_extraction"
    return {
        "pdf": out_pdf,
        "rebuild_supported": True,
        "rebuild_mode": "redact",
        "redaction_count": len(plan_out),
        "redaction_rects": plan_out,
        "verified": all_blanked,
        "warning": warning,
    }


def redact_pdf_document(raw: bytes, entities: list[dict[str, Any]]) -> dict[str, Any]:
    """Entity list (process_document output shape) → redacted PDF rebuild."""
    return redact_pdf_bytes(raw, plan_pdf_redactions(entities))
