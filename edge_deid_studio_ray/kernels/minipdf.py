"""Minimal pure-Python parser for real ``%PDF-`` payloads.

The reference extracts PDFs with PyMuPDF ``page.get_text("blocks",
sort=True)`` (/root/reference/src/deid_pipeline/parser/handlers/pdf.py and
parser/text_extractor.py:110-185).  PyMuPDF is a C extension and absent from
this environment, so this module implements the subset needed for simple
machine-generated PDFs from first principles (PDF 32000-1 spec, public):

- object scan (``N 0 obj … endobj``), page-tree discovery (``/Type /Page``
  with ``/Contents N 0 R``), MediaBox page height;
- content streams, raw or ``/FlateDecode`` (zlib is stdlib);
- text operators inside BT…ET: ``Tm Td TD T* Tj TJ ' "`` with literal
  ``(…)`` strings (escapes, nested parens, octal) and ``<hex>`` strings;
- block semantics mirroring the reference's use of PyMuPDF: one block per
  BT…ET group, lines joined with ``"\\n"``, blocks sorted in reading order
  (page, top, left) with the y axis flipped to top-left origin using the
  page's MediaBox height.

Object streams (``/Type /ObjStm``, PDF 1.5+) are unpacked: member dict
objects (catalogs, page trees) inflate into the object table, so
modern-layout PDFs whose page dicts live in compressed object streams
still parse (content streams are never inside ObjStm, per spec).

Out of scope (flagged upstream as ``pdf_backend_unavailable`` when nothing
is extractable): encrypted PDFs, CID/Type0 composite fonts with non-trivial
ToUnicode CMaps, xref-stream predictors.  Glyph bytes are decoded as
latin-1 — correct for the ASCII/WinAnsi simple-font PDFs this targets.
"""

from __future__ import annotations

import re
import zlib
from typing import Any

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_KID_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

DEFAULT_PAGE_HEIGHT = 792.0  # US Letter, when no MediaBox is present


_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _scan_objects(raw: bytes) -> dict[int, bytes]:
    objects = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(raw)}
    # PDF 1.5+ object streams (/Type /ObjStm): compressed member objects —
    # header is N (objnum, offset) integer pairs, bodies start at /First
    for body in list(objects.values()):
        if not re.search(rb"/Type\s*/ObjStm\b", body):
            continue
        data = _decode_stream(body)
        nm, fm = _OBJSTM_N_RE.search(body), _OBJSTM_FIRST_RE.search(body)
        if data is None or nm is None or fm is None:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        header_ints = [int(x) for x in re.findall(rb"\d+", data[:first])][: 2 * n]
        pairs = list(zip(header_ints[0::2], header_ints[1::2]))
        for i, (objnum, offset) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(data) - first
            member = data[first + offset : first + end]
            objects.setdefault(objnum, member)
    return objects


def _decode_stream(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    data = m.group(1)
    if b"/FlateDecode" in body[: m.start()]:
        try:
            return zlib.decompress(data)
        except zlib.error:
            return None
    return data


def _page_objects(objects: dict[int, bytes]) -> list[tuple[int, bytes]]:
    """(content-object-number, page-dict) per page, in page-tree order when a
    /Kids array exists, else document order of /Type /Page objects."""
    pages: dict[int, bytes] = {
        num: body
        for num, body in objects.items()
        if re.search(rb"/Type\s*/Page\b(?!s)", body)
    }
    ordered_nums: list[int] = []
    for body in objects.values():
        if b"/Type" in body and b"/Pages" in body:
            km = _KIDS_RE.search(body)
            if km:
                ordered_nums = [int(r.group(1)) for r in _KID_REF_RE.finditer(km.group(1))]
                break
    if not ordered_nums:
        ordered_nums = sorted(pages)
    out: list[tuple[int, bytes]] = []
    for num in ordered_nums:
        body = pages.get(num)
        if body is None:
            continue
        cm = _CONTENTS_RE.search(body)
        if cm:
            out.append((int(cm.group(1)), body))
    return out


_ESCAPES = {
    b"n"[0]: "\n",
    b"r"[0]: "\r",
    b"t"[0]: "\t",
    b"b"[0]: "\b",
    b"f"[0]: "\f",
    b"("[0]: "(",
    b")"[0]: ")",
    b"\\"[0]: "\\",
}


def _parse_literal_string(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(…)`` literal starting at the '('; returns (text, next_i)."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # octal \ddd (1-3 digits)
                digits = bytearray([e])
                i += 1
                while i < n and len(digits) < 3 and 0x30 <= data[i] <= 0x37:
                    digits.append(data[i])
                    i += 1
                out.append(chr(int(digits.decode(), 8) & 0xFF))
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(chr(c))
        i += 1
    return "".join(out), i


def _parse_hex_string(data: bytes, i: int) -> tuple[str, int]:
    end = data.find(b">", i)
    if end < 0:
        end = len(data)
    hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : end])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    return bytes.fromhex(hexdigits.decode()).decode("latin-1"), end + 1


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _extract_text_blocks(content: bytes, page_height: float) -> list[dict[str, Any]]:
    """BT…ET groups → block dicts {text, top, left} (top-left origin)."""
    blocks: list[dict[str, Any]] = []
    i, n = 0, len(content)
    in_text = False
    # text state (only the translation components matter for line layout)
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 12.0
    stack: list[float] = []
    lines: list[tuple[float, float, list[str]]] = []  # (y, x, parts)
    cur: list[str] | None = None

    def start_line() -> None:
        nonlocal cur
        cur = []
        lines.append((y, x, cur))

    while i < n:
        c = content[i : i + 1]
        if c in b" \t\r\n":
            i += 1
            continue
        if c == b"(":
            text, i = _parse_literal_string(content, i)
            if in_text:
                if cur is None:
                    start_line()
                stack.append(float("nan"))
                cur.append(text)  # type: ignore[union-attr]
            continue
        if c == b"<" and content[i : i + 2] != b"<<":
            text, i = _parse_hex_string(content, i)
            if in_text:
                if cur is None:
                    start_line()
                stack.append(float("nan"))
                cur.append(text)  # type: ignore[union-attr]
            continue
        if c == b"<":  # dict
            i += 2
            continue
        if c == b"[" or c == b"]":
            i += 1
            continue
        m = _NUM_RE.match(content, i)
        if m and not _OP_RE.match(content, i):
            stack.append(float(m.group(0)))
            i = m.end()
            continue
        m = _OP_RE.match(content, i)
        if not m:
            i += 1
            continue
        op = m.group(0)
        i = m.end()
        nums = [v for v in stack if v == v]  # drop string markers (NaN)
        if op == b"BT":
            in_text = True
            x = y = line_x = line_y = 0.0
            lines = []
            cur = None
        elif op == b"ET":
            if lines:
                parts = [
                    (ly, lx, "".join(p)) for ly, lx, p in lines if "".join(p).strip()
                ]
                if parts:
                    top = page_height - max(p[0] for p in parts)
                    left = min(p[1] for p in parts)
                    # top-to-bottom within the block = descending PDF y
                    parts.sort(key=lambda p: (-p[0], p[1]))
                    blocks.append(
                        {
                            "text": "\n".join(p[2] for p in parts),
                            "top": top,
                            "left": left,
                        }
                    )
            in_text = False
            cur = None
        elif op == b"Tm" and len(nums) >= 6:
            x = line_x = nums[-2]
            y = line_y = nums[-1]
            cur = None
        elif op in (b"Td", b"TD") and len(nums) >= 2:
            line_x += nums[-2]
            line_y += nums[-1]
            x, y = line_x, line_y
            if op == b"TD":
                leading = -nums[-1] or leading
            cur = None
        elif op == b"T*":
            line_y -= leading
            x, y = line_x, line_y
            cur = None
        elif op == b"TL" and nums:
            leading = nums[-1]
        elif op in (b"Tj", b"TJ"):
            pass  # the string(s) were appended to the current line already
        elif op in (b"'", b'"'):
            # show-on-next-line: the string was appended to the PREVIOUS
            # line by the string handler; move it to a fresh line
            if in_text and cur:
                moved = cur.pop()
                line_y -= leading
                x, y = line_x, line_y
                start_line()
                cur.append(moved)  # type: ignore[union-attr]
        stack = []
    return blocks


def minipdf_parse(raw: bytes) -> tuple[list[dict[str, Any]], int]:
    """Parse a real PDF; returns (block specs, num_pages).

    Specs follow the reference block contract: ``{"text", "page_index",
    "bbox"}``, stripped, empties dropped, sorted (page, top, left) — the
    ``sort=True`` reading order.  num_pages counts pages found in the page
    tree even if they yielded no text (the OCR-fallback set).
    """
    objects = _scan_objects(raw)
    pages = _page_objects(objects)
    specs: list[tuple[int, float, float, dict[str, Any]]] = []
    for page_index, (content_num, page_body) in enumerate(pages):
        body = objects.get(content_num)
        if body is None:
            continue
        content = _decode_stream(body)
        if content is None:
            continue
        mb = _MEDIABOX_RE.search(page_body)
        page_height = float(mb.group(4)) if mb else DEFAULT_PAGE_HEIGHT
        for block in _extract_text_blocks(content, page_height):
            text = str(block["text"]).strip()
            if not text:
                continue
            specs.append(
                (
                    page_index,
                    block["top"],
                    block["left"],
                    {
                        "text": text,
                        "page_index": page_index,
                        "bbox": (
                            int(block["left"]),
                            int(block["top"]),
                            int(block["left"]) + 1,
                            int(block["top"]) + 1,
                        ),
                    },
                )
            )
    specs.sort(key=lambda s: (s[0], s[1], s[2]))
    return [s[3] for s in specs], len(pages)
