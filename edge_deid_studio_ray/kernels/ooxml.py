"""Dependency-free OOXML (docx/xlsx/pptx) extraction on stdlib zipfile+XML.

The reference extracts these formats via python-docx / openpyxl / python-pptx
(handlers/docx.py:13-32, xlsx.py:13-51, pptx.py:13-45).  Those libraries are
not available here, but OOXML is just zipped XML, so these kernels parse the
same structures directly with ``zipfile`` + ``xml.etree``:

- docx → one segment per paragraph (``w:p``; text = concatenated ``w:t``
  runs, tabs/breaks as in python-docx ``paragraph.text``), "\\n" join;
- xlsx → one segment per non-empty cell in sheet order with
  ``cell={sheet,address,row,col}`` (shared strings + inline strings
  resolved; numeric cells stringified with int-preserving formatting,
  matching openpyxl ``str(cell.value)``);
- pptx → one segment per shape text frame per slide (``p:sp``//``a:t``,
  paragraphs joined with "\\n", stripped, empties skipped), "\\n" join.

All take raw ``bytes`` (the pages-table ``html`` payload column) and return
segment-spec lists for build_text_from_segments — identical downstream
plumbing to the other routes.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Any
from xml.etree import ElementTree

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
S_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
P_NS = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
PR_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

DOCX_MAGIC = b"PK\x03\x04"


def looks_like_zip(raw: bytes) -> bool:
    return raw.startswith(DOCX_MAGIC)


def ooxml_kind(raw: bytes) -> str | None:
    """Sniff which OOXML family a zip payload belongs to (None if not OOXML)."""
    if not looks_like_zip(raw):
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(raw)) as zf:
            names = set(zf.namelist())
    except zipfile.BadZipFile:
        return None
    if "word/document.xml" in names:
        return "docx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    if "ppt/presentation.xml" in names:
        return "pptx"
    return None


def _paragraph_text(par: ElementTree.Element) -> str:
    """python-docx ``paragraph.text`` semantics: w:t text, w:tab → "\\t",
    w:br / w:cr → "\\n", in document order."""
    parts: list[str] = []
    for node in par.iter():
        if node.tag == f"{W_NS}t":
            parts.append(node.text or "")
        elif node.tag == f"{W_NS}tab":
            parts.append("\t")
        elif node.tag in (f"{W_NS}br", f"{W_NS}cr"):
            parts.append("\n")
    return "".join(parts)


def docx_to_segments(raw: bytes) -> list[dict[str, Any]]:
    """One segment per body paragraph (docx.py:22-24 semantics — empty
    paragraphs kept as empty segments)."""
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        root = ElementTree.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{W_NS}body")
    if body is None:
        return [{"text": ""}]
    segments = [
        {"text": _paragraph_text(par), "metadata": {"kind": "paragraph"}}
        for par in body.iter(f"{W_NS}p")
    ]
    return segments or [{"text": ""}]


_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_to_index(letters: str) -> int:
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx


def _cell_value_str(cell: ElementTree.Element, shared: list[str]) -> str | None:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        t = cell.find(f"{S_NS}is/{S_NS}t")
        return t.text or "" if t is not None else None
    v = cell.find(f"{S_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        try:
            return shared[int(v.text)]
        except (ValueError, IndexError):
            return None
    if ctype in ("str", "e"):
        return v.text
    if ctype == "b":
        return "True" if v.text == "1" else "False"
    # numeric: openpyxl returns int when integral → str() without ".0"
    try:
        num = float(v.text)
        if num.is_integer() and "e" not in v.text.lower() and "." not in v.text:
            return str(int(num))
        return str(int(num)) if num.is_integer() else str(num)
    except ValueError:
        return v.text


def xlsx_to_segments(raw: bytes) -> list[dict[str, Any]]:
    """One segment per non-empty cell with sheet/address/row/col refs
    (xlsx.py:22-40 semantics)."""
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        names = set(zf.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sroot = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sroot.iter(f"{S_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{S_NS}t")))

        # workbook sheet order + relationship targets
        wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
        rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            rel.get("Id"): rel.get("Target") for rel in rels.iter(f"{PR_NS}Relationship")
        }
        segments: list[dict[str, Any]] = []
        for sheet in wb.iter(f"{S_NS}sheet"):
            sheet_name = sheet.get("name", "")
            target = rel_target.get(sheet.get(f"{R_NS}id"), "")
            path = "xl/" + target.lstrip("/") if not target.startswith("xl/") else target
            if path not in names:
                continue
            sheet_root = ElementTree.fromstring(zf.read(path))
            for cell in sheet_root.iter(f"{S_NS}c"):
                ref = cell.get("r", "")
                match = _CELL_REF_RE.fullmatch(ref)
                if not match:
                    continue
                value = _cell_value_str(cell, shared)
                if value is None or value == "":
                    continue
                segments.append(
                    {
                        "text": value,
                        "cell": {
                            "sheet": sheet_name,
                            "address": ref,
                            "row": int(match.group(2)),
                            "col": _col_to_index(match.group(1)),
                        },
                    }
                )
    return segments or [{"text": ""}]


def pptx_to_segments(raw: bytes) -> list[dict[str, Any]]:
    """One segment per shape with text (pptx.py:22-37 semantics: shape.text =
    paragraphs joined by "\\n", stripped, empty shapes skipped)."""
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        slide_names = sorted(
            (n for n in zf.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
        segments: list[dict[str, Any]] = []
        for slide_idx, name in enumerate(slide_names):
            root = ElementTree.fromstring(zf.read(name))
            for shape in root.iter(f"{P_NS}sp"):
                paragraphs = []
                for par in shape.iter(f"{A_NS}p"):
                    paragraphs.append("".join(t.text or "" for t in par.iter(f"{A_NS}t")))
                text = "\n".join(paragraphs).strip()
                if not text:
                    continue
                segments.append(
                    {"text": text, "metadata": {"kind": "shape_text", "slide_index": slide_idx}}
                )
    return segments or [{"text": ""}]


def ooxml_to_segments(raw: bytes) -> tuple[list[dict[str, Any]], str] | None:
    """Dispatch by sniffed kind; returns (segments, route) or None."""
    kind = ooxml_kind(raw)
    if kind == "docx":
        return docx_to_segments(raw), "docx"
    if kind == "xlsx":
        return xlsx_to_segments(raw), "xlsx"
    if kind == "pptx":
        return pptx_to_segments(raw), "pptx"
    return None
