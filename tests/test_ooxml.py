"""OOXML (docx/xlsx/pptx) extraction tests — fixtures are minimal OOXML zips
built with stdlib zipfile (no office libraries in the environment)."""

from __future__ import annotations

import io
import zipfile

import pytest

from edge_deid_studio_ray.kernels.docpipe import extract_page, process_document
from edge_deid_studio_ray.kernels.ooxml import (
    docx_to_segments,
    ooxml_kind,
    pptx_to_segments,
    xlsx_to_segments,
)

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
S = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
SR = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
A = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
P = 'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"'


def make_docx(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t xml:space='preserve'>{p}</w:t></w:r></w:p>" for p in paragraphs
    )
    doc = f"<?xml version='1.0'?><w:document {W}><w:body>{body}</w:body></w:document>"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def make_xlsx(cells: dict[str, str]) -> bytes:
    """cells: address → shared-string value, all on Sheet1."""
    values = list(cells.values())
    sst = "".join(f"<si><t>{v}</t></si>" for v in values)
    rows: dict[str, list[str]] = {}
    for addr, value in cells.items():
        row_num = "".join(ch for ch in addr if ch.isdigit())
        rows.setdefault(row_num, []).append(
            f"<c r='{addr}' t='s'><v>{values.index(value)}</v></c>"
        )
    sheet_rows = "".join(
        f"<row r='{rn}'>{''.join(cs)}</row>" for rn, cs in sorted(rows.items(), key=lambda x: int(x[0]))
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr(
            "xl/workbook.xml",
            f"<?xml version='1.0'?><workbook {S} {SR}><sheets>"
            "<sheet name='Sheet1' sheetId='1' r:id='rId1'/></sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            "<?xml version='1.0'?><Relationships xmlns='http://schemas.openxmlformats.org/package/2006/relationships'>"
            "<Relationship Id='rId1' Type='x' Target='worksheets/sheet1.xml'/></Relationships>",
        )
        zf.writestr("xl/sharedStrings.xml", f"<?xml version='1.0'?><sst {S}>{sst}</sst>")
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f"<?xml version='1.0'?><worksheet {S}><sheetData>{sheet_rows}</sheetData></worksheet>",
        )
    return buf.getvalue()


def make_pptx(slides: list[list[str]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("ppt/presentation.xml", f"<?xml version='1.0'?><p:presentation {P}/>")
        for idx, shapes in enumerate(slides, start=1):
            body = "".join(
                f"<p:sp><p:txBody><a:p><a:r><a:t>{text}</a:t></a:r></a:p></p:txBody></p:sp>"
                for text in shapes
            )
            zf.writestr(
                f"ppt/slides/slide{idx}.xml",
                f"<?xml version='1.0'?><p:sld {P} {A}><p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>",
            )
    return buf.getvalue()


class TestSniffing:
    def test_kinds(self):
        assert ooxml_kind(make_docx(["x"])) == "docx"
        assert ooxml_kind(make_xlsx({"A1": "x"})) == "xlsx"
        assert ooxml_kind(make_pptx([["x"]])) == "pptx"
        assert ooxml_kind(b"not a zip") is None


class TestDocx:
    def test_paragraph_segments_newline_join(self):
        raw = make_docx(["first paragraph", "", "third with id A123456789"])
        segments = docx_to_segments(raw)
        assert [s["text"] for s in segments] == [
            "first paragraph",
            "",
            "third with id A123456789",
        ]
        text, _, route, err = extract_page(raw, None)
        assert route == "docx" and err is None
        assert text == "first paragraph\n\nthird with id A123456789"

    def test_deid_over_docx(self):
        raw = make_docx(["id A123456789 end"])
        row = process_document(html=raw, lang="zh")
        assert row["route"] == "docx"
        assert "A123456789" not in row["clean_text"]
        assert row["entities"][0]["type"] == "ID"


class TestXlsx:
    def test_cell_segments_with_addresses(self):
        raw = make_xlsx({"A1": "id", "B1": "phone", "A2": "A123456789", "B2": "0912345678"})
        segments = xlsx_to_segments(raw)
        by_addr = {s["cell"]["address"]: s for s in segments}
        assert by_addr["A2"]["text"] == "A123456789"
        assert by_addr["A2"]["cell"]["row"] == 2 and by_addr["A2"]["cell"]["col"] == 1
        assert by_addr["B2"]["cell"]["col"] == 2

    def test_deid_with_cell_anchor(self):
        raw = make_xlsx({"A1": "id", "A2": "A123456789"})
        row = process_document(html=raw, lang="zh")
        assert row["route"] == "xlsx"
        ent = [e for e in row["entities"] if e["type"] == "ID"][0]
        assert ent["cell_address"] == "A2"


class TestPptx:
    def test_shape_segments_per_slide(self):
        raw = make_pptx([["Title shape", "Body with 0912-345-678"], ["Second slide"]])
        segments = pptx_to_segments(raw)
        assert [s["text"] for s in segments] == [
            "Title shape",
            "Body with 0912-345-678",
            "Second slide",
        ]
        assert segments[2]["metadata"]["slide_index"] == 1

    def test_deid_over_pptx(self):
        raw = make_pptx([["call 0912-345-678 now"]])
        row = process_document(html=raw, lang="zh")
        assert row["route"] == "pptx"
        assert "0912-345-678" not in row["clean_text"]


class TestOoxmlRebuild:
    def _run(self, raw: bytes, lang: str = "zh"):
        from edge_deid_studio_ray.config import EngineConfig

        return process_document(html=raw, lang=lang, cfg=EngineConfig())

    def test_docx_rebuild_roundtrip(self):
        from edge_deid_studio_ray.kernels.ooxml import docx_to_segments
        from edge_deid_studio_ray.kernels.rebuild import rebuild_docx

        raw = make_docx(["id A123456789 end", "clean paragraph"])
        row = self._run(raw)
        rebuilt = rebuild_docx(raw, row["entities"], row["replacement_map"])
        texts = [s["text"] for s in docx_to_segments(rebuilt)]
        assert "A123456789" not in "".join(texts)
        replacement = row["replacement_map"]["ID:A123456789"]
        assert replacement in texts[0]
        assert texts[1] == "clean paragraph"  # untouched content intact

    def test_pptx_rebuild_roundtrip(self):
        from edge_deid_studio_ray.kernels.ooxml import pptx_to_segments
        from edge_deid_studio_ray.kernels.rebuild import rebuild_pptx

        raw = make_pptx([["phone 0912-345-678", "keep me"]])
        row = self._run(raw)
        rebuilt = rebuild_pptx(raw, row["entities"], row["replacement_map"])
        texts = [s["text"] for s in pptx_to_segments(rebuilt)]
        assert all("0912-345-678" not in t for t in texts)
        assert "keep me" in texts

    def test_xlsx_rebuild_cell_targeted(self):
        from edge_deid_studio_ray.kernels.ooxml import xlsx_to_segments
        from edge_deid_studio_ray.kernels.rebuild import rebuild_xlsx

        raw = make_xlsx({"A1": "id", "A2": "A123456789", "B2": "A123456789"})
        row = self._run(raw)
        # restrict entities to the anchored A2 cell → only that cell changes
        a2_entities = [e for e in row["entities"] if e.get("cell_address") == "A2"]
        rebuilt = rebuild_xlsx(raw, a2_entities, row["replacement_map"])
        by_addr = {s["cell"]["address"]: s["text"] for s in xlsx_to_segments(rebuilt)}
        assert by_addr["A2"] == row["replacement_map"]["ID:A123456789"]
        assert by_addr["B2"] == "A123456789"  # untargeted cell untouched
        assert by_addr["A1"] == "id"
