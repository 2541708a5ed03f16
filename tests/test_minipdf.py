"""Real-PDF route: pure-Python minipdf parser + per-page OCR fallback.

Fixtures are hand-authored minimal PDFs (uncompressed and FlateDecode
content streams) — genuine ``%PDF-1.x`` payloads, not the GRAFT fixture
format, so these tests cover the route that previously returned
``pdf_backend_unavailable`` for every real PDF.
"""

import zlib

from edge_deid_studio_ray.config import EngineConfig
from edge_deid_studio_ray.kernels.docpipe import extract_page, process_document
from edge_deid_studio_ray.kernels.minipdf import minipdf_parse


def build_pdf(page_streams: list[bytes], *, flate: bool = False) -> bytes:
    """Assemble a minimal but structurally genuine PDF: catalog, page tree
    with /Kids, per-page /Contents streams, MediaBox 612x792."""
    objects: list[bytes] = []
    num_pages = len(page_streams)
    first_page_obj = 3
    first_content_obj = 3 + num_pages
    kids = b" ".join(b"%d 0 R" % (first_page_obj + i) for i in range(num_pages))
    objects.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    objects.append(
        b"2 0 obj << /Type /Pages /Kids [" + kids + b"] /Count %d >> endobj" % num_pages
    )
    for i in range(num_pages):
        objects.append(
            b"%d 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R >> endobj" % (first_page_obj + i, first_content_obj + i)
        )
    for i, stream in enumerate(page_streams):
        data = zlib.compress(stream) if flate else stream
        filt = b"/Filter /FlateDecode " if flate else b""
        objects.append(
            b"%d 0 obj << %s/Length %d >> stream\n" % (first_content_obj + i, filt, len(data))
            + data
            + b"\nendstream endobj"
        )
    return b"%PDF-1.4\n" + b"\n".join(objects) + b"\n%%EOF\n"


TWO_BLOCK_STREAM = (
    b"BT /F1 12 Tf 72 720 Td (Hello PII world) Tj ET\n"
    b"BT /F1 12 Tf 72 200 Td (Call 0912-345-678 today) Tj 0 -14 Td (second line) Tj ET\n"
)


class TestMinipdfParse:
    def test_uncompressed_blocks_reading_order(self):
        specs, num_pages = minipdf_parse(build_pdf([TWO_BLOCK_STREAM]))
        assert num_pages == 1
        assert [s["text"] for s in specs] == [
            "Hello PII world",
            "Call 0912-345-678 today\nsecond line",
        ]
        assert all(s["page_index"] == 0 for s in specs)
        # reading order: top (y=720 → top 72) before bottom (y=200 → top 592)
        assert specs[0]["bbox"][1] < specs[1]["bbox"][1]

    def test_flate_decode(self):
        specs, num_pages = minipdf_parse(build_pdf([TWO_BLOCK_STREAM], flate=True))
        assert num_pages == 1
        assert specs[0]["text"] == "Hello PII world"

    def test_multi_page_and_escapes(self):
        p1 = b"BT 10 700 Td (Page \\(one\\) with \\\\ escape) Tj ET"
        p2 = b"BT 10 700 Td <48656c6c6f20686578> Tj ET"
        specs, num_pages = minipdf_parse(build_pdf([p1, p2]))
        assert num_pages == 2
        assert [s["text"] for s in specs] == ["Page (one) with \\ escape", "Hello hex"]
        assert [s["page_index"] for s in specs] == [0, 1]

    def test_tj_array_and_tm(self):
        stream = b"BT 1 0 0 1 50 600 Tm [(A)(B) -120 (C)] TJ ET"
        specs, _ = minipdf_parse(build_pdf([stream]))
        assert specs[0]["text"] == "ABC"

    def test_object_stream_page_tree(self):
        """PDF 1.5+ layout: catalog/pages/page dicts compressed inside an
        /ObjStm object stream, content stream top-level."""
        import zlib

        m1 = b"<< /Type /Catalog /Pages 2 0 R >> "
        m2 = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >> "
        m3 = b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 5 0 R >> "
        header = b"1 0 2 %d 3 %d " % (len(m1), len(m1) + len(m2))
        payload = header + m1 + m2 + m3
        packed = zlib.compress(payload)
        stream = b"BT 10 700 Td (Text from an ObjStm-layout PDF) Tj ET"
        objstm_head = (
            b"4 0 obj << /Type /ObjStm /N 3 /First %d /Filter /FlateDecode /Length %d >> stream\n"
            % (len(header), len(packed))
        )
        content_head = b"5 0 obj << /Length %d >> stream\n" % len(stream)
        raw = (
            b"%PDF-1.5\n"
            + objstm_head
            + packed
            + b"\nendstream endobj\n"
            + content_head
            + stream
            + b"\nendstream endobj\n%%EOF\n"
        )
        specs, num_pages = minipdf_parse(raw)
        assert num_pages == 1
        assert specs[0]["text"] == "Text from an ObjStm-layout PDF"

    def test_garbage_pdf_has_no_pages(self):
        specs, num_pages = minipdf_parse(b"%PDF-1.5 garbage without any objects")
        assert specs == [] and num_pages == 0


class TestPdfRoute:
    def test_real_pdf_extracts_instead_of_flagging(self):
        raw = build_pdf([TWO_BLOCK_STREAM], flate=True)
        text, segments, route, error = extract_page(raw, None)
        assert route == "pdf" and error is None
        assert text == "Hello PII world\nCall 0912-345-678 today\nsecond line"
        assert len(segments) == 2

    def test_real_pdf_detects_pii(self):
        raw = build_pdf([TWO_BLOCK_STREAM])
        row = process_document(html=raw, url="https://x.test/report.pdf")
        assert row["route"] == "pdf" and row["error"] is None
        assert any(e["type"] == "PHONE" for e in row["entities"])
        assert "0912-345-678" not in row["clean_text"]

    def test_opaque_pdf_still_flagged(self):
        row = process_document(html=b"%PDF-1.5 garbage without any objects")
        assert row["route"] == "pdf"
        assert row["error"] == "pdf_backend_unavailable"


class TestLiteralStringProperty:
    def test_roundtrip_arbitrary_latin1_text(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        def pdf_escape(s: str) -> bytes:
            out = []
            for ch in s:
                if ch in "\\()":
                    out.append("\\" + ch)
                elif ch == "\n":
                    out.append("\\n")
                elif ch == "\r":
                    out.append("\\r")
                else:
                    out.append(ch)
            return "".join(out).encode("latin-1")

        # printable latin-1 minus control chars; single-line (block text is
        # stripped and line-split by the layout model)
        alphabet = st.characters(
            min_codepoint=0x20, max_codepoint=0xFF, exclude_characters="\x7f"
        )

        @given(st.text(alphabet=alphabet, min_size=1, max_size=80))
        @settings(max_examples=60, deadline=None)
        def roundtrip(text):
            stream = b"BT 10 700 Td (" + pdf_escape(text) + b") Tj ET"
            specs, _ = minipdf_parse(build_pdf([stream]))
            expect = text.strip()
            got = specs[0]["text"] if specs else ""
            assert got == expect

        roundtrip()


class TestPdfRedaction:
    def test_redaction_roundtrip_removes_text_and_draws_rects(self):
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_document

        raw = build_pdf([TWO_BLOCK_STREAM])
        row = process_document(html=raw, url="https://x.test/report.pdf")
        phone_ents = [e for e in row["entities"] if e["type"] == "PHONE"]
        assert phone_ents and phone_ents[0]["page_index"] == 0
        result = redact_pdf_document(raw, row["entities"])
        assert result["rebuild_supported"] is True
        assert result["rebuild_mode"] == "redact"
        assert result["redaction_count"] == len(phone_ents)
        assert all(r["strategy"] == "block_bbox" for r in result["redaction_rects"])
        # verified removal: every rect's needle no longer extracts
        assert result["verified"] is True and result["warning"] is None
        assert all(r["blanked"] for r in result["redaction_rects"])
        # the rebuilt artifact is a PDF our own parser round-trips, with the
        # PII text REMOVED (not just covered) and fill ops present
        redacted = result["pdf"]
        assert redacted.startswith(b"%PDF-")
        specs, num_pages = minipdf_parse(redacted)
        assert num_pages == 1
        rebuilt_text = "\n".join(s["text"] for s in specs)
        assert "0912-345-678" not in rebuilt_text
        assert "Hello PII world" in rebuilt_text  # untouched block survives
        assert b" re f Q" in redacted

    def test_flate_source_rewrites_uncompressed(self):
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_document

        raw = build_pdf([TWO_BLOCK_STREAM], flate=True)
        row = process_document(html=raw, url="https://x.test/report.pdf")
        result = redact_pdf_document(raw, row["entities"])
        specs, _ = minipdf_parse(result["pdf"])
        assert "0912-345-678" not in "\n".join(s["text"] for s in specs)

    def test_unanchored_entities_skipped(self):
        from edge_deid_studio_ray.kernels.pdf_redact import plan_pdf_redactions

        plan = plan_pdf_redactions(
            [
                {"type": "PHONE", "page_index": None, "bbox": None, "text": "x"},
                {"type": "ID", "page_index": 1, "bbox": (1, 2, 3, 4), "text": "y"},
            ]
        )
        assert len(plan) == 1 and plan[0]["page_index"] == 1

    def test_opaque_pdf_unsupported(self):
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_bytes

        out = redact_pdf_bytes(b"%PDF-1.5 nothing", [])
        assert out["rebuild_supported"] is False


class TestOcrFallback:
    def test_sparse_page_routes_through_ocr(self):
        # page 0 has plenty of text, page 1 is near-empty → only page 1 is
        # replaced by the (deterministic fake) OCR read
        dense = b"BT 10 700 Td (%s) Tj ET" % (b"word " * 20).strip()
        sparse = b"BT 10 700 Td (x) Tj ET"
        raw = build_pdf([dense, sparse])
        cfg = EngineConfig(pdf_ocr="fake")
        text, segments, route, error = extract_page(
            raw, None, pdf_ocr=cfg.pdf_ocr, ocr_threshold=cfg.ocr_threshold
        )
        assert error is None
        lines = text.split("\n")
        assert lines[0].startswith("word word")
        assert "x" not in lines  # sparse page text replaced by OCR output
        from edge_deid_studio_ray.stages.image_deid import FakeOcrBackend

        expected_ocr, _ = FakeOcrBackend().read(raw + b"#page1")
        assert lines[1] == expected_ocr.strip()

    def test_textless_pdf_full_ocr(self):
        raw = build_pdf([b"", b""])  # two pages, no text operators at all
        row = process_document(html=raw, cfg=EngineConfig(pdf_ocr="fake"))
        assert row["error"] is None
        assert row["route"] == "pdf"
        assert len(row["extracted_text"]) > 0
        assert len(row["extracted_text"].split("\n")) == 2

    def test_fallback_disabled_by_default(self):
        raw = build_pdf([b""])
        row = process_document(html=raw)
        assert row["extracted_text"] == "" and row["error"] is None


def build_cid_pdf(codes: bytes, cmap_body: bytes, *, flate_cmap: bool = False) -> bytes:
    """Minimal Type0/Identity-H PDF: one page, one CID font with a ToUnicode
    CMap, content shows a 2-byte-code hex string."""
    import zlib as _zlib

    stream = b"BT /F1 12 Tf 72 700 Td <" + codes + b"> Tj ET"
    cmap_data = _zlib.compress(cmap_body) if flate_cmap else cmap_body
    cmap_filter = b"/Filter /FlateDecode " if flate_cmap else b""
    objects = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length %d >> stream\n" % len(stream) + stream + b"\nendstream endobj",
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >> endobj",
        b"6 0 obj << %s/Length %d >> stream\n" % (cmap_filter, len(cmap_data))
        + cmap_data
        + b"\nendstream endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objects) + b"\n%%EOF\n"


CJK_CMAP = (
    b"/CIDInit /ProcSet findresource begin\n"
    b"begincmap\n"
    b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    b"2 beginbfchar\n<0001> <4F60>\n<0002> <597D>\nendbfchar\n"
    b"1 beginbfrange\n<0010> <0012> <4E16>\nendbfrange\n"
    b"1 beginbfrange\n<0020> <0021> [<754C> <FF01>]\nendbfrange\n"
    b"endcmap\nend\n"
)


class TestCidFonts:
    def test_tounicode_bfchar_and_bfrange(self):
        from edge_deid_studio_ray.kernels.minipdf import parse_tounicode

        cmap, width = parse_tounicode(CJK_CMAP)
        assert width == 2
        assert cmap[0x0001] == "你" and cmap[0x0002] == "好"
        # incrementing range 世(4E16) 丗(4E17) 丘(4E18)
        assert cmap[0x0010] == "世" and cmap[0x0012] == "丘"
        # array-form range
        assert cmap[0x0020] == "界" and cmap[0x0021] == "！"

    def test_cid_pdf_extracts_cjk(self):
        raw = build_cid_pdf(b"000100020010", CJK_CMAP)
        specs, num_pages = minipdf_parse(raw)
        assert num_pages == 1
        assert specs[0]["text"] == "你好世"

    def test_cid_pdf_flate_cmap(self):
        raw = build_cid_pdf(b"00010002", CJK_CMAP, flate_cmap=True)
        specs, _ = minipdf_parse(raw)
        assert specs[0]["text"] == "你好"

    def test_cid_pdf_flows_through_pdf_route(self):
        raw = build_cid_pdf(b"0001000200100020", CJK_CMAP)
        row = process_document(html=raw, url="https://x.test/cjk.pdf")
        assert row["route"] == "pdf" and row["error"] is None
        assert row["extracted_text"] == "你好世界"

    def test_simple_font_unaffected(self):
        # the same /Font resource machinery must not disturb latin-1 fonts
        specs, _ = minipdf_parse(build_pdf([TWO_BLOCK_STREAM]))
        assert specs[0]["text"] == "Hello PII world"


class TestLengthSlicing:
    def test_flate_stream_containing_endstream_bytes(self):
        """Binary Flate output that happens to contain the bytes 'endstream'
        or 'endobj' must not truncate the object scan when /Length is
        present (ADVICE r2: expected at corpus scale)."""
        import zlib as _zlib

        from edge_deid_studio_ray.kernels.minipdf import _scan_objects

        # craft compressed data embedding the keywords
        poison = b"endstream endobj " * 3
        stream = b"BT 10 700 Td (After poison) Tj ET"
        # stored (level 0) deflate keeps the literal bytes visible
        data = _zlib.compress(poison, 0)[:-4]  # keep raw deflate w/o final
        # fall back to a real compressed stream whose bytes include keywords
        payload = _zlib.compress(poison + stream)
        if b"endstream" not in payload:
            payload = _zlib.compress(poison, 0)  # stored blocks: bytes verbatim
        assert b"endstream" in payload
        objects = [
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
            b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj",
            b"4 0 obj << /Filter /FlateDecode /Length %d >> stream\n" % len(payload)
            + payload
            + b"\nendstream endobj",
            b"5 0 obj << /Length %d >> stream\n" % len(stream) + stream + b"\nendstream endobj",
        ]
        raw = b"%PDF-1.4\n" + b"\n".join(objects) + b"\n%%EOF\n"
        scanned = _scan_objects(raw)
        # object 5 must survive the poisoned stream in object 4
        assert 5 in scanned and b"After poison" in scanned[5]

    def test_minipdf_parse_with_poisoned_content(self):
        import zlib as _zlib

        # content stream whose COMPRESSED bytes contain 'endobj' via a
        # stored-block deflate of text that includes the keyword
        text_with_keyword = b"BT 10 700 Td (endobj endstream inside text) Tj ET"
        payload = _zlib.compress(text_with_keyword, 0)
        assert b"endobj" in payload
        objects = [
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
            b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj",
            b"4 0 obj << /Filter /FlateDecode /Length %d >> stream\n" % len(payload)
            + payload
            + b"\nendstream endobj",
        ]
        raw = b"%PDF-1.4\n" + b"\n".join(objects) + b"\n%%EOF\n"
        specs, num_pages = minipdf_parse(raw)
        assert num_pages == 1
        assert specs[0]["text"] == "endobj endstream inside text"


class TestRedactionXref:
    def test_xref_offsets_point_at_objects(self):
        import re as _re

        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_document

        raw = build_pdf([TWO_BLOCK_STREAM])
        row = process_document(html=raw, url="https://x.test/report.pdf")
        out = redact_pdf_document(raw, row["entities"])["pdf"]
        # startxref arithmetic: the recorded offset lands on 'xref'
        m = _re.search(rb"startxref\n(\d+)\n%%EOF", out)
        assert m, "trailer missing startxref"
        xref_pos = int(m.group(1))
        assert out[xref_pos : xref_pos + 4] == b"xref"
        # every in-use entry offset lands on 'N 0 obj'
        table = out[xref_pos:]
        size = int(_re.search(rb"/Size (\d+)", table).group(1))
        entries = _re.findall(rb"(\d{10}) (\d{5}) ([nf])", table)
        assert len(entries) == size
        for num, (off, _gen, kind) in enumerate(entries):
            if kind == b"n":
                assert out[int(off) :].startswith(b"%d 0 obj" % num)
        # /Root points at the catalog
        root = int(_re.search(rb"/Root (\d+) 0 R", table).group(1))
        root_off = int(entries[root][0])
        assert b"/Type /Catalog" in out[root_off : root_off + 200]

    def test_redacted_pdf_reparses(self):
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_document

        raw = build_pdf([TWO_BLOCK_STREAM], flate=True)
        row = process_document(html=raw, url="https://x.test/report.pdf")
        out = redact_pdf_document(raw, row["entities"])
        specs, num_pages = minipdf_parse(out["pdf"])
        assert num_pages == 1 and specs


class TestLiteralScopedBlanking:
    def test_operator_operands_never_corrupted(self):
        """A needle whose digits also appear as Td/Tm operands must blank
        only inside (...) literals — the raw byte replace corrupted
        positioning operators (ADVICE r2 medium)."""
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_bytes

        # needle '72 700' matches the Td operands byte-for-byte
        stream = b"BT /F1 12 Tf 72 700 Td (call 72 700 now) Tj ET"
        raw = build_pdf([stream])
        rects = [
            {"page_index": 0, "bbox": (10, 10, 40, 20), "strategy": "block_bbox", "text": "72 700"}
        ]
        out = redact_pdf_bytes(raw, rects)
        specs, _ = minipdf_parse(out["pdf"])
        # literal text blanked…
        assert "72 700" not in " ".join(s["text"] for s in specs)
        # …but the block still extracts at the same position (operands intact)
        assert specs and specs[0]["text"].startswith("call")
        assert out["verified"] is True

    def test_hex_encoded_needle_reported_unblanked(self):
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_bytes

        # the PII is shown via a hex string: blanking cannot remove it, and
        # the result must SAY so instead of reporting success
        stream = b"BT 10 700 Td <30393132333435> Tj ET"  # '0912345'
        raw = build_pdf([stream])
        rects = [
            {"page_index": 0, "bbox": (10, 10, 40, 20), "strategy": "block_bbox", "text": "0912345"}
        ]
        out = redact_pdf_bytes(raw, rects)
        assert out["verified"] is False
        assert out["warning"] == "needle_survives_extraction"
        assert out["redaction_rects"][0]["blanked"] is False


class TestCidRedaction:
    def test_cid_hex_needle_blanked_via_reverse_cmap(self):
        """Needles shown as CID hex strings (CJK PDFs) are re-encoded
        through the reverse ToUnicode map and blanked to .notdef codes —
        text removal works where literal blanking cannot reach."""
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_bytes

        raw = build_cid_pdf(b"000100020010", CJK_CMAP)  # extracts 你好世
        rects = [
            {"page_index": 0, "bbox": (10, 10, 80, 30), "strategy": "block_bbox", "text": "你好"}
        ]
        out = redact_pdf_bytes(raw, rects)
        assert out["verified"] is True
        assert out["redaction_rects"][0]["blanked"] is True
        specs, _ = minipdf_parse(out["pdf"])
        rebuilt = "".join(s["text"] for s in specs)
        assert "你好" not in rebuilt and "世" in rebuilt

    def test_cid_e2e_detect_then_redact(self):
        """Full loop on a corpus-style CID PDF: extract → detect → redact →
        re-extract has no surviving needle."""
        import random

        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_document
        from edge_deid_studio_ray.sources.pages import _real_cid_pdf_payload

        raw = _real_cid_pdf_payload(random.Random(7))
        row = process_document(html=raw, url="https://x.test/cjk.pdf", lang="zh")
        assert row["error"] is None
        if not row["entities"]:
            import pytest

            pytest.skip("seed produced no detectable PII")
        out = redact_pdf_document(raw, row["entities"])
        assert out["verified"] is True
        assert all(r["blanked"] for r in out["redaction_rects"])


def encrypt_pdf_rc4(raw: bytes, *, owner_pw: bytes = b"owner", revision: int = 2,
                    key_bits: int = 40, perms: int = -44) -> bytes:
    """Spec-faithful Standard-handler encryption of a minipdf-built PDF
    (empty USER password): computes /O from the owner password, the file
    key per algorithm 2, RC4-encrypts every stream with its per-object
    key, and appends /Encrypt + /ID to the trailer."""
    import hashlib
    import re
    import struct

    from edge_deid_studio_ray.kernels.minipdf import (
        _PW_PAD,
        _scan_object_spans,
        object_decryptor,
        rc4,
    )

    n = key_bits // 8 if revision >= 3 else 5
    # /O entry (algorithm 3): RC4(owner_key, padded user password)
    okey = hashlib.md5((owner_pw + _PW_PAD)[:32]).digest()
    if revision >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey).digest()
    o_entry = rc4(okey[:n], _PW_PAD)  # user pw empty -> padded = _PW_PAD
    file_id = hashlib.md5(raw).digest()

    # file key (algorithm 2, empty user password)
    digest = hashlib.md5(_PW_PAD + o_entry + struct.pack("<i", perms) + file_id).digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:n]).digest()
    file_key = digest[:n]

    # /U entry: R2 = RC4(file_key, pad)
    u_entry = rc4(file_key, _PW_PAD)

    # rebuild with every stream RC4'd under its per-object key
    out = bytearray()
    pos = 0
    spans = _scan_object_spans(raw)
    max_num = max(s[0] for s in spans)
    for num, hstart, body_start, end in spans:
        out += raw[pos:body_start]
        body = raw[body_start:end]
        m = re.search(rb"stream\r?\n", body)
        if m:
            data_start = m.end()
            es = body.rfind(b"\nendstream")
            data = body[data_start:es]
            enc = object_decryptor(file_key, num, 0)(data)  # RC4 is symmetric
            body = body[:data_start] + enc + body[es:]
        out += body
        pos = end
    out += raw[pos:]
    enc_num = max_num + 1
    version = 1 if revision == 2 else 2
    enc_obj = (
        b"%d 0 obj << /Filter /Standard /V %d /R %d /Length %d /P %d /O <%s> /U <%s> >> endobj\n"
        % (enc_num, version, revision, key_bits, perms, o_entry.hex().encode(), u_entry.hex().encode())
    )
    trailer = b"trailer << /Encrypt %d 0 R /ID [<%s> <%s>] >>\n" % (
        enc_num, file_id.hex().encode(), file_id.hex().encode()
    )
    return bytes(out).replace(b"%%EOF", enc_obj + trailer + b"%%EOF")


class TestEncryptedPdf:
    def test_rc4_rev2_roundtrip(self):
        raw = encrypt_pdf_rc4(build_pdf([TWO_BLOCK_STREAM], flate=True))
        # sanity: the ciphertext must NOT contain the plaintext
        assert b"Hello PII world" not in raw
        specs, num_pages = minipdf_parse(raw)
        assert num_pages == 1
        assert specs[0]["text"] == "Hello PII world"

    def test_rc4_rev3_128bit(self):
        raw = encrypt_pdf_rc4(build_pdf([TWO_BLOCK_STREAM]), revision=3, key_bits=128)
        specs, _ = minipdf_parse(raw)
        assert specs[0]["text"] == "Hello PII world"

    def test_encrypted_cid_pdf(self):
        """Encryption composes with CID fonts: the ToUnicode CMap stream is
        itself encrypted and must decrypt before parsing."""
        raw = encrypt_pdf_rc4(build_cid_pdf(b"00010002", CJK_CMAP, flate_cmap=True))
        specs, _ = minipdf_parse(raw)
        assert specs[0]["text"] == "你好"

    def test_encrypted_pdf_through_pipeline(self):
        raw = encrypt_pdf_rc4(build_pdf([TWO_BLOCK_STREAM]))
        row = process_document(html=raw, url="https://x.test/locked.pdf")
        assert row["route"] == "pdf" and row["error"] is None
        assert any(e["type"] == "PHONE" for e in row["entities"])

    def test_aes256_flagged_unavailable(self):
        # /V 5 (AESV3, SHA-2 handler) is out of scope -> flagged upstream
        raw = build_pdf([TWO_BLOCK_STREAM])
        aes = raw.replace(
            b"%%EOF",
            b"9 0 obj << /Filter /Standard /V 5 /R 5 /O <00> /U <00> /P -44 >> endobj\n"
            b"trailer << /Encrypt 9 0 R /ID [<00> <00>] >>\n%%EOF",
        )
        specs, num_pages = minipdf_parse(aes)
        assert specs == [] and num_pages == 0
        row = process_document(html=aes)
        assert row["error"] == "pdf_backend_unavailable"


class TestReviewRegressions:
    """Regression pins for the round-3 code-review findings."""

    def test_encrypted_redaction_decrypts_and_rewrites(self):
        """Redacting an RC4-encrypted PDF must produce a plain (unencrypted)
        artifact with the needle actually gone — not ciphertext behind a
        trailer without /Encrypt that falsely verifies clean."""
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_document

        raw = encrypt_pdf_rc4(build_pdf([TWO_BLOCK_STREAM], flate=True))
        row = process_document(html=raw, url="https://x.test/locked.pdf")
        phone = [e for e in row["entities"] if e["type"] == "PHONE"]
        assert phone
        out = redact_pdf_document(raw, row["entities"])
        assert out["rebuild_supported"] is True
        assert out["verified"] is True and out["warning"] is None
        # the artifact is plain: no /Encrypt in its trailer region, and the
        # untouched block extracts as real text (decrypt-rewrite happened)
        import re as _re

        trailer_zone = out["pdf"][-1024:]
        assert b"/Encrypt" not in trailer_zone
        specs, _ = minipdf_parse(out["pdf"])
        rebuilt = "\n".join(s["text"] for s in specs)
        assert "Hello PII world" in rebuilt
        assert "0912-345-678" not in rebuilt
        # raw ciphertext of the original streams must not survive verbatim
        m = _re.search(rb"stream\r?\n(.{20})", raw, _re.DOTALL)
        assert m.group(1) not in out["pdf"]

    def test_aes256_redaction_flagged_unsupported(self):
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_bytes

        raw = build_pdf([TWO_BLOCK_STREAM])
        aes = raw.replace(
            b"%%EOF",
            b"9 0 obj << /Filter /Standard /V 5 /R 5 /O <00> /U <00> /P -44 >> endobj\n"
            b"trailer << /Encrypt 9 0 R /ID [<00> <00>] >>\n%%EOF",
        )
        out = redact_pdf_bytes(aes, [])
        assert out["rebuild_supported"] is False
        assert out["warning"] == "unsupported_encryption"

    def test_hex_blank_respects_code_boundaries(self):
        """A needle encoding matching at an odd glyph offset must NOT blank
        (it would destroy glyphs the needle never contained)."""
        from edge_deid_studio_ray.kernels.pdf_redact import _blank_hex_strings

        # cmap: 0x3000->'A', 0x1000->'B', 0x0010->'C'; content shows 'AB'
        fonts = {b"F1": ({0x3000: "A", 0x1000: "B", 0x0010: "C"}, 2)}
        content = b"BT /F1 12 Tf 10 700 Td <30001000> Tj ET"
        out = _blank_hex_strings(content, ["C"], fonts)  # 'C' hex '0010' straddles
        assert out == content  # untouched
        # aligned occurrence still blanks
        content2 = b"BT /F1 12 Tf 10 700 Td <00103000> Tj ET"  # shows 'CA'
        out2 = _blank_hex_strings(content2, ["C"], fonts)
        assert out2 == b"BT /F1 12 Tf 10 700 Td <00003000> Tj ET"

    def test_unsigned_P_value(self):
        """Writers emitting /P in unsigned form must not crash key
        derivation (struct.pack needs the signed value)."""
        raw = encrypt_pdf_rc4(build_pdf([TWO_BLOCK_STREAM]), perms=-3904)
        # rewrite the dict's /P to the unsigned rendering of -3904
        unsigned = str((-3904) & 0xFFFFFFFF).encode()
        raw2 = raw.replace(b"/P -3904", b"/P " + unsigned)
        assert raw2 != raw
        specs, _ = minipdf_parse(raw2)
        assert specs and specs[0]["text"] == "Hello PII world"

    def test_encrypt_pattern_in_content_not_treated_as_encryption(self):
        """An unencrypted PDF whose TEXT mentions '/Encrypt 9 0 R' must
        still parse (detection is trailer-scoped)."""
        stream = b"BT 10 700 Td (see /Encrypt 9 0 R for details) Tj ET"
        specs, num_pages = minipdf_parse(build_pdf([stream]))
        assert num_pages == 1
        assert specs[0]["text"] == "see /Encrypt 9 0 R for details"

    def test_indirect_length_multidigit_ref(self):
        """/Length 10 0 R (indirect, multi-digit objnum) must fall through
        to keyword scanning, not backtrack-match a bogus length of 1."""
        from edge_deid_studio_ray.kernels.minipdf import _LENGTH_RE

        assert _LENGTH_RE.search(b"<< /Length 10 0 R /Filter /FlateDecode >>") is None
        assert _LENGTH_RE.search(b"<< /Length 42 >>").group(1) == b"42"


def test_encrypt_ref_in_xref_stream_dict():
    """PDF 1.5+ layout: no 'trailer' keyword — the /Encrypt reference lives
    in the /Type /XRef stream dict; detection must still find it."""
    raw = encrypt_pdf_rc4(build_pdf([TWO_BLOCK_STREAM], flate=True))
    # transplant the trailer's /Encrypt into an XRef stream object instead
    import re as _re

    m = _re.search(rb"trailer << /Encrypt (\d+) 0 R /ID \[<([0-9a-f]+)> <[0-9a-f]+>\] >>\n", raw)
    assert m
    enc_num, fid = m.group(1), m.group(2)
    xref_obj = (
        b"20 0 obj << /Type /XRef /Encrypt " + enc_num + b" 0 R /ID [<" + fid + b"> <" + fid + b">] "
        b"/Length 1 >> stream\nX\nendstream endobj\n"
    )
    no_trailer = raw.replace(m.group(0), xref_obj)
    assert b"trailer" not in no_trailer
    specs, num_pages = minipdf_parse(no_trailer)
    assert num_pages == 1
    assert specs[0]["text"] == "Hello PII world"


class TestCidProperty:
    def test_roundtrip_arbitrary_bmp_text(self):
        """Property: any BMP text round-trips through a generated CID font
        (codes assigned per unique char, ToUnicode CMap, hex show string)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        # BMP, no surrogates, printable-ish, exclude control chars
        alphabet = st.characters(
            min_codepoint=0x21, max_codepoint=0xFFFD, exclude_categories=("Cs", "Cc", "Zs")
        )

        @given(st.text(alphabet=alphabet, min_size=1, max_size=40))
        @settings(max_examples=40, deadline=None)
        def roundtrip(text):
            chars = sorted(set(text))
            code_of = {c: i + 1 for i, c in enumerate(chars)}
            bf = b" ".join(
                b"<%04X> <%s>" % (code_of[c], c.encode("utf-16-be").hex().upper().encode())
                for c in chars
            )
            cmap = (
                b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
                b"%d beginbfchar\n" % len(chars) + bf + b"\nendbfchar\nendcmap\n"
            )
            codes = b"".join(b"%04X" % code_of[c] for c in text)
            specs, _ = minipdf_parse(build_cid_pdf(codes, cmap))
            got = specs[0]["text"] if specs else ""
            assert got == text.strip()

        roundtrip()


class TestStreamFilters:
    def _one_page(self, head: bytes, payload: bytes) -> bytes:
        objects = [
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
            b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj",
            b"4 0 obj << " + head + b" /Length %d >> stream\n" % len(payload)
            + payload + b"\nendstream endobj",
        ]
        return b"%PDF-1.4\n" + b"\n".join(objects) + b"\n%%EOF\n"

    STREAM = b"BT 10 700 Td (Filtered stream text) Tj ET"

    def test_ascii_hex(self):
        payload = self.STREAM.hex().upper().encode() + b">"
        specs, _ = minipdf_parse(self._one_page(b"/Filter /ASCIIHexDecode", payload))
        assert specs[0]["text"] == "Filtered stream text"

    def test_ascii85(self):
        import base64

        payload = base64.a85encode(self.STREAM) + b"~>"
        specs, _ = minipdf_parse(self._one_page(b"/Filter /ASCII85Decode", payload))
        assert specs[0]["text"] == "Filtered stream text"

    def test_run_length(self):
        # encode: literal runs (n<128 -> n+1 literals) + a repeat run
        data = b"BT 10 700 Td (run" + b"A" * 40 + b") Tj ET"
        payload = bytearray()
        i = 0
        while i < len(data):
            # find repeat run of >= 3
            j = i
            while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 127:
                j += 1
            if j - i >= 2:
                payload += bytes([257 - (j - i + 1), data[i]])
                i = j + 1
            else:
                k = min(i + 128, len(data))
                payload += bytes([k - i - 1]) + data[i:k]
                i = k
        payload.append(128)  # EOD
        specs, _ = minipdf_parse(self._one_page(b"/Filter /RunLengthDecode", bytes(payload)))
        assert specs[0]["text"] == "run" + "A" * 40

    def _lzw_encode(self, data: bytes) -> bytes:
        """Minimal PDF LZW encoder (MSB-first, clear code first, 9->12 bit
        growth with EarlyChange=1) — the inverse of _lzw_decode."""
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        out_bits: list[tuple[int, int]] = [(256, 9)]  # leading clear code
        w = b""
        for byte in data:
            wc = w + bytes([byte])
            if wc in table:
                w = wc
            else:
                out_bits.append((table[w], width))
                table[wc] = next_code
                next_code += 1
                # encoder bumps width when next_code + early > (1<<width)
                if next_code + 1 > (1 << width) and width < 12:
                    width += 1
                w = bytes([byte])
        if w:
            out_bits.append((table[w], width))
        out_bits.append((257, width))  # EOD
        acc = nbits = 0
        payload = bytearray()
        for code, wbits in out_bits:
            acc = (acc << wbits) | code
            nbits += wbits
            while nbits >= 8:
                payload.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            payload.append((acc << (8 - nbits)) & 0xFF)
        return bytes(payload)

    def test_lzw(self):
        from edge_deid_studio_ray.kernels.minipdf import _lzw_decode

        data = (b"the quick brown fox " * 30) + b"tail"
        assert _lzw_decode(self._lzw_encode(data)) == data
        stream = b"BT 10 700 Td (LZW compressed content here) Tj ET"
        specs, _ = minipdf_parse(
            self._one_page(b"/Filter /LZWDecode", self._lzw_encode(stream))
        )
        assert specs[0]["text"] == "LZW compressed content here"

    def test_filter_chain_a85_flate(self):
        import base64
        import zlib as _zlib

        payload = base64.a85encode(_zlib.compress(self.STREAM)) + b"~>"
        specs, _ = minipdf_parse(
            self._one_page(b"/Filter [/ASCII85Decode /FlateDecode]", payload)
        )
        assert specs[0]["text"] == "Filtered stream text"

    def test_lzw_property_roundtrip(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from edge_deid_studio_ray.kernels.minipdf import _lzw_decode

        @given(st.binary(min_size=0, max_size=400))
        @settings(max_examples=60, deadline=None)
        def roundtrip(data):
            assert _lzw_decode(self._lzw_encode(data)) == data

        roundtrip()


def encrypt_pdf_aesv2(raw: bytes, *, owner_pw: bytes = b"owner", perms: int = -44) -> bytes:
    """Spec-faithful /V 4 /R 4 AESV2 encryption of a minipdf-built PDF
    (empty user password): R3-style /O and file key (128-bit), per-object
    AES keys with the sAlT suffix, IV-prefixed PKCS#7-padded streams."""
    import hashlib
    import re
    import struct

    from edge_deid_studio_ray.kernels.aes import cbc_encrypt
    from edge_deid_studio_ray.kernels.minipdf import _PW_PAD, _scan_object_spans, rc4

    n = 16
    okey = hashlib.md5((owner_pw + _PW_PAD)[:32]).digest()
    for _ in range(50):
        okey = hashlib.md5(okey).digest()
    o_entry = rc4(okey[:n], _PW_PAD)
    file_id = hashlib.md5(raw).digest()
    digest = hashlib.md5(_PW_PAD + o_entry + struct.pack("<i", perms) + file_id).digest()
    for _ in range(50):
        digest = hashlib.md5(digest[:n]).digest()
    file_key = digest[:n]
    # /U per algorithm 5 (R >= 3): md5(pad + id), rc4 chain with xor'd keys
    u_hash = hashlib.md5(_PW_PAD + file_id).digest()
    u = rc4(file_key, u_hash)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    u_entry = u + b"\x00" * 16

    out = bytearray()
    pos = 0
    spans = _scan_object_spans(raw)
    max_num = max(s[0] for s in spans)
    for num, hstart, body_start, end in spans:
        out += raw[pos:body_start]
        body = raw[body_start:end]
        m = re.search(rb"stream\r?\n", body)
        if m:
            data_start = m.end()
            es = body.rfind(b"\nendstream")
            data = body[data_start:es]
            obj_key = hashlib.md5(
                file_key + num.to_bytes(3, "little") + (0).to_bytes(2, "little") + b"sAlT"
            ).digest()[:16]
            iv = hashlib.md5(b"iv%d" % num).digest()  # deterministic fixture IV
            enc = cbc_encrypt(obj_key, data, iv)
            # fix /Length to the ciphertext size (IV + padded payload)
            head = body[: m.start()]
            head = re.sub(rb"/Length\s+\d+", b"/Length %d" % len(enc), head)
            body = head + b"stream\n" + enc + body[es:]
        out += body
        pos = end
    out += raw[pos:]
    enc_num = max_num + 1
    enc_obj = (
        b"%d 0 obj << /Filter /Standard /V 4 /R 4 /Length 128 "
        b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
        b"/StmF /StdCF /StrF /StdCF "
        b"/P %d /O <%s> /U <%s> >> endobj\n"
        % (enc_num, perms, o_entry.hex().encode(), u_entry.hex().encode())
    )
    trailer = b"trailer << /Encrypt %d 0 R /ID [<%s> <%s>] >>\n" % (
        enc_num, file_id.hex().encode(), file_id.hex().encode()
    )
    return bytes(out).replace(b"%%EOF", enc_obj + trailer + b"%%EOF")


class TestAesV2Pdf:
    def test_aesv2_roundtrip(self):
        raw = encrypt_pdf_aesv2(build_pdf([TWO_BLOCK_STREAM], flate=True))
        assert b"Hello PII world" not in raw  # ciphertext
        specs, num_pages = minipdf_parse(raw)
        assert num_pages == 1
        assert specs[0]["text"] == "Hello PII world"

    def test_aesv2_through_pipeline(self):
        raw = encrypt_pdf_aesv2(build_pdf([TWO_BLOCK_STREAM]))
        row = process_document(html=raw, url="https://x.test/aes.pdf")
        assert row["route"] == "pdf" and row["error"] is None
        assert any(e["type"] == "PHONE" for e in row["entities"])

    def test_aesv2_redaction_decrypt_rewrite(self):
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_document

        raw = encrypt_pdf_aesv2(build_pdf([TWO_BLOCK_STREAM]))
        row = process_document(html=raw, url="https://x.test/aes.pdf")
        out = redact_pdf_document(raw, row["entities"])
        assert out["rebuild_supported"] is True
        assert out["verified"] is True
        rebuilt = "\n".join(s["text"] for s in minipdf_parse(out["pdf"])[0])
        assert "0912-345-678" not in rebuilt and "Hello PII world" in rebuilt

    def test_aes_known_answer_vectors(self):
        from edge_deid_studio_ray.kernels.aes import _decrypt_block, _encrypt_block, _expand_key

        key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        rk = _expand_key(key)
        assert _encrypt_block(pt, rk).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
        assert _decrypt_block(bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a"), rk) == pt
        key256 = bytes.fromhex(
            "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
        )
        rk = _expand_key(key256)
        assert _encrypt_block(pt, rk).hex() == "8ea2b7ca516745bfeafc49904b496089"


def encrypt_pdf_aesv3(raw: bytes, *, revision: int = 6, perms: int = -44) -> bytes:
    """Spec-faithful /V 5 AESV3 encryption (empty user password): /U carries
    the validation hash + salts (R5 SHA-256 or R6 algorithm 2.B), /UE wraps
    a fixed 256-bit file key, streams are AES-256-CBC with the file key."""
    import hashlib
    import re

    from edge_deid_studio_ray.kernels.aes import cbc_encrypt
    from edge_deid_studio_ray.kernels.minipdf import _hash_2b, _scan_object_spans

    file_key = hashlib.sha256(b"fixture-file-key").digest()
    vsalt = b"VSALT000"
    ksalt = b"KSALT000"
    if revision >= 6:
        u_hash = _hash_2b(b"", vsalt)
        ikey = _hash_2b(b"", ksalt)
    else:
        u_hash = hashlib.sha256(vsalt).digest()
        ikey = hashlib.sha256(ksalt).digest()
    ue = cbc_encrypt(ikey, file_key, b"\x00" * 16, pad=False)
    u_entry = u_hash + vsalt + ksalt

    out = bytearray()
    pos = 0
    spans = _scan_object_spans(raw)
    max_num = max(s[0] for s in spans)
    for num, hstart, body_start, end in spans:
        out += raw[pos:body_start]
        body = raw[body_start:end]
        m = re.search(rb"stream\r?\n", body)
        if m:
            data_start = m.end()
            es = body.rfind(b"\nendstream")
            data = body[data_start:es]
            iv = hashlib.md5(b"iv%d" % num).digest()
            enc = cbc_encrypt(file_key, data, iv)
            head = re.sub(rb"/Length\s+\d+", b"/Length %d" % len(enc), body[: m.start()])
            body = head + b"stream\n" + enc + body[es:]
        out += body
        pos = end
    out += raw[pos:]
    enc_num = max_num + 1
    enc_obj = (
        b"%d 0 obj << /Filter /Standard /V 5 /R %d /Length 256 "
        b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
        b"/StmF /StdCF /StrF /StdCF /P %d "
        b"/O <%s> /OE <%s> /U <%s> /UE <%s> >> endobj\n"
        % (
            enc_num, revision, perms,
            (b"\x11" * 48).hex().encode(), (b"\x22" * 32).hex().encode(),
            u_entry.hex().encode(), ue.hex().encode(),
        )
    )
    trailer = b"trailer << /Encrypt %d 0 R /ID [<00> <00>] >>\n" % enc_num
    return bytes(out).replace(b"%%EOF", enc_obj + trailer + b"%%EOF")


class TestAesV3Pdf:
    def test_r6_roundtrip(self):
        raw = encrypt_pdf_aesv3(build_pdf([TWO_BLOCK_STREAM], flate=True))
        assert b"Hello PII world" not in raw
        specs, num_pages = minipdf_parse(raw)
        assert num_pages == 1
        assert specs[0]["text"] == "Hello PII world"

    def test_r5_roundtrip(self):
        raw = encrypt_pdf_aesv3(build_pdf([TWO_BLOCK_STREAM]), revision=5)
        specs, _ = minipdf_parse(raw)
        assert specs[0]["text"] == "Hello PII world"

    def test_r6_through_pipeline_and_redaction(self):
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_document

        raw = encrypt_pdf_aesv3(build_pdf([TWO_BLOCK_STREAM]))
        row = process_document(html=raw, url="https://x.test/aes256.pdf")
        assert row["error"] is None
        assert any(e["type"] == "PHONE" for e in row["entities"])
        out = redact_pdf_document(raw, row["entities"])
        assert out["verified"] is True
        rebuilt = "\n".join(s["text"] for s in minipdf_parse(out["pdf"])[0])
        assert "0912-345-678" not in rebuilt

    def test_real_user_password_flagged(self):
        """A document whose user password is NOT empty fails /U validation
        and must be flagged, never silently mis-decrypted."""
        import hashlib

        raw = encrypt_pdf_aesv3(build_pdf([TWO_BLOCK_STREAM]))
        # corrupt the validation hash => empty-password check fails
        from edge_deid_studio_ray.kernels.minipdf import _hash_2b

        good = _hash_2b(b"", b"VSALT000")
        bad = hashlib.sha256(b"not-it").digest()
        raw2 = raw.replace(good.hex().encode(), bad.hex().encode())
        assert raw2 != raw
        specs, num_pages = minipdf_parse(raw2)
        assert specs == [] and num_pages == 0
        row = process_document(html=raw2)
        assert row["error"] == "pdf_backend_unavailable"


class TestIncrementalUpdateRevisions:
    def test_last_object_definition_wins(self):
        """An incremental update appends a NEW revision of an object; the
        parser must extract the current revision, not resurrect the stale
        one (first-wins mislocated redaction anchors and re-exposed text
        the user had deleted)."""
        base = build_pdf([b"BT /F1 12 Tf 72 720 Td (OLD SECRET) Tj ET\n"])
        # append a revised content stream for the same object number (4)
        new_stream = b"BT /F1 12 Tf 72 720 Td (NEW TEXT) Tj ET\n"
        update = (
            b"\n4 0 obj << /Length %d >> stream\n" % len(new_stream)
            + new_stream
            + b"\nendstream endobj\n%%EOF\n"
        )
        specs, n_pages = minipdf_parse(base + update)
        texts = [s["text"] for s in specs]
        assert any("NEW TEXT" in t for t in texts)
        assert not any("OLD SECRET" in t for t in texts)


class TestUnverifiablePageRedaction:
    def test_invisible_page_never_reports_verified(self):
        """A rect targeting a page the re-parse cannot see (array-form
        /Contents) must report blanked=False and verified=False — 'no text
        extracted' is not 'needle removed'."""
        from edge_deid_studio_ray.kernels.pdf_redact import redact_pdf_bytes

        plain = b"BT /F1 12 Tf 72 720 Td (ordinary first page) Tj ET\n"
        hidden = b"BT /F1 12 Tf 72 720 Td (Call 0912-345-678 now) Tj ET\n"
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R >> endobj\n"
            b"4 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents [6 0 R] >> endobj\n"  # ARRAY form: invisible to minipdf
            + (b"5 0 obj << /Length %d >> stream\n" % len(plain))
            + plain
            + b"\nendstream endobj\n"
            + (b"6 0 obj << /Length %d >> stream\n" % len(hidden))
            + hidden
            + b"\nendstream endobj\n%%EOF\n"
        )
        rects = [
            {
                "page_index": 1,
                "bbox": (72, 60, 200, 80),
                "strategy": "blackbox",
                "text": "0912-345-678",
            }
        ]
        out = redact_pdf_bytes(pdf, rects)
        assert out["verified"] is False
        assert out["redaction_rects"][0]["blanked"] is False
        assert out["warning"] == "page_unverifiable"
        # the PII is indeed still present in the artifact — the report must
        # say so rather than claim a verified removal
        assert b"0912-345-678" in out["pdf"]
