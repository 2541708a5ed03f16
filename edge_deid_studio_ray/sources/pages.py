"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md F1).

Schema matches BASELINE.json's input_hint exactly:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``.

Every row is a pure function of ``(row_id, seed)`` — generation is
embarrassingly parallel and runs as a ``map_batches`` stage over
``ray.data.range(n)``, so a 10^12-row table would synthesize the same way a
100-row test table does.  Row mix (FIXTURES.md F1):

- ~5%  faux-PDF payloads (``%PDF-GRAFT1`` header + JSON block records);
- ~2%  HTML with malformed UTF-8 bytes (exercises ``errors="replace"``);
- ~30% rows additionally carry pre-extracted ``text`` (passthrough route);
- lang: 70% ``zh`` / 30% ``en``;
- optional mega-pages every ``mega_every`` rows (skew fixture).
"""

from __future__ import annotations

import random

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_US = 1767225600_000000  # 2026-01-01T00:00:00 UTC, fixed (no wall clock)

# bump when generation logic changes — invalidates cached bench corpora
GENERATOR_VERSION = 4

_WORDS_EN = (
    "the quick brown fox jumps over a lazy dog while data streams through "
    "arrow batches and workers shuffle blocks across the cluster ring"
).split()
_WORDS_ZH = list("資料處理引擎批次串流叢集節點分區排序合併索引壓縮快取網頁內容抽取遮罩替換")

_NAV_LINKS = ["Home", "About", "Products", "Contact", "Login", "Register", "Blog", "Help"]
_FOOTER_LINKS = ["Privacy Policy", "Terms of Service", "Careers", "Sitemap", "RSS"]


def _pii_values(rng: random.Random, lang: str) -> list[tuple[str, str]]:
    """(type, value) pairs matchable by the engine's regex rules (FIXTURES F3)."""
    if lang == "zh":
        pool = [
            ("ID", f"{rng.choice('ABCDEFGH')}{rng.choice('12')}{rng.randint(0, 9999999):07d}{rng.randint(0, 9)}"),
            ("PHONE", f"09{rng.randint(0, 99):02d}-{rng.randint(0, 999):03d}-{rng.randint(0, 999):03d}"),
            ("EMAIL", f"user{rng.randint(0, 99999)}@example.com"),
            ("ADDRESS", f"台北市信義路{rng.randint(1, 999)}號"),
            ("UNIFIED_BUSINESS_NO", f"{rng.randint(10000000, 99999999)}"),
            ("MEDICAL_ID", f"M{rng.randint(1000000, 9999999)}"),
        ]
    else:
        pool = [
            ("ID", f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}"),
            ("PHONE", f"555-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}"),
            ("EMAIL", f"user{rng.randint(0, 99999)}@example.com"),
            ("ADDRESS", f"{rng.randint(1, 999)} Main Street"),
            ("UNIFIED_BUSINESS_NO", f"{rng.randint(10, 99)}-{rng.randint(1000000, 9999999)}"),
        ]
    k = rng.randint(1, min(4, len(pool)))
    return rng.sample(pool, k)


def _sentence(rng: random.Random, lang: str, n_words: int) -> str:
    if lang == "zh":
        return "".join(rng.choice(_WORDS_ZH) for _ in range(n_words * 2)) + "。"
    return " ".join(rng.choice(_WORDS_EN) for _ in range(n_words)) + "."


def _content_paragraphs(rng: random.Random, lang: str, scale: int = 1) -> list[str]:
    paragraphs = []
    n_par = rng.randint(1, 5) * scale
    pii = _pii_values(rng, lang)
    for i in range(n_par):
        parts = [_sentence(rng, lang, rng.randint(6, 18)) for _ in range(rng.randint(1, 4))]
        if i < len(pii):
            typ, value = pii[i]
            sep = "" if lang == "zh" else " "
            parts.insert(rng.randint(0, len(parts)), f"{'聯絡' if lang == 'zh' else 'contact'}{sep}{value}{sep}")
        paragraphs.append(" ".join(parts))
    return paragraphs


def _html_page(rng: random.Random, lang: str, title: str, scale: int = 1) -> str:
    nav = " | ".join(f'<a href="/{w.lower()}">{w}</a>' for w in rng.sample(_NAV_LINKS, 5))
    footer = " ".join(f'<a href="/{w.split()[0].lower()}">{w}</a>' for w in rng.sample(_FOOTER_LINKS, 3))
    body = "\n".join(f"<p>{p}</p>" for p in _content_paragraphs(rng, lang, scale))
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>{title}</title>"
        "<script>var t = performance.now();</script>"
        "<style>.nav a { color: #222 }</style>"
        "</head>\n<body>\n"
        f'<nav class="nav">{nav}</nav>\n'
        "<!-- boilerplate begins -->\n"
        f'<div class="content">\n{body}\n</div>\n'
        f"<footer>{footer} &copy; 2026 {title}</footer>\n"
        "</body></html>\n"
    )


def _pdf_payload(rng: random.Random, lang: str) -> bytes:
    import json

    blocks = []
    n_pages = rng.randint(1, 3)
    for page in range(n_pages):
        tops = rng.sample(range(40, 740), rng.randint(2, 5))
        for top in tops:
            blocks.append(
                {
                    "page": page,
                    "bbox": [rng.randint(30, 60), top, rng.randint(400, 580), top + 24],
                    "btype": 0,
                    "text": _sentence(rng, lang, rng.randint(4, 14)),
                }
            )
        # a non-text (image) block and an empty text block, both filtered out
        blocks.append({"page": page, "bbox": [0, 0, 100, 100], "btype": 1, "text": "img"})
        blocks.append({"page": page, "bbox": [0, 760, 10, 770], "btype": 0, "text": "  "})
    pii = _pii_values(rng, lang)
    if pii:
        typ, value = pii[0]
        blocks.append({"page": 0, "bbox": [40, 400, 500, 424], "btype": 0, "text": f"ref {value}"})
    rng.shuffle(blocks)  # extractor must restore reading order via sort
    lines = ["%PDF-GRAFT1"] + [json.dumps(b, ensure_ascii=False) for b in blocks]
    return "\n".join(lines).encode("utf-8")


def _pdf_escape(text: str) -> bytes:
    out = []
    for ch in text:
        if ch in "\\()":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out).encode("latin-1", "replace")


def _real_pdf_payload(rng: random.Random) -> bytes:
    """A genuine ``%PDF-1.4`` payload (catalog + page tree + FlateDecode
    content streams) parseable by kernels/minipdf.py — English-only (simple
    Latin fonts; CJK would need CID fonts, which the faux-PDF slice covers).
    Exercises the real-PDF route inside the flagship corpus, not just in
    unit fixtures."""
    import zlib

    n_pages = rng.randint(1, 2)
    streams: list[bytes] = []
    for page in range(n_pages):
        ops: list[bytes] = []
        for y in sorted(rng.sample(range(80, 720), rng.randint(2, 4)), reverse=True):
            sent = _sentence(rng, "en", rng.randint(4, 12))
            ops.append(b"BT /F1 11 Tf 72 %d Td (%s) Tj ET" % (y, _pdf_escape(sent)))
        if page == 0:
            _typ, value = _pii_values(rng, "en")[0]
            ops.append(b"BT /F1 11 Tf 72 40 Td (ref %s) Tj ET" % _pdf_escape(value))
        streams.append(b"\n".join(ops))

    objects: list[bytes] = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pages))
        + b"] /Count %d >> endobj" % n_pages,
    ]
    for i in range(n_pages):
        objects.append(
            b"%d 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R >> endobj" % (3 + i, 3 + n_pages + i)
        )
    for i, stream in enumerate(streams):
        data = zlib.compress(stream)
        objects.append(
            b"%d 0 obj << /Filter /FlateDecode /Length %d >> stream\n"
            % (3 + n_pages + i, len(data))
            + data
            + b"\nendstream endobj"
        )
    return b"%PDF-1.4\n" + b"\n".join(objects) + b"\n%%EOF\n"


def _real_cid_pdf_payload(rng: random.Random) -> bytes:
    """A genuine ``%PDF-1.4`` with a Type0/Identity-H CID font and a
    ToUnicode CMap — the layout real CJK PDFs use.  Show strings carry
    2-byte glyph codes in hex strings; minipdf decodes them through the
    CMap (kernels/minipdf.py parse_tounicode), mirroring what the reference
    gets from fitz for free (handlers/pdf.py:24-34)."""
    import zlib

    sents = [_sentence(rng, "zh", rng.randint(4, 10)) for _ in range(rng.randint(2, 4))]
    _typ, value = _pii_values(rng, "zh")[0]
    sents.append(f"聯絡{value}")
    chars = sorted({c for s in sents for c in s})
    code_of = {c: i + 1 for i, c in enumerate(chars)}

    bfchars = b" ".join(
        b"<%04X> <%s>" % (code_of[c], c.encode("utf-16-be").hex().upper().encode())
        for c in chars
    )
    cmap_body = (
        b"/CIDInit /ProcSet findresource begin\nbegincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"%d beginbfchar\n" % len(chars) + bfchars + b"\nendbfchar\n"
        b"endcmap\nend\n"
    )
    packed_cmap = zlib.compress(cmap_body)

    ops: list[bytes] = []
    for sent, y in zip(sents, sorted(rng.sample(range(80, 720), len(sents)), reverse=True)):
        codes = b"".join(b"%04X" % code_of[c] for c in sent)
        ops.append(b"BT /F1 11 Tf 72 %d Td <%s> Tj ET" % (y, codes))
    stream = zlib.compress(b"\n".join(ops))

    objects = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj",
        b"4 0 obj << /Filter /FlateDecode /Length %d >> stream\n" % len(stream)
        + stream
        + b"\nendstream endobj",
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Graft-Identity-H "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >> endobj",
        b"6 0 obj << /Filter /FlateDecode /Length %d >> stream\n" % len(packed_cmap)
        + packed_cmap
        + b"\nendstream endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objects) + b"\n%%EOF\n"


def synthesize_page(row_id: int, seed: int = 42, *, mega_every: int = 0) -> dict:
    """One deterministic page row."""
    rng = random.Random((seed << 32) ^ row_id)
    lang = "zh" if rng.random() < 0.7 else "en"
    site = rng.randint(0, 999)
    url = f"https://site{site}.example/{lang}/doc{row_id}"
    ts = _EPOCH_US + row_id * 1_000_000

    kind = rng.random()
    is_mega = mega_every > 0 and row_id % mega_every == 0 and row_id > 0
    if kind < 0.05:
        # half the PDF slice is genuine %PDF-1.4 (minipdf route: simple
        # Latin fonts for en, CID/Type0 + ToUnicode for zh), half the
        # deterministic faux-PDF format
        if kind < 0.025:
            html: bytes = _real_pdf_payload(rng) if lang == "en" else _real_cid_pdf_payload(rng)
        else:
            html = _pdf_payload(rng, lang)
    elif kind < 0.07:  # ~2%: CSV payload routed by the .csv url suffix
        url += ".csv"
        header = "name,phone,note" if lang == "en" else "姓名,電話,備註"
        rows = []
        for _ in range(rng.randint(1, 4)):
            typ, value = _pii_values(rng, lang)[0]
            rows.append(f"{_sentence(rng, lang, 2)},{value},{_sentence(rng, lang, 3)}")
        html = ("\n".join([header] + rows) + "\n").encode("utf-8")
    else:
        page = _html_page(rng, lang, f"site{site} doc{row_id}", scale=40 if is_mega else 1)
        raw = page.encode("utf-8")
        if kind < 0.09:  # ~2%: inject malformed UTF-8 bytes mid-document
            cut = len(raw) // 2
            raw = raw[:cut] + b"\xff\xfe\xfa" + raw[cut:]
        html = raw

    text = None
    if rng.random() < 0.30:
        text = " ".join(_sentence(rng, lang, rng.randint(8, 20)) for _ in range(rng.randint(1, 3)))
        if rng.random() < 0.5:
            typ, value = _pii_values(rng, lang)[0]
            text = f"{text} {value}"

    return {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


def synthesize_pages_table(row_ids, seed: int = 42, *, mega_every: int = 0) -> pa.Table:
    """Arrow table for a batch of row ids (usable directly in map_batches)."""
    rows = [synthesize_page(int(i), seed, mega_every=mega_every) for i in row_ids]
    return pa.Table.from_pydict(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def pages_dataset(n: int, seed: int = 42, *, mega_every: int = 0):
    """Lazy Ray Dataset of n synthetic pages (distributed generation)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return synthesize_pages_table(batch["id"].to_pylist(), seed, mega_every=mega_every)

    return rd.range(n).map_batches(gen, batch_format="pyarrow", batch_size=512)


def ensure_pages_parquet(out_dir: str, n: int, seed: int = 42, *, mega_every: int = 0) -> str:
    """Materialize the pages table to parquet once (idempotent, for benches)."""
    import os

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    pages_dataset(n, seed, mega_every=mega_every).write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write(f"n={n} seed={seed}\n")
    return out_dir
