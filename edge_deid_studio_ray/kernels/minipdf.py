"""Minimal pure-Python parser for real ``%PDF-`` payloads.

The reference extracts PDFs with PyMuPDF ``page.get_text("blocks",
sort=True)`` (/root/reference/src/deid_pipeline/parser/handlers/pdf.py and
parser/text_extractor.py:110-185).  PyMuPDF is a C extension and absent from
this environment, so this module implements the subset needed for
machine-generated PDFs from first principles (PDF 32000-1 spec, public):

- sequential object scan (``N G obj … endobj``) that slices stream bodies by
  their numeric ``/Length`` — binary Flate data containing the bytes
  ``endstream``/``endobj`` can no longer truncate the scan (regex fallback
  only when /Length is absent or indirect);
- page-tree discovery (``/Type /Page`` with ``/Contents N 0 R``), MediaBox
  page height;
- content streams through the standard filter chains: /FlateDecode,
  /LZWDecode (MSB-first variable width, /EarlyChange), /ASCIIHexDecode,
  /ASCII85Decode, /RunLengthDecode — single names or arrays, in order;
- text operators inside BT…ET: ``Tf Tm Td TD T* TL Tj TJ ' "`` with literal
  ``(…)`` strings (escapes, nested parens, octal) and ``<hex>`` strings;
- CID/Type0 composite fonts: per-page ``/Resources → /Font`` resolution and
  ``/ToUnicode`` CMap decoding (bfchar + bfrange incl. array form,
  codespace-derived code width) — CJK PDFs whose show strings carry 2-byte
  glyph codes decode to Unicode without PyMuPDF;
- block semantics mirroring the reference's use of PyMuPDF: one block per
  BT…ET group, lines joined with ``"\\n"``, blocks sorted in reading order
  (page, top, left) with the y axis flipped to top-left origin using the
  page's MediaBox height; block bboxes are metric estimates from the
  tracked font size (0.6 em per ASCII char, 1 em per wide char, 1.2 em
  line height) — good enough for redaction rect planning, not typography.

Object streams (``/Type /ObjStm``, PDF 1.5+) are unpacked: member dict
objects (catalogs, page trees, fonts) inflate into the object table, so
modern-layout PDFs whose page dicts live in compressed object streams
still parse (content streams are never inside ObjStm, per spec).

Encrypted PDFs (Standard security handler) decrypt with the empty user
password: RC4 at /V 1|2 /R 2|3 and AES-128 (AESV2 crypt filter) at /V 4
/R 4 — the file key derives per spec §7.6.3 from /O, /P and the file /ID,
each stream decrypts with its per-object key (AES streams carry an IV
prefix + PKCS#7 padding; the AES core is pure Python, kernels/aes.py),
and ObjStm members unpack post-decryption.

AES-256 (/V 5 AESV3, revisions 5 and 6 incl. the algorithm-2.B iterated
hash) unwraps the file key from /U//UE with the empty user password.

Out of scope (flagged upstream as ``pdf_backend_unavailable`` when nothing
is extractable): real-password-protected documents, xref-stream
predictors, glyph-metric width programs.  Glyph bytes without
a ToUnicode CMap decode as latin-1 — correct for ASCII/WinAnsi
simple-font PDFs.
"""

from __future__ import annotations

import re
import zlib
from typing import Any

_OBJ_HEADER_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# (?!\d) pins the full number (no backtracking to a prefix digit run);
# the second lookahead rejects indirect references "/Length N 0 R"
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_KID_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

DEFAULT_PAGE_HEIGHT = 792.0  # US Letter, when no MediaBox is present


_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _scan_object_spans(raw: bytes) -> list[tuple[int, int, int, int]]:
    """Sequential top-level object scan: (objnum, header_start, body_start,
    end) spans, where ``end`` is one past the trailing ``endobj``.

    Stream bodies are skipped via the numeric ``/Length`` when present, so
    ``endobj``/``endstream`` byte sequences inside compressed data cannot
    misalign the scan; when /Length is absent or an indirect reference the
    scan falls back to searching for the keywords.
    """
    spans: list[tuple[int, int, int, int]] = []
    pos = 0
    n = len(raw)
    while True:
        hm = _OBJ_HEADER_RE.search(raw, pos)
        if hm is None:
            break
        body_start = hm.end()
        sm = _STREAM_START_RE.search(raw, body_start)
        em = raw.find(b"endobj", body_start)
        if sm is not None and (em == -1 or sm.start() < em):
            # object carries a stream: skip the body by /Length if numeric
            lm = _LENGTH_RE.search(raw, body_start, sm.start())
            data_start = sm.end()
            es = -1
            if lm:
                data_end = data_start + int(lm.group(1))
                if data_end <= n:
                    probe = raw.find(b"endstream", data_end)
                    # tolerate the EOL between data and the keyword only
                    if probe != -1 and probe - data_end <= 2:
                        es = probe
            if es == -1:
                es = raw.find(b"endstream", data_start)
            if es == -1:
                pos = body_start
                continue
            em = raw.find(b"endobj", es)
            end = (em + len(b"endobj")) if em != -1 else es + len(b"endstream")
        else:
            if em == -1:
                break
            end = em + len(b"endobj")
        spans.append((int(hm.group(1)), hm.start(), body_start, end))
        pos = end
    return spans


def _scan_objects(raw: bytes, decrypt_factory=None) -> dict[int, bytes]:
    """Top-level object table + unpacked ObjStm members.  One code path for
    plain and encrypted documents: ``decrypt_factory(objnum)`` (when given)
    decrypts each ObjStm stream before unpacking."""
    objects: dict[int, bytes] = {}
    for num, _hstart, body_start, end in _scan_object_spans(raw):
        body = raw[body_start:end]
        if body.endswith(b"endobj"):
            body = body[: -len(b"endobj")]
        # LAST definition wins: an incremental update appends a new revision
        # of the same object number, and the current revision is the one the
        # document means (first-wins would extract and redact stale content)
        objects[num] = body
    # PDF 1.5+ object streams (/Type /ObjStm): compressed member objects —
    # header is N (objnum, offset) integer pairs, bodies start at /First
    for num, body in list(objects.items()):
        if not re.search(rb"/Type\s*/ObjStm\b", body):
            continue
        data = _decode_stream(
            body, decrypt=decrypt_factory(num) if decrypt_factory else None
        )
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


def _raw_stream_span(body: bytes) -> tuple[int, int] | None:
    """(start, end) byte span of the stream DATA inside an object body —
    /Length-sliced when the length is numeric (binary-safe), keyword-search
    fallback otherwise."""
    sm = _STREAM_START_RE.search(body)
    if sm is None:
        return None
    data_start = sm.end()
    lm = _LENGTH_RE.search(body, 0, sm.start())
    if lm:
        data_end = data_start + int(lm.group(1))
        if data_end <= len(body):
            probe = body.find(b"endstream", data_end)
            if probe != -1 and probe - data_end <= 2:
                # the writer's single EOL before 'endstream' stays outside
                return data_start, data_end
    m = _STREAM_RE.search(body)
    if not m:
        return None
    return m.start(1), m.end(1)


_FILTER_NAMES_RE = re.compile(
    rb"/(FlateDecode|LZWDecode|ASCIIHexDecode|ASCII85Decode|RunLengthDecode|"
    rb"DCTDecode|JPXDecode|CCITTFaxDecode|JBIG2Decode|Crypt)"
)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes | None:
    """PDF LZWDecode: MSB-first variable-width codes (9→12 bits), clear
    table 256, EOD 257, code width bumps one code EARLY by default
    (/EarlyChange 1) — spec §7.4.4."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _run_length_decode(data: bytes) -> bytes | None:
    """PDF RunLengthDecode (spec §7.4.5): length byte < 128 → copy n+1
    literal bytes; 129..255 → repeat next byte 257-n times; 128 → EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:
            break
        if length < 128:
            out += data[i : i + length + 1]
            i += length + 1
        else:
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - length)
            i += 1
    return bytes(out)


def _apply_filters(data: bytes, head: bytes) -> bytes | None:
    """Run the stream dict's /Filter chain (single name or array, applied in
    order).  Image/crypt codecs (DCT/JPX/CCITT/JBIG2/Crypt) stop the chain —
    callers treat the stream as opaque."""
    import base64

    for name in _FILTER_NAMES_RE.findall(head):
        if name == b"FlateDecode":
            try:
                data = zlib.decompress(data)
            except zlib.error:
                return None
        elif name == b"LZWDecode":
            ec = re.search(rb"/EarlyChange\s+(\d+)", head)
            decoded = _lzw_decode(data, int(ec.group(1)) if ec else 1)
            if decoded is None:
                return None
            data = decoded
        elif name == b"ASCIIHexDecode":
            hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">", 1)[0])
            if len(hexdigits) % 2:
                hexdigits += b"0"
            data = bytes.fromhex(hexdigits.decode())
        elif name == b"ASCII85Decode":
            payload = data.split(b"~>", 1)[0]
            payload = re.sub(rb"\s", b"", payload)
            if payload.startswith(b"<~"):
                payload = payload[2:]
            try:
                data = base64.a85decode(payload)
            except ValueError:
                return None
        elif name == b"RunLengthDecode":
            decoded = _run_length_decode(data)
            if decoded is None:
                return None
            data = decoded
        else:  # image / crypt codecs: opaque
            return None
    return data


def _decode_stream(body: bytes, decrypt=None) -> bytes | None:
    span = _raw_stream_span(body)
    if span is None:
        return None
    data = body[span[0] : span[1]]
    if decrypt is not None:
        data = decrypt(data)
        if data is None:
            return None
    return _apply_filters(data, body[: span[0]])


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


# ---------------------------------------------------------------------------
# Standard security handler (RC4, /V 1|2, /R 2|3) — PDF 32000-1 §7.6.3
# ---------------------------------------------------------------------------

# the spec's 32-byte password padding string (public constant)
_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>")
_TRAILER_RE = re.compile(rb"trailer\b(.{0,1024}?)(?:startxref|%%EOF|\Z)", re.DOTALL)


def _find_encrypt_ref(raw: bytes) -> int | None:
    """Object number of the /Encrypt dict, looked up ONLY inside trailer
    dictionaries or ``/Type /XRef`` stream dicts (PDF 1.5+ keeps the
    trailer entries there) — an unencrypted document whose content merely
    contains the byte pattern ``/Encrypt N 0 R`` must not be treated as
    encrypted."""
    if b"/Encrypt" not in raw:  # fast path for the unencrypted majority
        return None
    num = None
    for tm in _TRAILER_RE.finditer(raw):
        em = _ENCRYPT_REF_RE.search(tm.group(1))
        if em:
            num = int(em.group(1))  # last trailer wins (incremental updates)
    if num is None:
        # cross-reference streams: the dict region (before the stream data)
        # of /Type /XRef objects carries /Encrypt
        for _n, _h, body_start, end in _scan_object_spans(raw):
            body = raw[body_start:end]
            sm = _STREAM_START_RE.search(body)
            head = body[: sm.start()] if sm else body
            if re.search(rb"/Type\s*/XRef\b", head):
                em = _ENCRYPT_REF_RE.search(head)
                if em:
                    num = int(em.group(1))
    return num


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (spec pseudocode; used only to DECRYPT standard-handler
    PDFs this engine is asked to extract/redact)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = byte ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _dict_string(body: bytes, key: bytes) -> bytes | None:
    """Read a string entry (``/O``, ``/U``) from a dict body — hex or
    literal form."""
    m = re.search(key + rb"\s*<([0-9A-Fa-f\s]+)>", body)
    if m:
        hexdigits = re.sub(rb"\s", b"", m.group(1))
        if len(hexdigits) % 2:
            hexdigits += b"0"
        return bytes.fromhex(hexdigits.decode())
    m = re.search(key + rb"\s*\(", body)
    if m:
        raw, _ = _parse_literal_string(body, m.end() - 1)
        return raw
    return None


def standard_file_key(
    encrypt_body: bytes, file_id: bytes, password: bytes = b""
) -> bytes | None:
    """Derive the file encryption key for the Standard security handler
    (algorithm 2 of the spec) — /V 1|2 (RC4) and /V 4 (/R 4, the AESV2 /
    CFM layout; same MD5 derivation with the /EncryptMetadata false
    marker).  Returns None for non-Standard filters or /V 5 (AESV3 uses
    the SHA-based algorithm, not implemented) — callers flag those
    unsupported."""
    import hashlib
    import struct

    if not re.search(rb"/Filter\s*/Standard\b", encrypt_body):
        return None
    vm = re.search(rb"/V\s+(\d+)", encrypt_body)
    rm = re.search(rb"/R\s+(\d+)", encrypt_body)
    pm = re.search(rb"/P\s+(-?\d+)", encrypt_body)
    version = int(vm.group(1)) if vm else 0
    revision = int(rm.group(1)) if rm else 2
    if version > 4 or revision > 4:
        return None  # /V 5 AESV3: SHA-2 handler not implemented
    o_entry = _dict_string(encrypt_body, rb"/O")
    if o_entry is None or pm is None:
        return None
    lm = re.search(rb"/Length\s+(\d+)", encrypt_body)
    n = (int(lm.group(1)) // 8) if (lm and revision >= 3) else 5
    # some writers emit /P in unsigned form (e.g. 4294963392 for -3904);
    # the key derivation packs the SIGNED 32-bit value
    perms = int(pm.group(1)) & 0xFFFFFFFF
    if perms > 0x7FFFFFFF:
        perms -= 1 << 32
    seed = (
        (password + _PW_PAD)[:32]
        + o_entry[:32]
        + struct.pack("<i", perms)
        + file_id
    )
    if revision >= 4 and re.search(rb"/EncryptMetadata\s+false", encrypt_body):
        seed += b"\xff\xff\xff\xff"  # spec algorithm 2 step f
    digest = hashlib.md5(seed).digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:n]).digest()
    return digest[:n]


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 algorithm 2.B (the /R 6 iterated hash): SHA-256 seed,
    then rounds of AES-128-CBC over (password+K+udata)x64 with a
    digest-size switch chosen by the ciphertext, until the exit rule."""
    import hashlib

    from .aes import cbc_encrypt

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k1, k[16:32], pad=False)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def standard_file_key_v5(encrypt_body: bytes, password: bytes = b"") -> bytes | None:
    """/V 5 (AESV3) file key with the EMPTY user password: validate against
    /U (hash + validation/key salts, /R 5 plain SHA-256 or /R 6 algorithm
    2.B), then unwrap the 256-bit file key from /UE with AES-256-CBC
    (zero IV, no padding).  Returns None when validation fails (a real
    user password) — callers flag the document unsupported."""
    import hashlib

    from .aes import cbc_decrypt

    rm = re.search(rb"/R\s+(\d+)", encrypt_body)
    revision = int(rm.group(1)) if rm else 6
    u_entry = _dict_string(encrypt_body, rb"/U")
    ue_entry = _dict_string(encrypt_body, rb"/UE")
    if u_entry is None or ue_entry is None or len(u_entry) < 48:
        return None
    u_hash, vsalt, ksalt = u_entry[:32], u_entry[32:40], u_entry[40:48]
    if revision >= 6:
        check = _hash_2b(password, vsalt)
        ikey = _hash_2b(password, ksalt)
    else:  # R5
        check = hashlib.sha256(password + vsalt).digest()
        ikey = hashlib.sha256(password + ksalt).digest()
    if check != u_hash:
        return None  # not the empty user password
    file_key = cbc_decrypt(ikey, ue_entry[:32], iv=b"\x00" * 16, unpad=False)
    # a truncated /UE (< one AES block) decrypts to b'' — surface it as
    # "can't decrypt" (pdf_backend_unavailable) instead of letting the
    # empty key explode later inside the AES key schedule
    return file_key if len(file_key) == 32 else None


def encryption_method(encrypt_body: bytes) -> str:
    """"rc4" or "aes" per the crypt-filter method (/CFM AESV2 → AES-128-CBC
    with IV-prefixed, padded streams; everything at /V ≤ 2 is RC4)."""
    if re.search(rb"/CFM\s*/AESV3\b", encrypt_body):
        return "aes256"
    return "aes" if re.search(rb"/CFM\s*/AESV2\b", encrypt_body) else "rc4"


def object_decryptor(file_key: bytes, num: int, gen: int, method: str = "rc4"):
    """Per-object decryptor (algorithm 1): object key = MD5(file_key +
    objnum[3 LE] + gen[2 LE] [+ b"sAlT" for AES]) truncated to key+5 bytes;
    AESV2 streams carry a 16-byte IV prefix and PKCS#7 padding."""
    import hashlib

    if method == "aes256":
        # /V 5: streams encrypt with the FILE key directly (no per-object
        # derivation, spec §7.6.3.2 note)
        from .aes import cbc_decrypt

        return lambda data: cbc_decrypt(file_key, data)
    salt = b"sAlT" if method == "aes" else b""
    obj_key = hashlib.md5(
        file_key + num.to_bytes(3, "little") + gen.to_bytes(2, "little") + salt
    ).digest()[: min(len(file_key) + 5, 16)]
    if method == "aes":
        from .aes import cbc_decrypt

        return lambda data: cbc_decrypt(obj_key, data)
    return lambda data: rc4(obj_key, data)


def _load_document(raw: bytes):
    """(objects, per-object stream decryptor factory or None).

    Detects ``/Encrypt`` in the trailer; for the RC4 Standard handler the
    file key is derived with the EMPTY user password (the common
    owner-locked case) and ObjStm members are unpacked post-decryption.
    Unsupported handlers (AES) leave streams undecryptable — the caller
    yields no pages and the row is flagged upstream."""
    enc_num = _find_encrypt_ref(raw)
    if enc_num is None:
        return _scan_objects(raw), None

    # gen numbers participate in per-object key derivation
    gens: dict[int, int] = {}
    for num, hstart, body_start, _end in _scan_object_spans(raw):
        if num not in gens:
            hm = re.match(rb"(\d+)\s+(\d+)\s+obj", raw[hstart:body_start])
            gens[num] = int(hm.group(2)) if hm else 0
    plain = _scan_objects(raw)  # enough to read the (unencrypted) Encrypt dict
    enc_body = plain.get(enc_num)
    idm = _ID_RE.search(raw)
    file_id = bytes.fromhex(idm.group(1).decode()) if idm else b""
    vm = re.search(rb"/V\s+(\d+)", enc_body or b"")
    if vm and int(vm.group(1)) >= 5:
        file_key = standard_file_key_v5(enc_body or b"")
    else:
        file_key = standard_file_key(enc_body or b"", file_id) if enc_body else None
    if file_key is None:
        return plain, "unsupported"
    method = encryption_method(enc_body or b"")

    def decrypt_for(num: int):
        return object_decryptor(file_key, num, gens.get(num, 0), method)

    return _scan_objects(raw, decrypt_for), decrypt_for


# ---------------------------------------------------------------------------
# ToUnicode CMaps (CID/Type0 composite fonts)
# ---------------------------------------------------------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>|(\[)|(\])")
_CODESPACE_RE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>\s*<[0-9A-Fa-f]+>", re.DOTALL
)
_TOUNICODE_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")


def _utf16be_hex(hexdigits: bytes) -> str:
    if len(hexdigits) % 2:
        hexdigits += b"0"
    return bytes.fromhex(hexdigits.decode()).decode("utf-16-be", "replace")


def parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """ToUnicode CMap stream → (code → unicode string map, code byte width).

    Handles ``bfchar`` pairs and ``bfrange`` in both forms (incrementing
    destination and explicit destination array); destination hex is UTF-16BE
    per the spec.  Code width comes from the codespace range (2 for the
    Identity-H CMaps real CJK PDFs use)."""
    cmap: dict[int, str] = {}
    width = 2
    m = _CODESPACE_RE.search(data)
    if m:
        width = max(1, len(m.group(1)) // 2)
    for sect in _BFCHAR_RE.findall(data):
        toks = [t[0] for t in _HEXTOK_RE.findall(sect) if t[0]]
        for src, dst in zip(toks[0::2], toks[1::2]):
            cmap[int(src, 16)] = _utf16be_hex(dst)
    for sect in _BFRANGE_RE.findall(data):
        toks = _HEXTOK_RE.findall(sect)
        i = 0
        while i + 2 < len(toks) or (i + 2 == len(toks) and toks[i][0] and toks[i + 1][0]):
            if not (toks[i][0] and toks[i + 1][0]):
                i += 1
                continue
            lo, hi = int(toks[i][0], 16), int(toks[i + 1][0], 16)
            i += 2
            if i < len(toks) and toks[i][1]:  # '[' — explicit destination list
                i += 1
                dsts: list[bytes] = []
                while i < len(toks) and not toks[i][2]:
                    if toks[i][0]:
                        dsts.append(toks[i][0])
                    i += 1
                i += 1  # ']'
                for k, dst in enumerate(dsts[: hi - lo + 1]):
                    cmap[lo + k] = _utf16be_hex(dst)
            elif i < len(toks) and toks[i][0]:
                dst = toks[i][0]
                i += 1
                dst_len = len(dst) + (len(dst) % 2)
                base = int(dst, 16)
                for k in range(hi - lo + 1):
                    cmap[lo + k] = _utf16be_hex(b"%0*x" % (dst_len, base + k))
            else:
                break
    return cmap, width


def _page_fonts(
    page_body: bytes,
    objects: dict[int, bytes],
    decrypt_factory=None,
    cmap_cache: dict[int, tuple[dict[int, str], int] | None] | None = None,
) -> dict[bytes, tuple[dict[int, str], int]]:
    """Resolve the page's ``/Resources → /Font`` entries to ToUnicode maps:
    ``{font name: (code→str map, code byte width)}``.  Fonts without a
    ToUnicode CMap are omitted (their strings decode latin-1).

    ``cmap_cache`` memoizes parsed CMaps by their object number for the
    duration of one document parse — a 500-page CJK PDF typically shares
    ONE font across every page, and inflating + parsing the same CMap
    stream per page made the parse O(pages × cmap)."""
    res = page_body
    rm = _RESOURCES_REF_RE.search(page_body)
    if rm:
        res = objects.get(int(rm.group(1)), b"")
    fm = _FONT_DICT_RE.search(res)
    fonts: dict[bytes, tuple[dict[int, str], int]] = {}
    if not fm:
        return fonts
    for entry in _FONT_ENTRY_RE.finditer(fm.group(1)):
        fobj = objects.get(int(entry.group(2)))
        if fobj is None:
            continue
        tm = _TOUNICODE_REF_RE.search(fobj)
        if not tm:
            continue
        cmap_num = int(tm.group(1))
        if cmap_cache is not None and cmap_num in cmap_cache:
            parsed = cmap_cache[cmap_num]
            if parsed is not None:
                fonts[entry.group(1)] = parsed
            continue
        parsed = None
        cmap_body = objects.get(cmap_num)
        if cmap_body is not None:
            data = _decode_stream(
                cmap_body,
                decrypt=decrypt_factory(cmap_num) if decrypt_factory else None,
            )
            if data is not None:
                cmap, width = parse_tounicode(data)
                if cmap:
                    parsed = (cmap, width)
        if cmap_cache is not None:
            cmap_cache[cmap_num] = parsed
        if parsed is not None:
            fonts[entry.group(1)] = parsed
    return fonts


def _decode_codes(data: bytes, cmap: dict[int, str], width: int) -> str:
    out: list[str] = []
    whole = (len(data) // width) * width
    for i in range(0, whole, width):
        code = int.from_bytes(data[i : i + width], "big")
        mapped = cmap.get(code)
        if mapped is None:
            mapped = chr(code) if code < 0x110000 else "�"
        out.append(mapped)
    for b in data[whole:]:
        out.append(chr(b))
    return "".join(out)


# ---------------------------------------------------------------------------
# Content-stream text extraction
# ---------------------------------------------------------------------------

_ESCAPES = {
    b"n"[0]: 0x0A,
    b"r"[0]: 0x0D,
    b"t"[0]: 0x09,
    b"b"[0]: 0x08,
    b"f"[0]: 0x0C,
    b"("[0]: 0x28,
    b")"[0]: 0x29,
    b"\\"[0]: 0x5C,
}


def _parse_literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(…)`` literal starting at the '('; returns (raw bytes with
    escapes resolved, next_i)."""
    out = bytearray()
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
                out.append(int(digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(c)
        i += 1
    return bytes(out), i


def _parse_hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    end = data.find(b">", i)
    if end < 0:
        end = len(data)
    hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : end])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    return bytes.fromhex(hexdigits.decode()), end + 1


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_NAME_RE = re.compile(rb"/[^\s\[\]<>()/%]*")


def _est_line_width(text: str, size: float) -> float:
    """Metric estimate: 0.6 em per ASCII glyph, 1 em per wide (CJK) glyph."""
    return size * sum(0.6 if ord(ch) < 0x2E80 else 1.0 for ch in text)


def _extract_text_blocks(
    content: bytes,
    page_height: float,
    fonts: dict[bytes, tuple[dict[int, str], int]] | None = None,
) -> list[dict[str, Any]]:
    """BT…ET groups → block dicts {text, top, left, right, bottom}
    (top-left origin)."""
    fonts = fonts or {}
    blocks: list[dict[str, Any]] = []
    i, n = 0, len(content)
    in_text = False
    # text state (translation components drive line layout; font size drives
    # the bbox estimate)
    x = y = 0.0
    line_x = line_y = 0.0
    leading = 12.0
    font_size = 12.0
    cur_cmap: tuple[dict[int, str], int] | None = None
    last_name: bytes | None = None
    stack: list[float] = []
    lines: list[tuple[float, float, list[str], float]] = []  # (y, x, parts, size)
    cur: list[str] | None = None

    def decode(raw: bytes) -> str:
        if cur_cmap is not None:
            return _decode_codes(raw, cur_cmap[0], cur_cmap[1])
        return raw.decode("latin-1")

    def start_line() -> None:
        nonlocal cur
        cur = []
        lines.append((y, x, cur, font_size))

    while i < n:
        c = content[i : i + 1]
        if c in b" \t\r\n":
            i += 1
            continue
        if c == b"(":
            raw, i = _parse_literal_string(content, i)
            if in_text:
                if cur is None:
                    start_line()
                stack.append(float("nan"))
                cur.append(decode(raw))  # type: ignore[union-attr]
            continue
        if c == b"<" and content[i : i + 2] != b"<<":
            raw, i = _parse_hex_string(content, i)
            if in_text:
                if cur is None:
                    start_line()
                stack.append(float("nan"))
                cur.append(decode(raw))  # type: ignore[union-attr]
            continue
        if c == b"<":  # dict
            i += 2
            continue
        if c == b"/":
            m = _NAME_RE.match(content, i)
            last_name = m.group(0)[1:] if m else None
            i = m.end() if m else i + 1
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
                    (ly, lx, "".join(p), sz)
                    for ly, lx, p, sz in lines
                    if "".join(p).strip()
                ]
                if parts:
                    top = page_height - max(p[0] for p in parts)
                    left = min(p[1] for p in parts)
                    size = max(p[3] for p in parts)
                    right = left + max(_est_line_width(p[2], p[3]) for p in parts)
                    bottom = top + 1.2 * size * len(parts)
                    # top-to-bottom within the block = descending PDF y
                    parts.sort(key=lambda p: (-p[0], p[1]))
                    blocks.append(
                        {
                            "text": "\n".join(p[2] for p in parts),
                            "top": top,
                            "left": left,
                            "right": right,
                            "bottom": bottom,
                        }
                    )
            in_text = False
            cur = None
        elif op == b"Tf":
            if nums:
                font_size = nums[-1] or font_size
            cur_cmap = fonts.get(last_name) if last_name else None
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
    objects, decrypt_factory = _load_document(raw)
    if decrypt_factory == "unsupported":
        # encrypted with a handler this parser cannot run (AES) — callers
        # flag the row pdf_backend_unavailable instead of yielding pages
        # whose content streams would decode to garbage
        return [], 0
    pages = _page_objects(objects)
    specs: list[tuple[int, float, float, dict[str, Any]]] = []
    cmap_cache: dict[int, tuple[dict[int, str], int] | None] = {}
    for page_index, (content_num, page_body) in enumerate(pages):
        body = objects.get(content_num)
        if body is None:
            continue
        content = _decode_stream(
            body, decrypt=decrypt_factory(content_num) if decrypt_factory else None
        )
        if content is None:
            continue
        mb = _MEDIABOX_RE.search(page_body)
        page_height = float(mb.group(4)) if mb else DEFAULT_PAGE_HEIGHT
        fonts = _page_fonts(page_body, objects, decrypt_factory, cmap_cache)
        for block in _extract_text_blocks(content, page_height, fonts):
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
                            max(int(block["right"]), int(block["left"]) + 1),
                            max(int(block["bottom"]), int(block["top"]) + 1),
                        ),
                    },
                )
            )
    specs.sort(key=lambda s: (s[0], s[1], s[2]))
    return [s[3] for s in specs], len(pages)
