"""WARC → pages-table source (Common-Crawl native format).

Parses WARC/1.0-1.1 files (the format Common Crawl publishes) into the
engine's pages schema ``(url, warc_ts, html, text, lang)`` without external
dependencies:

- records are split on WARC header blocks (``WARC/1.x`` … CRLFCRLF, payload
  of ``Content-Length`` bytes, CRLFCRLF separator);
- only ``WARC-Type: response`` (and ``conversion``) records yield rows;
- for response records carrying an HTTP envelope, the HTTP headers are
  stripped so ``html`` holds the raw body bytes;
- ``WARC-Date`` (ISO-8601, e.g. 2026-01-01T00:00:00Z) → ``warc_ts``
  microseconds; ``WARC-Target-URI`` → ``url``.

Dataset integration streams whole WARC files as binary blobs
(``read_binary_files``) and explodes them in a ``map_batches`` stage — one
task per file, which matches how Common-Crawl segments are sized (~1 GB).
Both whole-file gzip and real CC-style per-record gzip members decompress
through the same path (stdlib ``gzip.decompress`` iterates concatenated
members).
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone
from typing import Any, Iterator

import pyarrow as pa

from .pages import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"


def _parse_warc_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    lines = block.split(b"\r\n")
    for line in lines[1:]:  # line 0 is the WARC/1.x version line
        if b":" not in line:
            continue
        key, _, value = line.partition(b":")
        headers[key.strip().decode("latin-1").lower()] = value.strip().decode("latin-1")
    return headers


def _strip_http_envelope(payload: bytes) -> bytes:
    """Drop the HTTP response header block when present (response records)."""
    if payload[:5] in (b"HTTP/", b"http/"):
        sep = payload.find(_CRLF2)
        if sep != -1:
            return payload[sep + len(_CRLF2):]
    return payload


def _warc_date_to_us(value: str) -> int:
    try:
        stamp = datetime.fromisoformat(value.replace("Z", "+00:00"))
        return int(stamp.astimezone(timezone.utc).timestamp() * 1_000_000)
    except ValueError:
        return 0


def iter_warc_records(raw: bytes) -> Iterator[dict[str, Any]]:
    """Yield ``{url, warc_ts, html}`` rows from one WARC file's bytes."""
    if raw[:2] == b"\x1f\x8b":  # whole-file (or member-concatenated) gzip
        raw = gzip.decompress(raw)

    pos = 0
    n = len(raw)
    while pos < n:
        head_start = raw.find(b"WARC/", pos)
        if head_start == -1:
            break
        head_end = raw.find(_CRLF2, head_start)
        if head_end == -1:
            break
        headers = _parse_warc_headers(raw[head_start:head_end])
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload_start = head_end + len(_CRLF2)
        payload = raw[payload_start : payload_start + length]
        pos = payload_start + length

        if headers.get("warc-type") in ("response", "conversion"):
            url = headers.get("warc-target-uri")
            if url:
                yield {
                    "url": url,
                    "warc_ts": _warc_date_to_us(headers.get("warc-date", "")),
                    "html": _strip_http_envelope(payload),
                }


def warc_batch_to_pages(batch: pa.Table, *, default_lang: str = "en") -> pa.Table:
    """map_batches stage: rows from ``read_binary_files`` (bytes + path) →
    pages-schema rows."""
    rows: list[dict[str, Any]] = []
    for blob in batch["bytes"].to_pylist():
        rows.extend(iter_warc_records(blob or b""))
    return pa.Table.from_pydict(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([None] * len(rows), pa.string()),
            "lang": pa.array([default_lang] * len(rows), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def read_warc(paths: str | list[str], *, default_lang: str = "en"):
    """Lazy pages Dataset from WARC file(s)."""
    import ray.data as rd

    from functools import partial

    ds = rd.read_binary_files(paths)
    return ds.map_batches(
        partial(warc_batch_to_pages, default_lang=default_lang),
        batch_format="pyarrow",
        batch_size=1,  # one WARC file per task; records explode inside
    )


# -- fixture builder (tests / demos) ----------------------------------------


def build_warc_bytes(records: list[dict[str, Any]], *, gzipped: bool = False) -> bytes:
    """Serialize ``{url, date, body, http}`` records into a WARC file."""
    out = bytearray()
    for rec in records:
        body: bytes = rec["body"]
        if rec.get("http", True):
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
        else:
            payload = body
        headers = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {rec['url']}\r\n".encode()
            + f"WARC-Date: {rec.get('date', '2026-01-01T00:00:00Z')}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
        )
        out += headers + b"\r\n" + payload + b"\r\n\r\n"
    raw = bytes(out)
    return gzip.compress(raw) if gzipped else raw
