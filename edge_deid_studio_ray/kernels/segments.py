"""Segment assembly: specs → (text, segments) with running offsets.

Pure restatement of build_document_from_segments
(/root/reference/src/deid_pipeline/handlers/base.py:61-105): separator is
inserted *between* segments (default ``"\\n"``), offsets are code-point
positions into the joined text.  Also the per-cell CSV extraction of
handlers/csv.py:14-39.
"""

from __future__ import annotations

import csv
import io
from typing import Any

Segment = dict[str, Any]


def build_text_from_segments(
    specs: list[dict[str, Any]],
    separator: str = "\n",
) -> tuple[str, list[Segment]]:
    """Join segment specs; returns (text, segments-with-offsets)."""
    parts: list[str] = []
    segments: list[Segment] = []
    cursor = 0
    for idx, spec in enumerate(specs):
        seg_text = spec.get("text") or ""
        start = cursor
        end = start + len(seg_text)
        segments.append(
            {
                "segment_id": idx,
                "start": start,
                "end": end,
                "text": seg_text,
                "page_index": spec.get("page_index"),
                "bbox": spec.get("bbox"),
                "cell": spec.get("cell"),
            }
        )
        parts.append(seg_text)
        cursor = end
        if idx != len(specs) - 1:
            parts.append(separator)
            cursor += len(separator)
    return "".join(parts), segments


def csv_to_segments(payload: str) -> list[dict[str, Any]]:
    """One segment per CSV cell with R{row}C{col} cell refs (csv.py:14-39)."""
    specs: list[dict[str, Any]] = []
    reader = csv.reader(io.StringIO(payload, newline=""))
    for row_idx, row in enumerate(reader, start=1):
        for col_idx, value in enumerate(row, start=1):
            specs.append(
                {
                    "text": str(value or ""),
                    "cell": {
                        "sheet": "csv",
                        "row": row_idx,
                        "col": col_idx,
                        "address": f"R{row_idx}C{col_idx}",
                    },
                }
            )
    return specs or [{"text": ""}]
