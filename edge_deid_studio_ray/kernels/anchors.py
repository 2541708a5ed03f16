"""Segment-anchor attachment (entity span → page/bbox/cell).

Pure restatement of /root/reference/src/deid_pipeline/core/anchors.py:10-48.
Segments here are plain dicts ``{"segment_id", "start", "end", "page_index",
"bbox", "cell"}`` so they round-trip through Arrow list<struct> columns.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Any

Entity = dict[str, Any]
Segment = dict[str, Any]


def attach_segment_anchors(entities: list[Entity], segments: list[Segment]) -> None:
    """Attach anchors in place; only when a span is fully inside one segment."""
    if not entities or not segments:
        return

    ordered = sorted(segments, key=lambda s: s["start"])
    starts = [seg["start"] for seg in ordered]

    for entity in entities:
        span = entity.get("span")
        if not span:
            continue
        start, end = span
        if start is None or end is None:
            continue
        idx = bisect_right(starts, int(start)) - 1
        if idx < 0:
            continue
        segment = ordered[idx]
        if not (segment["start"] <= start < segment["end"]):
            continue
        if end > segment["end"]:
            continue
        if segment.get("page_index") is not None:
            entity["page_index"] = int(segment["page_index"])
        if segment.get("bbox") is not None:
            entity["bbox"] = tuple(segment["bbox"])
        if segment.get("cell") is not None:
            entity["cell"] = dict(segment["cell"])
