"""Span-example validation + distribution summaries.

Pure restatement of /root/reference/src/deid_pipeline/training/quality.py:
``validate_span_example`` (:41-119) and ``summarize_numbers`` (:10-22).
The corpus-level report (analyze_span_examples, :122-178) is distributed in
stages/quality.py.
"""

from __future__ import annotations

import statistics
from typing import Any


def summarize_numbers(values: list[float]) -> dict[str, float]:
    if not values:
        return {"min": 0.0, "max": 0.0, "mean": 0.0, "p50": 0.0, "p95": 0.0}
    sorted_values = sorted(float(v) for v in values)
    return {
        "min": float(sorted_values[0]),
        "max": float(sorted_values[-1]),
        "mean": float(sum(sorted_values) / len(sorted_values)),
        "p50": float(statistics.median(sorted_values)),
        "p95": float(sorted_values[int(0.95 * (len(sorted_values) - 1))]),
    }


def _safe_span(span: Any) -> tuple[int, int] | None:
    if not span:
        return None
    if isinstance(span, (list, tuple)) and len(span) == 2:
        try:
            return int(span[0]), int(span[1])
        except (TypeError, ValueError):
            return None
    return None


def validate_span_example(text: str, entities: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Issue list per example: missing_type, invalid_span, span_out_of_bounds,
    empty_span, text_mismatch, overlap (same kinds/payloads as the
    reference)."""
    issues: list[dict[str, Any]] = []
    spans_with_indices: list[tuple[int, int, int]] = []

    for idx, ent in enumerate(entities):
        ent_type = ent.get("type")
        if not ent_type:
            issues.append({"kind": "missing_type", "entity_index": idx})

        span = _safe_span(ent.get("span"))
        if span is None:
            issues.append({"kind": "invalid_span", "entity_index": idx, "span": ent.get("span")})
            continue
        start, end = span
        if start < 0 or end < 0 or start > len(text) or end > len(text):
            issues.append(
                {
                    "kind": "span_out_of_bounds",
                    "entity_index": idx,
                    "type": ent_type,
                    "span": [start, end],
                    "text_len": len(text),
                }
            )
            continue
        if start >= end:
            issues.append(
                {"kind": "empty_span", "entity_index": idx, "type": ent_type, "span": [start, end]}
            )
            continue

        spans_with_indices.append((start, end, idx))

        provided = ent.get("text")
        if provided is not None and str(provided) != text[start:end]:
            issues.append(
                {"kind": "text_mismatch", "entity_index": idx, "type": ent_type, "span": [start, end]}
            )

    spans_with_indices.sort(key=lambda x: (x[0], x[1]))
    for (a_start, a_end, a_idx), (b_start, b_end, b_idx) in zip(
        spans_with_indices, spans_with_indices[1:]
    ):
        if b_start < a_end:
            issues.append(
                {
                    "kind": "overlap",
                    "entity_a_index": a_idx,
                    "entity_b_index": b_idx,
                    "span_a": [a_start, a_end],
                    "span_b": [b_start, b_end],
                }
            )
    return issues
