"""De-identification evaluation kernels.

Pure restatements of /root/reference/src/deid_pipeline/training/deid_eval.py:
leak-recall (:129-144), SequenceMatcher similarity (:147-150), regex-proxy
type consistency (:153-181), 3-gram repetition (:243-255), format compliance
(:184-206) and the per-example/aggregate report shapes (:209-292).  The
corpus-level aggregation is distributed in stages/quality.py.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher
from typing import Any

from .canonical import canonicalize_entity_type
from .markup import mask_pii_blocks

TYPE_PATTERNS: dict[str, re.Pattern[str]] = {
    "EMAIL": re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    "PHONE": re.compile(r"(?:\+?\d{1,3}[-\s]?)?(?:0?9\d{8}|\d{2,4}[-\s]?\d{3,4}[-\s]?\d{3,4})"),
    "ID": re.compile(r"[A-Z][12]\d{8}"),
    "UNIFIED_BUSINESS_NO": re.compile(r"\b\d{8}\b"),
    "BANK_ACCOUNT": re.compile(r"\b\d{10,20}\b"),
    "CREDIT_CARD": re.compile(r"\b(?:\d[ -]*?){13,19}\b"),
    "LICENSE_PLATE": re.compile(r"\b[A-Z]{2,3}-?\d{3,4}\b"),
    "PASSPORT": re.compile(r"\b[A-Z]{1,2}\d{7,8}\b"),
    "MEDICAL_ID": re.compile(r"\bM\d{7}\b"),
    "URL": re.compile(r"https?://[^\s]+"),
    "IP_ADDRESS": re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    "DATE": re.compile(r"\b\d{4}[-/]\d{1,2}[-/]\d{1,2}\b"),
}


def compute_pii_removal_recall(pii_values: list[str], prediction_text: str) -> tuple[float, int, int]:
    """(recall, removed, total): substring leak check per PII value."""
    pred = str(prediction_text or "")
    total = len(pii_values)
    if total == 0:
        return 1.0, 0, 0
    removed = sum(1 for v in pii_values if str(v or "") and str(v) not in pred)
    return removed / total, removed, total


def sequence_similarity(a: str, b: str) -> float:
    return float(SequenceMatcher(None, str(a or ""), str(b or "")).ratio())


def compute_type_consistency(
    pii_blocks: list[dict[str, Any]], prediction_text: str, *, unknown_label: str = "PII"
) -> tuple[float, dict[str, dict[str, int]]]:
    """Macro regex-count consistency proxy: found/expected per canonical type."""
    expected: dict[str, int] = {}
    for block in pii_blocks:
        canon = canonicalize_entity_type(block["pii_type"], unknown_label=unknown_label) or unknown_label
        expected[str(canon)] = expected.get(str(canon), 0) + 1

    details: dict[str, dict[str, int]] = {}
    scores: list[float] = []
    for pii_type, exp_count in expected.items():
        if pii_type not in TYPE_PATTERNS:
            continue
        found = len(TYPE_PATTERNS[pii_type].findall(str(prediction_text or "")))
        details[pii_type] = {"expected": int(exp_count), "found": int(found)}
        if exp_count <= 0:
            continue
        scores.append(min(1.0, found / exp_count))
    if not scores:
        return 1.0, details
    return sum(scores) / len(scores), details


def repetition_3gram_rate(text: str) -> float:
    raw = str(text or "")
    if len(raw) < 3:
        return 0.0
    grams = [raw[i : i + 3] for i in range(len(raw) - 2)]
    counts: dict[str, int] = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    repeated = sum(v for v in counts.values() if v > 1)
    return repeated / len(grams)


def check_format_compliance(prediction_text: str, banned_phrases: list[str]) -> tuple[bool, list[str]]:
    text = str(prediction_text or "").strip()
    if not text:
        return False, ["<EMPTY>"]
    lowered = text.lower()
    triggered: list[str] = []
    for needle in ["input:", "output:", "analysis:", "explanation:", "step", "reason:"]:
        if needle in lowered:
            triggered.append(needle)
    if "<pii" in lowered or "[/" in lowered:
        triggered.append("<PII>/<[/...]>")
    for phrase in banned_phrases:
        p = str(phrase or "").strip()
        if p and p.lower() in lowered:
            triggered.append(p)
    return len(triggered) == 0, triggered


def evaluate_prediction(
    example_id: str,
    input_text: str,
    prediction_text: str,
    *,
    pii_blocks: list[dict[str, Any]],
    banned_phrases: list[str],
) -> dict[str, Any]:
    """Per-example report row (ExampleReport shape, flattened to a dict)."""
    pii_values = [b["value"] for b in pii_blocks if str(b["value"] or "").strip()]
    recall, removed, total = compute_pii_removal_recall(pii_values, prediction_text)

    masked_input = " ".join(mask_pii_blocks(input_text, pii_blocks, placeholder="").split())
    pred_clean = " ".join(str(prediction_text or "").split())
    sim = sequence_similarity(masked_input, pred_clean) if masked_input else 1.0

    type_consistency, type_details = compute_type_consistency(pii_blocks, prediction_text)
    compliant, triggers = check_format_compliance(prediction_text, banned_phrases)

    return {
        "example_id": str(example_id),
        "pii_removal_recall": float(recall),
        "pii_total": int(total),
        "pii_leak_count": int(total - removed),
        "non_pii_similarity": float(sim),
        "over_rewrite_rate": float(1.0 - sim),
        "type_consistency": float(type_consistency),
        "repetition_3gram_rate": float(repetition_3gram_rate(prediction_text)),
        "format_compliant": bool(compliant),
    }


def aggregate_reports(rows: list[dict[str, Any]]) -> dict[str, Any]:
    """Corpus aggregate: leak rate = Σleaks/Σpii; plain means elsewhere."""
    if not rows:
        return {
            "count": 0,
            "pii_removal_recall": 1.0,
            "pii_leak_rate": 0.0,
            "over_rewrite_rate": 0.0,
            "type_consistency": 1.0,
            "repetition_3gram_rate": 0.0,
            "format_compliance_rate": 1.0,
        }
    total_pii = sum(int(r["pii_total"]) for r in rows)
    total_leaks = sum(int(r["pii_leak_count"]) for r in rows)

    def avg(key: str) -> float:
        return sum(float(r[key]) for r in rows) / len(rows)

    return {
        "count": len(rows),
        "pii_removal_recall": avg("pii_removal_recall"),
        "pii_total": int(total_pii),
        "pii_leak_count": int(total_leaks),
        "pii_leak_rate": (total_leaks / total_pii) if total_pii > 0 else 0.0,
        "over_rewrite_rate": avg("over_rewrite_rate"),
        "type_consistency": avg("type_consistency"),
        "repetition_3gram_rate": avg("repetition_3gram_rate"),
        "format_compliance_rate": sum(1.0 for r in rows if r["format_compliant"]) / len(rows),
    }
