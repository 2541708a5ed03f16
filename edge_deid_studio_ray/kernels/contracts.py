"""Canonical entity / event contracts.

Pure-function restatement of
/root/reference/src/deid_pipeline/core/contracts.py:81-140.
"""

from __future__ import annotations

import hashlib
from typing import Any

Entity = dict[str, Any]


def context_hash(text: str) -> str:
    """Stable per-document hash: sha256 hex of the UTF-8 encoded text.

    Semantics of ExtractedDocument.context_hash (handlers/base.py:54-58),
    including ``errors="replace"`` encoding of lone surrogates.
    """
    return hashlib.sha256(text.encode("utf-8", errors="replace")).hexdigest()


def replacement_key(entity_type: str, original: str) -> str:
    """Replacement-map key (contracts.py:137-140)."""
    return f"{entity_type}:{original}"


def normalize_entity(
    entity: dict[str, Any],
    *,
    language: str,
    source: str | None = None,
    text: str | None = None,
) -> Entity:
    """Coerce a raw detector entity into the canonical contract.

    Semantics of contracts.py:81-134: int span tuple, unified
    confidence/score, defaulted source/language, best-effort ``text``
    sliced from the span, int-coerced anchors.
    """
    if "type" not in entity:
        raise KeyError("Entity is missing required field: type")

    normalized: Entity = {"type": str(entity["type"])}

    raw_span = entity.get("span")
    if raw_span is not None:
        start, end = raw_span
        normalized["span"] = (int(start), int(end))

    if "confidence" in entity:
        conf = float(entity["confidence"])
    elif "score" in entity:
        conf = float(entity["score"])
    else:
        conf = 0.0
    normalized["confidence"] = conf
    normalized["score"] = conf

    normalized["source"] = str(source or entity.get("source") or "unknown")
    normalized["language"] = str(entity.get("language") or language)

    if text is not None and "span" in normalized and "text" not in entity:
        s, e = normalized["span"]
        normalized["text"] = text[s:e]
    elif "text" in entity:
        normalized["text"] = str(entity["text"])

    if entity.get("page_index") is not None:
        normalized["page_index"] = int(entity["page_index"])
    if entity.get("bbox") is not None:
        left, top, right, bottom = entity["bbox"]
        normalized["bbox"] = (int(left), int(top), int(right), int(bottom))
    if entity.get("cell") is not None:
        normalized["cell"] = dict(entity["cell"])
    if isinstance(entity.get("metadata"), dict):
        normalized["metadata"] = dict(entity["metadata"])

    return normalized
