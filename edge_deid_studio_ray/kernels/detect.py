"""Regex PII detection + composite conflict resolution.

Reproduces the semantics of the reference detectors
(/root/reference/src/deid_pipeline/pii/detectors/regex_detector.py:23-89 and
composite.py:35-106) as pure functions.  Differences by design:

- Rules are compiled ONCE from a config snapshot (per worker, memoized on the
  rules-file path) instead of the reference's per-call mtime hot-reload — on a
  multi-node cluster every task must see one immutable rule set.
- Entities are plain dicts ``{"span": (start, end), "type", "score",
  "source"}`` with **Python code-point offsets** (not UTF-8 bytes), matching
  the reference entity contract (pii/utils/base.py:6-28).
"""

from __future__ import annotations

import re
from functools import lru_cache
from pathlib import Path
from typing import Any

import yaml

from ..config import DEFAULT_PRIORITY, ENTITY_PRIORITY, OVERLAP_THRESHOLD

Entity = dict[str, Any]


def _parse_flags(spec: str) -> int:
    """Resolve ``"IGNORECASE|MULTILINE"``-style flag strings to re flags."""
    flags = 0
    for name in spec.split("|"):
        name = name.strip().upper()
        if hasattr(re, name):
            flags |= getattr(re, name)
    return flags


def load_rules(path: str | Path) -> list[tuple[str, str, int]]:
    """Parse a YAML rule file into ordered (type, pattern, flags) triples.

    Accepts the three rule shapes of the reference loader
    (regex_detector.py:31-47): list-of-dicts, list-of-strings, single string.
    YAML mapping insertion order is preserved — match emission order depends
    on it.
    """
    with open(path, encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}

    triples: list[tuple[str, str, int]] = []
    for typ, body in raw.items():
        if isinstance(body, list) and all(isinstance(i, dict) for i in body):
            rule_list = body
        elif isinstance(body, list) and all(isinstance(i, str) for i in body):
            rule_list = [{"pattern": b} for b in body]
        elif isinstance(body, str):
            rule_list = [{"pattern": body}]
        else:
            continue
        for rule in rule_list:
            flags = _parse_flags(rule["flags"]) if "flags" in rule else 0
            triples.append((typ, rule["pattern"], flags))
    return triples


@lru_cache(maxsize=16)
def compile_rules(path: str) -> tuple[tuple[str, re.Pattern[str]], ...]:
    """Compile a rule file once per worker process (keyed by path)."""
    compiled: list[tuple[str, re.Pattern[str]]] = []
    for typ, pattern, flags in load_rules(path):
        try:
            compiled.append((typ, re.compile(pattern, flags)))
        except re.error:
            continue
    return tuple(compiled)


def regex_detect(text: str, patterns: tuple[tuple[str, re.Pattern[str]], ...]) -> list[Entity]:
    """Emit entities in (rule-order, match-position) order.

    Matches regex_detector.py:79-89: one pass of ``finditer`` per rule,
    ``score=1.0, source="regex"``.
    """
    entities: list[Entity] = []
    for typ, pattern in patterns:
        for match in pattern.finditer(text):
            entities.append(
                {"span": (match.start(), match.end()), "type": typ, "score": 1.0, "source": "regex"}
            )
    return entities


def _priority(entity_type: str, priorities: dict[str, int]) -> int:
    return priorities.get(entity_type, DEFAULT_PRIORITY)


def _pick_winner(a: Entity, b: Entity, priorities: dict[str, int]) -> Entity:
    """Tie-break: priority → score → shorter source string → first.

    Semantics of composite.py:86-102.
    """
    ap, bp = _priority(a["type"], priorities), _priority(b["type"], priorities)
    if ap != bp:
        return a if ap > bp else b
    if a["score"] != b["score"]:
        return a if a["score"] > b["score"] else b
    a_src, b_src = a.get("source", ""), b.get("source", "")
    if len(a_src) != len(b_src):
        return a if len(a_src) < len(b_src) else b
    return a


def resolve_conflicts(
    entities: list[Entity],
    priorities: dict[str, int] | None = None,
) -> list[Entity]:
    """Sequential overlap resolution against the *last kept* entity.

    Exact semantics of composite.py:35-84: stable sort by span start; an
    incoming entity overlapping the last kept one by
    ``overlap / min(len) > 0.5`` replaces it iff it wins the tie-break,
    otherwise both are kept.  The "compare only against the last kept"
    sequentiality is part of the byte-identity contract.
    """
    if not entities:
        return []
    priorities = priorities if priorities is not None else ENTITY_PRIORITY

    def span_of(e: Entity) -> tuple[int, int]:
        s, t = e["span"]
        return int(s), int(t)

    resolved: list[Entity] = []
    for entity in sorted(entities, key=lambda e: span_of(e)[0]):
        if not resolved:
            resolved.append(entity)
            continue
        last = resolved[-1]
        last_start, last_end = span_of(last)
        cur_start, cur_end = span_of(entity)
        if cur_start >= last_end:
            resolved.append(entity)
            continue
        overlap = max(0, min(last_end, cur_end) - cur_start)
        ratio = overlap / min(max(1, last_end - last_start), max(1, cur_end - cur_start))
        if ratio <= OVERLAP_THRESHOLD:
            resolved.append(entity)
            continue
        if _pick_winner(last, entity, priorities) is entity:
            resolved[-1] = entity
    return resolved
