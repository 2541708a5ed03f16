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


@lru_cache(maxsize=256)
def _required_literals(pattern_str: str, flags: int) -> tuple[str, ...]:
    """Literal alternation every match of the pattern MUST contain, or ()
    when no safe constraint exists.

    Used as a result-preserving prescreen: if none of the returned
    substrings occur in the text, ``finditer`` cannot match, so the (often
    catastrophically backtracking) scan can be skipped.  Derived from the
    sre parse tree, so it is exact, not heuristic:

    - concatenation: any single element's constraint suffices (the longest
      minimum-length candidate is chosen);
    - alternation: usable only if EVERY branch yields a constraint (union);
    - repeats: usable only when min count >= 1;
    - IGNORECASE (global or inline) disables the prescreen entirely —
      substring membership would need case folding to stay exact.

    Only constraints whose members are all length >= 2 or non-ASCII are
    kept (a single ASCII char almost never excludes a document, so the
    check would be pure overhead), capped at 8 alternatives.
    """
    if flags & re.IGNORECASE:
        return ()
    try:
        import re._parser as sre

        tree = sre.parse(pattern_str, flags)
    except Exception:
        return ()

    LITERAL = sre.LITERAL
    BRANCH = sre.BRANCH
    SUBPATTERN = sre.SUBPATTERN
    MAX_REPEAT, MIN_REPEAT = sre.MAX_REPEAT, sre.MIN_REPEAT

    def walk(seq) -> set[str] | None:
        candidates: list[set[str]] = []
        run = ""
        for op, arg in seq:
            if op is LITERAL:
                run += chr(arg)
                continue
            if run:
                candidates.append({run})
                run = ""
            if op is BRANCH:
                branch_sets = [walk(b) for b in arg[1]]
                if all(bs for bs in branch_sets):
                    merged: set[str] = set()
                    for bs in branch_sets:
                        merged |= bs
                    candidates.append(merged)
            elif op is SUBPATTERN:
                group, add_flags, _del_flags, sub = arg
                if add_flags & re.IGNORECASE:
                    return None  # inline (?i:...) — bail on the whole pattern
                got = walk(sub)
                if got:
                    candidates.append(got)
            elif op in (MAX_REPEAT, MIN_REPEAT):
                mn, _mx, sub = arg
                if mn >= 1:
                    got = walk(sub)
                    if got:
                        candidates.append(got)
            # IN / ANY / AT / assertions / categories contribute nothing
        if run:
            candidates.append({run})
        usable = [
            c
            for c in candidates
            if len(c) <= 8
            and all(len(s) >= 2 or any(ord(ch) > 127 for ch in s) for s in c)
        ]
        if not usable:
            return None
        return max(usable, key=lambda c: (min(len(s) for s in c), -len(c)))

    got = walk(tree)
    return tuple(sorted(got)) if got else ()


def regex_detect(text: str, patterns: tuple[tuple[str, re.Pattern[str]], ...]) -> list[Entity]:
    """Emit entities in (rule-order, match-position) order.

    Matches regex_detector.py:79-89: one pass of ``finditer`` per rule,
    ``score=1.0, source="regex"``.  A required-literal prescreen
    (:func:`_required_literals`) skips rules that provably cannot match —
    identical output, and it removes the dominant cost of the unanchored
    backtracking address rules on documents without their trigger
    substrings.
    """
    entities: list[Entity] = []
    for typ, pattern in patterns:
        lits = _required_literals(pattern.pattern, pattern.flags)
        if lits and not any(l in text for l in lits):
            continue
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
