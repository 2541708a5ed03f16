"""PII markup / placeholder / masked-pair kernels (training-data side).

Pure restatements of the reference training modules:
- placeholders (training/placeholders.py:10-76): `<TYPE>` placeholder regex,
  canonicalization, right-to-left span→placeholder replacement;
- pii_markup (training/pii_markup.py:12-98): XML `<PII type='X'>v</PII>` and
  bracket `[X]v[/X]` block extraction, span masking;
- masked_pairs (training/masked_pairs.py:43-153): whitespace-token diff of an
  (original, masked) pair via SequenceMatcher opcodes → gold entities,
  1:1-or-merged span policy, (start,end,type) dedup;
- rewriter (training/rewriter.py:36-99): deterministic placeholder fill and
  punctuation noise injection.
"""

from __future__ import annotations

import random
import re
from difflib import SequenceMatcher
from typing import Any

from .canonical import canonicalize_entity_type
from .replace import fallback_generate

PLACEHOLDER_RE = re.compile(r"([<\[{])([A-Za-z_]+?)(?:_?\d+)?([>\]}])")
PLACEHOLDER_TOKEN_RE = re.compile(r"[<\[{]([A-Za-z_]+?)(?:_?\d+)?[>\]}]")

XML_PII_RE = re.compile(r"<PII\s+type=['\"]([A-Za-z0-9_]+)['\"]\s*>(.*?)</PII>", flags=re.DOTALL)
BRACKET_PII_RE = re.compile(r"\[([A-Za-z0-9_]+)\](.*?)\[/\1\]", flags=re.DOTALL)

# masked-pair placeholder → canonical type (subset map of the reference)
PLACEHOLDER_TYPE_MAP: dict[str, str] = {
    "PER": "NAME", "PERSON": "NAME", "NAME": "NAME",
    "EMAIL": "EMAIL", "EMAIL_ADDRESS": "EMAIL",
    "PHONE": "PHONE", "PHONE_NUMBER": "PHONE", "MOBILE": "PHONE", "TEL": "PHONE",
    "ADDRESS": "ADDRESS", "LOCATION": "ADDRESS", "LOC": "ADDRESS", "GPE": "ADDRESS",
    "ORG": "ORGANIZATION", "ORGANIZATION": "ORGANIZATION",
    "ID": "ID", "SSN": "ID",
    "PASSPORT": "PASSPORT", "MEDICAL_ID": "MEDICAL_ID",
    "UNIFIED_BUSINESS_NO": "UNIFIED_BUSINESS_NO",
}


def contains_cjk(text: str) -> bool:
    return any(0x4E00 <= ord(ch) <= 0x9FFF for ch in text)


# -- placeholders -----------------------------------------------------------


def canonicalize_placeholder_text(text: str, *, unknown_label: str = "PII") -> str:
    def repl(match: re.Match[str]) -> str:
        left, raw_type, right = match.group(1), match.group(2), match.group(3)
        mapped = canonicalize_entity_type(raw_type, unknown_label=unknown_label)
        return f"{left}{mapped or unknown_label}{right}"

    return PLACEHOLDER_RE.sub(repl, text or "")


def replace_spans_with_placeholders(
    text: str, entities: list[dict[str, Any]], *, unknown_label: str = "PII"
) -> str:
    """Replace entity spans with `<CANONICAL_TYPE>` placeholders, splicing
    right-to-left so offsets stay valid."""
    if not entities:
        return text
    spans: list[tuple[int, int, str]] = []
    for ent in entities:
        span = ent.get("span")
        if not span:
            continue
        start, end = int(span[0]), int(span[1])
        if start < 0 or end <= start or end > len(text):
            continue
        ent_type = canonicalize_entity_type(ent.get("type"), unknown_label=unknown_label)
        if not ent_type:
            continue
        spans.append((start, end, str(ent_type)))
    if not spans:
        return text
    spans.sort(key=lambda x: (x[0], x[1]), reverse=True)
    out = text
    for start, end, ent_type in spans:
        out = out[:start] + f"<{ent_type}>" + out[end:]
    return out


# -- PII markup -------------------------------------------------------------


def detect_markup_format(text: str) -> str | None:
    raw = str(text or "")
    if XML_PII_RE.search(raw):
        return "xml"
    if BRACKET_PII_RE.search(raw):
        return "bracket"
    return None


def extract_pii_blocks(text: str, *, fmt: str | None = None) -> list[dict[str, Any]]:
    """Extract PII-marked blocks as dicts (pii_type, value, value_span,
    block_span); auto-detects the markup when fmt is None."""
    raw = str(text or "")
    resolved = fmt or detect_markup_format(raw)
    if resolved is None:
        return []
    regex = XML_PII_RE if resolved == "xml" else BRACKET_PII_RE
    blocks: list[dict[str, Any]] = []
    for match in regex.finditer(raw):
        blocks.append(
            {
                "pii_type": str(match.group(1) or "").strip(),
                "value": str(match.group(2) or ""),
                "value_span": (int(match.start(2)), int(match.end(2))),
                "block_span": (int(match.start(0)), int(match.end(0))),
            }
        )
    return blocks


def mask_spans(text: str, spans: list[tuple[int, int]], *, placeholder: str = "") -> str:
    raw = str(text or "")
    safe = [
        (int(s), int(e))
        for s, e in spans
        if not (int(s) < 0 or int(e) <= int(s) or int(e) > len(raw))
    ]
    if not safe:
        return raw
    safe.sort(key=lambda x: (x[0], x[1]), reverse=True)
    out = raw
    for start, end in safe:
        out = out[:start] + str(placeholder) + out[end:]
    return out


def mask_pii_blocks(text: str, blocks: list[dict[str, Any]], *, placeholder: str = "") -> str:
    return mask_spans(str(text or ""), [b["block_span"] for b in blocks], placeholder=placeholder)


# -- masked-pair span recovery ----------------------------------------------


def tokenize_whitespace(text: str) -> list[tuple[str, int, int]]:
    return [(m.group(0), m.start(), m.end()) for m in re.finditer(r"\S+", text)]


def parse_placeholder_type(token: str) -> str | None:
    match = PLACEHOLDER_TOKEN_RE.search(token)
    if not match:
        return None
    raw = match.group(1).strip().upper()
    if not raw:
        return None
    return PLACEHOLDER_TYPE_MAP.get(raw, raw)


def extract_entities_from_masked_pair(
    original_text: str,
    masked_text: str,
    *,
    language: str = "en",
    source: str = "masked_pair",
) -> list[dict[str, Any]]:
    """Recover gold spans from an (original, masked) pair.

    ``replace`` opcode blocks become entities: per-token when the original
    token count equals the placeholder count, otherwise one merged span
    typed by the single placeholder type (or "PII" when mixed).
    """
    original_tokens = tokenize_whitespace(original_text)
    masked_tokens = tokenize_whitespace(masked_text)
    matcher = SequenceMatcher(
        a=[t[0] for t in original_tokens], b=[t[0] for t in masked_tokens], autojunk=False
    )
    entities: list[dict[str, Any]] = []
    for tag, i1, i2, j1, j2 in matcher.get_opcodes():
        if tag != "replace" or i1 >= i2:
            continue
        placeholder_types = [
            parsed
            for tok in masked_tokens[j1:j2]
            if (parsed := parse_placeholder_type(tok[0]))
        ]
        if not placeholder_types:
            continue
        if (i2 - i1) == len(placeholder_types):
            for offset, entity_type in enumerate(placeholder_types):
                _, start, end = original_tokens[i1 + offset]
                entities.append(_gold(entity_type, start, end, original_text, language, source))
            continue
        unique_types = sorted(set(placeholder_types))
        entity_type = unique_types[0] if len(unique_types) == 1 else "PII"
        start = original_tokens[i1][1]
        end = original_tokens[i2 - 1][2]
        entities.append(_gold(entity_type, start, end, original_text, language, source))
    return _dedupe(entities)


def _gold(entity_type: str, start: int, end: int, text: str, language: str, source: str) -> dict[str, Any]:
    return {
        "type": str(entity_type),
        "span": (start, end),
        "text": text[start:end],
        "confidence": 1.0,
        "score": 1.0,
        "source": source,
        "language": language,
    }


def _dedupe(entities: list[dict[str, Any]]) -> list[dict[str, Any]]:
    seen: set[tuple[int, int, str]] = set()
    out: list[dict[str, Any]] = []
    for ent in entities:
        span, ent_type = ent.get("span"), ent.get("type")
        if not span or not ent_type:
            continue
        key = (int(span[0]), int(span[1]), str(ent_type))
        if key in seen:
            continue
        seen.add(key)
        out.append(ent)
    return out


# -- rewriter ---------------------------------------------------------------

PUNCT_SWAP: dict[str, str] = {
    "，": ",", ",": "，", "。": ".", ".": "。",
    "：": ":", ":": "：", "；": ";", ";": "；",
}


def fill_placeholders_with_fake_values(
    text: str, *, context_hash: str, unknown_entity_type: str = "PII", locale: str = "zh_TW"
) -> str:
    """Fill `<TYPE>` placeholders with deterministic fake values; the i-th
    placeholder's identity is ``f"{raw_type}:{i}"`` (rewriter.py:36-70)."""
    raw = str(text or "")
    matches = list(PLACEHOLDER_RE.finditer(raw))
    if not matches:
        return raw
    parts: list[str] = []
    cursor = 0
    for idx, match in enumerate(matches):
        parts.append(raw[cursor : match.start()])
        raw_type = str(match.group(2) or "")
        ent_type = canonicalize_entity_type(raw_type, unknown_label=unknown_entity_type) or unknown_entity_type
        parts.append(fallback_generate(str(ent_type), f"{raw_type}:{idx}", str(context_hash), locale))
        cursor = match.end()
    parts.append(raw[cursor:])
    return "".join(parts)


def make_noisy(
    text: str,
    rng: random.Random,
    *,
    punct_prob: float = 0.35,
    space_prob: float = 0.25,
    dup_prob: float = 0.08,
) -> str:
    """Punctuation-swap/space/dup noise (rewriter.py:73-99 semantics)."""
    out: list[str] = []
    for ch in str(text or ""):
        if ch in PUNCT_SWAP and rng.random() < float(punct_prob):
            ch = PUNCT_SWAP[ch]
        out.append(ch)
        if ch in PUNCT_SWAP and rng.random() < float(space_prob):
            out.append(" ")
        if ch in PUNCT_SWAP and rng.random() < float(dup_prob):
            out.append(ch)
    noisy = "".join(out)
    noisy = noisy.replace("  ", " ") if rng.random() < 0.5 else noisy.replace(" ", "  ")
    return noisy.strip()
