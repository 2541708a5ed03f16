"""Token-alignment kernels: span corpora → token-classification labels.

Parity port of the reference's training/tokenization.py:8-48
(``build_bio_label_list``, ``align_entities_to_tokens``) — the step that
turns span-annotated corpora into BIO label ids for token-classifier
training, including the HF convention that special tokens (offset ``(0,
0)``) are labeled ``-100`` (ignored by the loss).

The alignment is a pure per-row kernel: inside ``map_batches`` each
document's (entities, offset_mapping) pair produces its label-id list with
no cross-row state, so the stage scales embarrassingly.  The whitespace
tokenizer below supplies offset mappings when no model tokenizer is
present; a real HF ``return_offsets_mapping=True`` encoding slots into the
same ``align_entities_to_tokens`` call unchanged.
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Sequence

_TOKEN_RE = re.compile(r"\S+")

IGNORE_LABEL_ID = -100  # HF ignore-index for special tokens (reference :31)


def build_bio_label_list(entity_types: Iterable[str]) -> list[str]:
    """``["O", "B-t1", "I-t1", ...]`` over the sorted distinct types
    (reference training/tokenization.py:8-16, exact semantics: falsy types
    dropped, duplicates collapsed, sorted)."""
    types = sorted({str(t) for t in entity_types if t})
    labels = ["O"]
    for t in types:
        labels.append(f"B-{t}")
        labels.append(f"I-{t}")
    return labels


def align_entities_to_tokens(
    *,
    entities: Sequence[dict[str, Any]],
    offset_mapping: Sequence[tuple[int, int]],
    label_to_id: dict[str, int],
) -> list[int]:
    """Entity spans + token offsets → label ids (reference
    training/tokenization.py:19-48, exact semantics):

    - ``(0, 0)`` tokens (CLS/SEP/PAD) → ``-100``;
    - a token is labeled iff it lies FULLY inside an entity span; the first
      token at the entity start gets ``B-``, later ones ``I-``;
    - first matching entity wins (document entity order);
    - unknown labels fall back to ``O``'s id.
    """
    labels: list[int] = []
    for tok_start, tok_end in offset_mapping:
        if tok_start == tok_end == 0:
            labels.append(IGNORE_LABEL_ID)
            continue
        label = "O"
        for ent in entities:
            span = ent.get("span")
            ent_type = ent.get("type")
            if not span or not ent_type:
                continue
            ent_start, ent_end = span
            if tok_start >= ent_start and tok_end <= ent_end:
                prefix = "B-" if tok_start == ent_start else "I-"
                label = f"{prefix}{ent_type}"
                break
        labels.append(int(label_to_id.get(label, label_to_id["O"])))
    return labels


def whitespace_offset_mapping(text: str, *, special_tokens: bool = True) -> list[tuple[int, int]]:
    """Whitespace-token offset mapping in the HF shape: one ``(start, end)``
    per ``\\S+`` run, wrapped in ``(0, 0)`` CLS/SEP markers when
    ``special_tokens`` (the shape ``return_offsets_mapping=True`` yields)."""
    toks = [(m.start(), m.end()) for m in _TOKEN_RE.finditer(text or "")]
    if special_tokens:
        return [(0, 0)] + toks + [(0, 0)]
    return toks
