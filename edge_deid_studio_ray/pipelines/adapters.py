"""Offline dataset adapters (S11): token-NER (BIO) and masked-pair corpora
→ span-example Datasets.

Ray-native restatement of the reference adapters
(/root/reference/src/deid_pipeline/training/datasets.py:11-456) with the
network-gated ``datasets.load_dataset`` IO shell replaced by any Ray
Dataset source (``read_json`` / ``read_parquet`` of a downloaded dump) —
the *parsing* halves are identical:

- :func:`normalize_bio_tag` — BIO prefix preservation + canonical entity
  map (PER→NAME, LOC/GPE→ADDRESS, ORG→ORGANIZATION; datasets.py:11-17,68-79);
- tag ids → names via a label list (``WIKIANN_ID2LABEL`` default for
  wikiann-shaped dumps; datasets.py:19-27,175-187);
- :func:`token_ner_span_dataset` — BIO decode to character spans with
  separator-join offsets (iter_token_examples_to_span_examples,
  datasets.py:189-267);
- :func:`masked_pair_span_dataset` — (original, masked) → gold spans by
  placeholder diff with field-candidate inference
  (HuggingFaceMaskedTextAdapter.iter_span_examples, datasets.py:310-391).

Each is a ``map_batches`` stage: the decode distributes per batch, no
driver-side loops.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..kernels.markup import extract_entities_from_masked_pair
from .training_data import SPAN_ENTITY_STRUCT, _entities_to_arrow

CANONICAL_ENTITY_MAP: dict[str, str] = {
    "PER": "NAME",
    "PERSON": "NAME",
    "LOC": "ADDRESS",
    "GPE": "ADDRESS",
    "ORG": "ORGANIZATION",
}

WIKIANN_ID2LABEL: tuple[str, ...] = (
    "B-LOC",
    "B-ORG",
    "B-PER",
    "I-LOC",
    "I-ORG",
    "I-PER",
    "O",
)


def normalize_bio_tag(tag: str) -> str:
    """Normalize BIO tags to the canonical entity set (datasets.py:68-79)."""
    raw = (tag or "O").strip()
    if raw == "O":
        return "O"
    prefix = "B-" if raw.startswith("B-") else "I-" if raw.startswith("I-") else ""
    base = raw[len(prefix):] if prefix else raw
    mapped = CANONICAL_ENTITY_MAP.get(base, base)
    return f"{prefix}{mapped}" if prefix else mapped


def decode_bio_spans(
    tokens: list[str],
    tags: list[str],
    *,
    separator: str = " ",
    language: str = "en",
    source: str = "token_ner",
) -> tuple[str, list[dict[str, Any]]]:
    """BIO token example → (text, span entities).

    Exact semantics of iter_token_examples_to_span_examples
    (datasets.py:189-267): tokens joined by ``separator`` (offsets include
    the separators), a ``B-`` tag or a type change closes the running
    entity, trailing entities flush at end."""
    parts: list[str] = []
    token_spans: list[tuple[int, int]] = []
    cursor = 0
    for idx, token in enumerate(tokens):
        if idx:
            parts.append(separator)
            cursor += len(separator)
        start = cursor
        parts.append(token)
        cursor += len(token)
        token_spans.append((start, cursor))
    text = "".join(parts)

    entities: list[dict[str, Any]] = []
    cur_type: str | None = None
    cur_start: int | None = None
    cur_end: int | None = None

    def flush() -> None:
        if cur_type is not None and cur_start is not None and cur_end is not None:
            entities.append(
                {
                    "type": cur_type,
                    "span": (cur_start, cur_end),
                    "text": text[cur_start:cur_end],
                    "confidence": 1.0,
                    "score": 1.0,
                    "source": source,
                    "language": language,
                }
            )

    for tag, (tok_start, tok_end) in zip(tags, token_spans):
        if tag == "O":
            flush()
            cur_type = cur_start = cur_end = None
            continue
        prefix = "B" if tag.startswith("B-") else "I" if tag.startswith("I-") else ""
        ent_type = tag.split("-", 1)[-1] if "-" in tag else tag
        if prefix == "B" or cur_type != ent_type:
            flush()
            cur_type, cur_start, cur_end = ent_type, tok_start, tok_end
        else:
            cur_end = tok_end
    flush()
    return text, entities


def token_ner_span_dataset(
    ds,
    *,
    tokens_field: str = "tokens",
    tags_field: str = "ner_tags",
    tag_names: tuple[str, ...] | None = None,
    separator: str = " ",
    language: str = "en",
    source: str = "token_ner",
):
    """Token-NER rows (``tokens: list<str>``, ``tags: list<str|int>``) →
    span-example Dataset ``(text, entities)``.

    Integer tags are mapped through ``tag_names`` (raise if absent —
    datasets.py:196-200); every tag passes :func:`normalize_bio_tag`.
    Field fallback order matches the reference: the named field, then
    ``tokens`` / ``ner_tags`` / ``tags`` (datasets.py:135-147).
    """

    def decode(batch: pa.Table) -> pa.Table:
        cols = set(batch.schema.names)
        tf = tokens_field if tokens_field in cols else "tokens" if "tokens" in cols else None
        gf = (
            tags_field
            if tags_field in cols
            else "ner_tags"
            if "ner_tags" in cols
            else "tags"
            if "tags" in cols
            else None
        )
        if tf is None or gf is None:
            raise KeyError(
                f"Unable to infer token/tag fields from columns {sorted(cols)}"
            )
        texts: list[str] = []
        ents_out: list[list[dict[str, Any]]] = []
        for tokens, raw_tags in zip(batch[tf].to_pylist(), batch[gf].to_pylist()):
            if not raw_tags:
                continue
            if isinstance(raw_tags[0], str):
                tags_raw = [str(t) for t in raw_tags]
            else:
                if tag_names is None:
                    raise RuntimeError(
                        "Tag ids do not have an associated label mapping; pass tag_names"
                    )
                tags_raw = [tag_names[int(i)] for i in raw_tags]
            tags = [normalize_bio_tag(t) for t in tags_raw]
            text, entities = decode_bio_spans(
                [str(t) for t in tokens],
                tags,
                separator=separator,
                language=language,
                source=source,
            )
            texts.append(text)
            ents_out.append(_entities_to_arrow(entities))
        return pa.table(
            {
                "text": pa.array(texts, pa.string()),
                "entities": pa.array(ents_out, pa.list_(SPAN_ENTITY_STRUCT)),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")


ORIGINAL_FIELD_CANDIDATES = ("text", "original_text", "source", "input")
MASKED_FIELD_CANDIDATES = ("masked_text", "anonymized_text", "target", "output")


def masked_pair_span_dataset(
    ds,
    *,
    original_field_candidates: tuple[str, ...] = ORIGINAL_FIELD_CANDIDATES,
    masked_field_candidates: tuple[str, ...] = MASKED_FIELD_CANDIDATES,
    language: str = "en",
    source: str = "masked_pair",
):
    """(original, masked) rows → gold-span Dataset ``(text, entities)``.

    Field inference + row semantics of
    HuggingFaceMaskedTextAdapter.iter_span_examples (datasets.py:345-391):
    rows with empty original/masked or zero recovered entities are dropped.
    """

    def decode(batch: pa.Table) -> pa.Table:
        cols = set(batch.schema.names)
        of = next((c for c in original_field_candidates if c in cols), None)
        mf = next((c for c in masked_field_candidates if c in cols), None)
        if of is None or mf is None:
            raise KeyError(
                f"Unable to infer original/masked fields from columns {sorted(cols)}"
            )
        texts: list[str] = []
        ents_out: list[list[dict[str, Any]]] = []
        for original, masked in zip(batch[of].to_pylist(), batch[mf].to_pylist()):
            original = str(original or "")
            masked = str(masked or "")
            if not original or not masked:
                continue
            entities = extract_entities_from_masked_pair(
                original, masked, language=language, source=source
            )
            if not entities:
                continue
            texts.append(original)
            ents_out.append(_entities_to_arrow(entities))
        return pa.table(
            {
                "text": pa.array(texts, pa.string()),
                "entities": pa.array(ents_out, pa.list_(SPAN_ENTITY_STRUCT)),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")
