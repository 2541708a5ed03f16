"""Training-data pipelines: synthetic corpus, dataset mix, placeholder /
masked-pair corpora.

Ray-native restatement of the reference training orchestration
(/root/reference/src/deid_pipeline/training/mix.py:34-160, synthetic.py,
placeholders.py, masked_pairs.py, io.py):

- synthetic corpus generation distributes over ``ray.data.range`` (each task
  regenerates its id-slice deterministically — same (seed, index) → same
  example as the reference's sequential loop);
- mix = ``union`` (+ per-source ``limit``) + seeded ``random_shuffle`` —
  the reference's concat+cap+shuffle (mix.py:34-46, O2/O3);
- span datasets persist as JSONL (``write_json``) or parquet with the entity
  list<struct> schema (S10).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..kernels.markup import (
    extract_entities_from_masked_pair,
    fill_placeholders_with_fake_values,
    replace_spans_with_placeholders,
)
from ..kernels.synthetic import generate_synthetic_span_examples

SPAN_ENTITY_STRUCT = pa.struct(
    [
        ("type", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("text", pa.string()),
        ("confidence", pa.float64()),
        ("source", pa.string()),
        ("language", pa.string()),
    ]
)

SPAN_EXAMPLE_SCHEMA = pa.schema(
    [
        ("example_id", pa.int64()),
        ("text", pa.string()),
        ("entities", pa.list_(SPAN_ENTITY_STRUCT)),
    ]
)


def _entities_to_arrow(entities: list[dict[str, Any]]) -> list[dict[str, Any]]:
    return [
        {
            "type": e["type"],
            "start": int(e["span"][0]),
            "end": int(e["span"][1]),
            "text": e.get("text", ""),
            "confidence": float(e.get("confidence", 1.0)),
            "source": e.get("source", "synthetic"),
            "language": e.get("language", "zh"),
        }
        for e in entities
    ]


def synthetic_span_dataset(n: int, *, seed: int = 0, language: str = "zh"):
    """Distributed deterministic synthetic span corpus.

    Each task generates examples [lo, hi) by running the seeded generator up
    to its slice — per-example cost is tiny so regeneration beats shipping
    state; ids are globally stable.
    """
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        lo, hi = min(ids), max(ids) + 1
        # generate the prefix once per task, keep only [lo, hi)
        examples = generate_synthetic_span_examples(
            num_examples=hi, seed=seed, language=language
        )[lo:hi]
        return pa.Table.from_pydict(
            {
                "example_id": pa.array(ids, pa.int64()),
                "text": pa.array([ex["text"] for ex in examples], pa.string()),
                "entities": pa.array(
                    [_entities_to_arrow(ex["entities"]) for ex in examples],
                    pa.list_(SPAN_ENTITY_STRUCT),
                ),
            },
            schema=SPAN_EXAMPLE_SCHEMA,
        )

    return rd.range(n).map_batches(gen, batch_format="pyarrow", batch_size=1024)


def mix_datasets(sources: list[tuple[Any, int]], *, seed: int = 0, shuffle: bool = True):
    """Mix span datasets: per-source cap (``limit``) + union + seeded global
    shuffle — mix.py:34-46 semantics distributed.

    Order caveat: the shuffle permutation is seed-deterministic, but the
    *observed* row order is only stable when
    ``DataContext.execution_options.preserve_order`` is True (streaming
    execution otherwise emits blocks in completion order).  Set it when the
    mixed dataset's byte order matters (e.g. writing a training JSONL).
    """
    capped = [ds.limit(cap) if cap > 0 else ds for ds, cap in sources]
    combined = capped[0]
    for ds in capped[1:]:
        combined = combined.union(ds)
    if shuffle:
        combined = combined.random_shuffle(seed=seed)
    return combined


def placeholder_corpus(ds, *, context_seed: str = "corpus", locale: str = "zh_TW"):
    """Span dataset → GPT-2-safe placeholder corpus + deterministic refill.

    Adds ``masked_text`` (spans → `<TYPE>`) and ``filled_text`` (placeholders
    → deterministic fake values), per placeholders.py:39-76 / rewriter.py:36-70.
    """

    def transform(batch: pa.Table) -> pa.Table:
        masked_list: list[str] = []
        filled_list: list[str] = []
        for text, ents in zip(batch["text"].to_pylist(), batch["entities"].to_pylist()):
            text = text or ""
            span_ents = [
                {"type": e["type"], "span": (e["start"], e["end"])} for e in (ents or [])
            ]
            masked = replace_spans_with_placeholders(text, span_ents)
            masked_list.append(masked)
            filled_list.append(
                fill_placeholders_with_fake_values(
                    masked, context_hash=context_seed, locale=locale
                )
            )
        return batch.append_column(
            "masked_text", pa.array(masked_list, pa.string())
        ).append_column("filled_text", pa.array(filled_list, pa.string()))

    return ds.map_batches(transform, batch_format="pyarrow")


def masked_pair_recovery(ds, *, language: str = "en"):
    """(original, masked) pairs → gold span entities (masked_pairs.py:43-137;
    CPU-heavy SequenceMatcher diff distributes per batch)."""

    def recover(batch: pa.Table) -> pa.Table:
        out = []
        for original, masked in zip(
            batch["original_text"].to_pylist(), batch["masked_text"].to_pylist()
        ):
            ents = extract_entities_from_masked_pair(
                original or "", masked or "", language=language
            )
            out.append(_entities_to_arrow(ents))
        return batch.append_column("entities", pa.array(out, pa.list_(SPAN_ENTITY_STRUCT)))

    return ds.map_batches(recover, batch_format="pyarrow")
