"""Ray Data stages for the fused extract→detect→replace pipeline.

One stateless ``map_batches`` stage (Arrow in / Arrow out) fuses the whole
per-document chain — the Ray-native restatement of ``DeidPipeline.process``
(SURVEY.md §3.1).  Regex rules compile once per worker process via the
``lru_cache`` in kernels/detect.py, so a stateless task stage is as cheap as
an actor pool here while staying elastic; an actor pool is reserved for
genuinely heavy state (stages/ner.py).

Span offsets ride along as Arrow ``list<struct>`` columns (the north-star
"character-offset span maps carried as Arrow list columns").
"""

from __future__ import annotations

import zlib
from typing import Any, Callable

import pyarrow as pa

from ..config import EngineConfig
from ..kernels.docpipe import process_document

ENTITY_STRUCT = pa.struct(
    [
        ("type", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("confidence", pa.float64()),
        ("source", pa.string()),
        ("text", pa.string()),
        # structural anchors (attach_segment_anchors, core/anchors.py:10-48);
        # null when the span is not fully inside one anchored segment
        ("page_index", pa.int32()),
        ("bbox", pa.list_(pa.int32())),  # 4 ints when present, null otherwise
        ("cell_address", pa.string()),
    ]
)

EVENT_STRUCT = pa.struct(
    [
        ("entity_type", pa.string()),
        ("original", pa.string()),
        ("replacement", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("source", pa.string()),
    ]
)

DEID_OUTPUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lang", pa.string()),
        ("pid", pa.int32()),
        ("route", pa.string()),
        ("error", pa.string()),
        ("extracted_text", pa.string()),
        ("context_hash", pa.string()),
        ("clean_text", pa.string()),
        ("entities", pa.list_(ENTITY_STRUCT)),
        ("events", pa.list_(EVENT_STRUCT)),
        ("n_spans", pa.int64()),
        ("n_chars", pa.int64()),
        ("n_bytes", pa.int64()),
        # per-stage wall timings (DeidResult.timings_ms analogue) — metrics,
        # never part of value-checked query outputs
        ("t_extract_ms", pa.float64()),
        ("t_detect_ms", pa.float64()),
        ("t_replace_ms", pa.float64()),
    ]
)


def url_pid(url: str, num_partitions: int) -> int:
    """Partition id = crc32(url) % P — stable across runs/nodes/platforms."""
    return zlib.crc32(url.encode("utf-8")) % num_partitions


def add_pid(batch: pa.Table, *, num_partitions: int) -> pa.Table:
    """Cheap first-map stage: attach the url-hash partition column.

    Runs before the expensive deid stage so checkpoint-resume can filter
    committed partitions early (state/manifest.py).
    """
    pids = pa.array(
        [url_pid(u, num_partitions) for u in batch["url"].to_pylist()], pa.int32()
    )
    return batch.append_column("pid", pids)


def make_deid_batch_fn(cfg: EngineConfig | None = None) -> Callable[[pa.Table], pa.Table]:
    """Build the fused deid batch transform (config captured in the closure)."""
    cfg = cfg or EngineConfig()

    def deid_batch(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        langs = batch["lang"].to_pylist()
        htmls = batch["html"].to_pylist() if "html" in batch.column_names else [None] * len(urls)
        texts = batch["text"].to_pylist() if "text" in batch.column_names else [None] * len(urls)
        if "pid" in batch.column_names:
            pids = batch["pid"].to_pylist()
        else:
            pids = [url_pid(u, cfg.num_partitions) for u in urls]

        out: dict[str, list[Any]] = {k: [] for k in DEID_OUTPUT_SCHEMA.names}
        for url, lang, html, text, pid in zip(urls, langs, htmls, texts, pids):
            row = process_document(html=html, text=text, url=url, lang=lang or "zh", cfg=cfg)
            out["url"].append(url)
            out["lang"].append(lang)
            out["pid"].append(pid)
            out["route"].append(row["route"])
            out["error"].append(row["error"])
            out["extracted_text"].append(row["extracted_text"])
            out["context_hash"].append(row["context_hash"])
            out["clean_text"].append(row["clean_text"])
            out["entities"].append(row["entities"])
            out["events"].append(row["events"])
            out["n_spans"].append(row["n_spans"])
            out["n_chars"].append(row["n_chars"])
            out["n_bytes"].append(row["n_bytes"])
            out["t_extract_ms"].append(row["t_extract_ms"])
            out["t_detect_ms"].append(row["t_detect_ms"])
            out["t_replace_ms"].append(row["t_replace_ms"])

        return pa.Table.from_pydict(out, schema=DEID_OUTPUT_SCHEMA)

    return deid_batch
