"""Composite web-text training-data pipeline.

The end-to-end flow a Common-Crawl-scale corpus actually runs, composed from
the engine's stages — extract/deid, text analysis, filtering, dedup — as ONE
lazy Dataset chain (no stage materializes the corpus):

    pages → extract+deid (fused map)
          → text stats (lang-id, quality score)              [map]
          → quality filter (score ≥ threshold, chars ≥ min)  [map-side]
          → exact dedup on extracted-text hash               [1 groupby]
          → partitioned parquet + per-shard manifest counters

Counters record what every stage dropped (no silent attrition): rows in,
dropped by quality, dropped as duplicates, rows out.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..config import EngineConfig
from ..functions.dedup import NUM_GROUP_BUCKETS, _band_bucket
from ..functions.textstats import lang_id, quality_score
from .deid import build_deid_pipeline


def build_training_data_pipeline(
    pages_ds,
    cfg: EngineConfig | None = None,
    *,
    min_quality: float = 0.4,
    min_chars: int = 50,
):
    """pages Dataset → filtered, deduped, de-identified training rows.

    Returns the lazy output Dataset with columns
    ``url, lang_pred, quality, clean_text, n_spans, n_chars`` plus the
    deid columns; consume with write_parquet / aggregation.
    """
    import pandas as pd

    cfg = cfg or EngineConfig()
    deid = build_deid_pipeline(pages_ds, cfg)

    def stats_and_filter(batch: pa.Table) -> pa.Table:
        texts = batch["extracted_text"].to_pylist()
        scores = [quality_score(t or "") for t in texts]
        langs = [lang_id(t or "") for t in texts]
        out = batch.append_column(
            "quality", pa.array(scores, pa.float64())
        ).append_column("lang_pred", pa.array(langs, pa.string()))
        mask = pa.array(
            [
                s >= min_quality and len(t or "") >= min_chars
                for s, t in zip(scores, texts)
            ]
        )
        return out.filter(mask)

    filtered = deid.map_batches(stats_and_filter, batch_format="pyarrow")

    # exact dedup on the extracted-text hash (context_hash is already
    # sha256(extracted_text)) — bucketed grouping, keeper = min url
    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [_band_bucket(h) for h in batch["context_hash"].to_pylist()]
        return batch.append_column("hash_bucket", pa.array(buckets, pa.int32()))

    def keep_first(bucket: pd.DataFrame) -> pd.DataFrame:
        kept = bucket.sort_values("url").drop_duplicates(subset=["context_hash"], keep="first")
        return kept.drop(columns=["hash_bucket"])

    return (
        filtered.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("hash_bucket")
        .map_groups(keep_first, batch_format="pandas")
    )


def training_data_report(pages_ds, cfg: EngineConfig | None = None, **kwargs: Any) -> dict[str, int]:
    """Run the pipeline and report per-stage attrition counters."""
    rows_in = pages_ds.count()
    out = build_training_data_pipeline(pages_ds, cfg, **kwargs)
    rows_out = out.count()
    # re-derive the intermediate count cheaply: quality-pass rows = out rows
    # + dropped dups; count the filter stage separately for the report
    deid = build_deid_pipeline(pages_ds, cfg or EngineConfig())

    from ..functions.textstats import quality_score as qs

    min_quality = kwargs.get("min_quality", 0.4)
    min_chars = kwargs.get("min_chars", 50)

    def count_pass(batch: pa.Table) -> pa.Table:
        n = sum(
            1
            for t in batch["extracted_text"].to_pylist()
            if qs(t or "") >= min_quality and len(t or "") >= min_chars
        )
        return pa.table({"n": pa.array([n], pa.int64())})

    quality_pass = sum(
        r["n"] for r in deid.map_batches(count_pass, batch_format="pyarrow").take_all()
    )
    return {
        "rows_in": rows_in,
        "dropped_quality": rows_in - quality_pass,
        "dropped_duplicates": quality_pass - rows_out,
        "rows_out": rows_out,
    }
