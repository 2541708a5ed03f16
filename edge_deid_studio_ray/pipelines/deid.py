"""End-to-end de-identification pipeline composition.

Ray-native restatement of the reference flagship (SURVEY.md §3.1):

    read_parquet(pages)
      → map_batches(add_pid)                 # url-hash partition column
      → map_batches(fused extract+deid)      # Arrow in / Arrow out
      → write_parquet(out/shard=<id>/)       # resumable partitioned sink
      → per-pid counters + lineage manifest  # state/manifest.py

The pipeline is lazy/streaming end to end: nothing materializes the full
dataset; counters are computed with a column-pruned scan of the written
output (3 int columns), not by caching the stream.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

from ..config import EngineConfig
from ..stages.deid import add_pid, make_deid_batch_fn
from ..state.manifest import (
    ShardManifest,
    clear_partial_output,
    committed_shards,
    shard_output_dir,
    write_manifest,
)


def build_deid_pipeline(ds, cfg: EngineConfig | None = None):
    """Attach the pid + fused deid stages to a pages Dataset (lazy)."""
    cfg = cfg or EngineConfig()
    ds = ds.map_batches(
        partial(add_pid, num_partitions=cfg.num_partitions),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    return ds.map_batches(
        make_deid_batch_fn(cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


def _shard_counters(shard_dir: str):
    """Column-pruned scan of a written shard → (docs, bytes, spans, per-pid)."""
    import os

    import pyarrow.dataset as pads

    if not os.path.isdir(shard_dir):
        # an EMPTY input shard writes no directory at all (Ray's
        # write_parquet skips zero-row datasets); commit it with zero
        # counters instead of crashing — otherwise the job can never
        # resume past that shard
        return 0, 0, 0, {}, {}
    # hive layout: pid lives in the directory names (pid=K/), not the files
    data = pads.dataset(shard_dir, format="parquet", partitioning="hive")
    table = data.to_table(
        columns=["pid", "n_bytes", "n_spans", "t_extract_ms", "t_detect_ms", "t_replace_ms"]
    )
    per_pid: dict[str, dict[str, int]] = {}
    pids = table["pid"].to_pylist()
    nb = table["n_bytes"].to_pylist()
    ns = table["n_spans"].to_pylist()
    for p, b, s in zip(pids, nb, ns):
        slot = per_pid.setdefault(str(p), {"docs": 0, "bytes": 0, "spans": 0})
        slot["docs"] += 1
        slot["bytes"] += int(b)
        slot["spans"] += int(s)
    timings_ms = {
        stage: round(sum(table[col].to_pylist()), 1)
        for stage, col in (
            ("extract", "t_extract_ms"),
            ("detect", "t_detect_ms"),
            ("replace", "t_replace_ms"),
        )
    }
    return (
        len(pids),
        sum(int(b) for b in nb),
        sum(int(s) for s in ns),
        per_pid,
        timings_ms,
    )


def run_deid_job(
    shards: list[tuple[str, Callable[[], Any]]],
    out_dir: str,
    cfg: EngineConfig | None = None,
    fingerprints: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Run (or resume) the deid job over input shards.

    ``shards`` is a list of ``(shard_id, dataset_factory)``; each factory
    returns a lazy pages Dataset for that input slice.  Committed shards are
    skipped; each processed shard commits atomically (data write → manifest
    rename).  Returns the run report (reference report shape,
    run_multi_dataset_pipeline.py:805-830).

    ``fingerprints`` optionally maps shard_id → an INPUT fingerprint the
    caller derives from the actual input (file etags, sizes+mtimes, a
    content hash).  A committed shard whose stored fingerprint differs is
    re-run instead of skipped — without it, resume trusts the shard_id
    alone (the factory is opaque, so the engine cannot fingerprint the
    input itself)."""
    cfg = cfg or EngineConfig()
    already = committed_shards(out_dir)
    report: dict[str, Any] = {"shards_total": len(shards), "shards_skipped": 0, "shards_run": 0}
    totals = {"docs": 0, "bytes": 0, "spans": 0}

    fingerprints = fingerprints or {}
    for shard_id, factory in shards:
        fp = fingerprints.get(shard_id, "")
        prior = already.get(shard_id)
        if prior is not None and (not fp or prior.input_fingerprint == fp):
            manifest = prior
            report["shards_skipped"] += 1
        else:
            clear_partial_output(out_dir, shard_id)
            ds = build_deid_pipeline(factory(), cfg)
            sdir = shard_output_dir(out_dir, shard_id)
            # url-hash partitioned layout (north rule): each shard's output is
            # split into pid=K subdirectories, so downstream consumers and
            # re-runs address balanced key ranges instead of whole files
            ds.write_parquet(sdir, partition_cols=["pid"])
            docs, n_bytes, spans, per_pid, timings_ms = _shard_counters(sdir)
            manifest = ShardManifest(
                shard_id=shard_id,
                docs=docs,
                bytes=n_bytes,
                spans=spans,
                per_pid=per_pid,
                timings_ms=timings_ms,
                # the caller-supplied INPUT fingerprint when given ('' when
                # not): a sha of the shard_id carried zero lineage
                # information beyond the id it sat next to
                input_fingerprint=fp,
            )
            write_manifest(out_dir, manifest)
            report["shards_run"] += 1
        totals["docs"] += manifest.docs
        totals["bytes"] += manifest.bytes
        totals["spans"] += manifest.spans

    report.update(totals)
    return report
