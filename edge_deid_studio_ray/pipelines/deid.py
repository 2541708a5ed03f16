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
    import pyarrow.compute as pc

    data = pads.dataset(shard_dir, format="parquet", partitioning="hive")
    table = data.to_table(
        columns=["pid", "n_bytes", "n_spans", "t_extract_ms", "t_detect_ms", "t_replace_ms"]
    )
    # one vectorized hash aggregate (pids ≤ num_partitions keys) — never a
    # per-row Python loop on the driver
    agg = table.group_by("pid").aggregate(
        [("pid", "count"), ("n_bytes", "sum"), ("n_spans", "sum")]
    )
    per_pid = {
        str(p): {"docs": int(d), "bytes": int(b), "spans": int(s)}
        for p, d, b, s in zip(
            agg["pid"].to_pylist(),
            agg["pid_count"].to_pylist(),
            agg["n_bytes_sum"].to_pylist(),
            agg["n_spans_sum"].to_pylist(),
        )
    }
    timings_ms = {
        stage: round(float(pc.sum(table[col]).as_py() or 0.0), 1)
        for stage, col in (
            ("extract", "t_extract_ms"),
            ("detect", "t_detect_ms"),
            ("replace", "t_replace_ms"),
        )
    }
    return (
        table.num_rows,
        int(pc.sum(table["n_bytes"]).as_py() or 0),
        int(pc.sum(table["n_spans"]).as_py() or 0),
        per_pid,
        timings_ms,
    )


def _warm_fsspec_http_probe() -> None:
    """Make Ray's per-write ``from fsspec.implementations.http import
    HTTPFileSystem`` probe deterministic under shard threads.

    With aiohttp absent that import fails with ModuleNotFoundError, which
    Ray's ``_is_http_filesystem`` catches — but a FAILED import is never
    cached, so concurrent shard threads re-execute the module body and the
    import-lock deadlock-avoidance can hand one thread a partially
    initialized module, surfacing ``ImportError: cannot import name
    'HTTPFileSystem'`` (not a ModuleNotFoundError; uncaught).  Cache a
    sentinel module once on the driver thread: ``isinstance(fs, sentinel)``
    is always False, which is exactly the right answer for the local and
    parquet filesystems these jobs write to."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except ModuleNotFoundError:
        pass
    except ImportError:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel: nothing is ever an instance
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def _process_shard(
    out_dir: str, shard_id: str, factory: Callable[[], Any], fp: str, cfg: EngineConfig
) -> ShardManifest:
    """Process one shard end to end and commit it (data write → manifest
    rename).  Thread-safe: every path it touches is derived from shard_id."""
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
    return manifest


def run_deid_job(
    shards: list[tuple[str, Callable[[], Any]]],
    out_dir: str,
    cfg: EngineConfig | None = None,
    fingerprints: dict[str, str] | None = None,
    max_in_flight: int = 1,
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
    input itself).

    ``max_in_flight`` > 1 keeps a bounded window of shards executing
    concurrently (driver threads, one streaming Dataset each — Ray Data
    pipelines from separate threads share the cluster).  On a real cluster
    this stops a small straggler shard from idling the other nodes; the
    per-shard commit protocol is unchanged, so a crash mid-window still
    resumes exactly (committed shards skip, in-flight shards redo)."""
    cfg = cfg or EngineConfig()
    already = committed_shards(out_dir)
    report: dict[str, Any] = {"shards_total": len(shards), "shards_skipped": 0, "shards_run": 0}

    fingerprints = fingerprints or {}
    manifests: dict[str, ShardManifest] = {}
    to_run: list[tuple[str, Callable[[], Any], str]] = []
    for shard_id, factory in shards:
        fp = fingerprints.get(shard_id, "")
        prior = already.get(shard_id)
        if prior is not None and (not fp or prior.input_fingerprint == fp):
            manifests[shard_id] = prior
            report["shards_skipped"] += 1
        else:
            to_run.append((shard_id, factory, fp))

    if max_in_flight <= 1 or len(to_run) <= 1:
        for shard_id, factory, fp in to_run:
            manifests[shard_id] = _process_shard(out_dir, shard_id, factory, fp, cfg)
            report["shards_run"] += 1
    else:
        from concurrent.futures import FIRST_EXCEPTION, ThreadPoolExecutor, wait

        _warm_fsspec_http_probe()
        first_err: BaseException | None = None
        with ThreadPoolExecutor(
            max_workers=max_in_flight, thread_name_prefix="deid-shard"
        ) as ex:
            futs = {
                ex.submit(_process_shard, out_dir, sid, fac, fp, cfg): sid
                for sid, fac, fp in to_run
            }
            done, not_done = wait(futs, return_when=FIRST_EXCEPTION)
            # a failure stops the window: cancel whatever is still QUEUED
            # and drain only the in-flight shards (their commits stay valid
            # for resume).  NB: never as_completed + shutdown(cancel_futures)
            # — a future cancelled while queued skips
            # set_running_or_notify_cancel, so as_completed's waiter is
            # never notified and the loop hangs forever.
            still_running = {fut for fut in not_done if not fut.cancel()}
            wait(still_running)
            for fut, sid in futs.items():
                if fut.cancelled():
                    continue
                try:
                    manifests[sid] = fut.result()
                    report["shards_run"] += 1
                except BaseException as err:  # noqa: BLE001 — first failure wins
                    if first_err is None:
                        first_err = err
        if first_err is not None:
            raise first_err

    totals = {"docs": 0, "bytes": 0, "spans": 0}
    for shard_id, _ in shards:  # input order — deterministic report
        manifest = manifests[shard_id]
        totals["docs"] += manifest.docs
        totals["bytes"] += manifest.bytes
        totals["spans"] += manifest.spans
    report.update(totals)
    return report
