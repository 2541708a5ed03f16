"""Mega-page skew handling (north rule: url-hash repartition breaks skew).

Two layers of evidence:
- here: the DETERMINISTIC balance property — after the pipeline's url-hash
  pid assignment + range repartition (sort on pid), no partition inherits
  more than a small fraction of the mega pages that arrive clustered in one
  input block;
- bench.py's ``skew`` section: the max-task-wall vs mean-task-wall ratio of
  the fused stage measured with and without the salting (timing-based, so
  it lives in the bench artifact, not in CI assertions).
"""

from __future__ import annotations

from functools import partial

import pyarrow as pa
import pytest


MEGA_EVERY = 50
N = 2000


def _clustered_pages():
    """Pages table with every mega page (40x content) contiguous up front —
    the adversarial layout a sorted crawl dump can produce."""
    from edge_deid_studio_ray.sources.pages import synthesize_pages_table

    megas = [i for i in range(N) if i % MEGA_EVERY == 0 and i > 0]
    rest = [i for i in range(N) if i not in set(megas)]
    table = synthesize_pages_table(megas + rest, mega_every=MEGA_EVERY)
    # the 40x scale only applies on the html branch (pdf/csv mega ids stay
    # normal-sized), so define "mega" by actual payload size — the same
    # criterion the distributed detector uses
    n_megas = sum(1 for h in table["html"].to_pylist() if len(h or b"") > 10_000)
    assert n_megas >= 15, "fixture must contain a meaningful mega-page population"
    return table, n_megas


def test_urlhash_salting_spreads_mega_pages(ray_session):
    import ray.data as rd

    from edge_deid_studio_ray.stages.deid import add_pid

    table, n_megas = _clustered_pages()
    num_partitions = 16
    ds = rd.from_arrow(table).map_batches(
        partial(add_pid, num_partitions=num_partitions), batch_format="pyarrow"
    )

    # mega pages identified by payload size (40x scale ⇒ well past 10 KB;
    # normal pages stay under a few KB)
    def mega_per_pid(batch: pa.Table) -> pa.Table:
        sizes = [len(h or b"") for h in batch["html"].to_pylist()]
        mask = pa.array([s > 10_000 for s in sizes])
        return pa.table({"pid": batch.filter(mask)["pid"]})

    rows = ds.map_batches(mega_per_pid, batch_format="pyarrow").take_all()
    assert len(rows) == n_megas, "mega-page detector must find every mega page"
    per_pid: dict[int, int] = {}
    for r in rows:
        per_pid[int(r["pid"])] = per_pid.get(int(r["pid"]), 0) + 1

    # url-hash assignment must scatter the clustered megas: no partition may
    # hold more than 25% of them (ideal = 1/16 ≈ 6%; the bound leaves room
    # for hash variance at 39 samples) and they must touch many partitions
    assert max(per_pid.values()) <= max(2, n_megas // 4)
    assert len(per_pid) >= num_partitions // 2


def test_pid_range_repartition_bounds_partition_bytes(ray_session):
    """After sort("pid") — the pipeline's range repartition — the per-pid
    byte totals are bounded: no pid range carries more than ~4x the mean
    bytes (the clustered layout starts with ONE block carrying every mega
    page, orders of magnitude over the mean)."""
    import ray.data as rd

    from edge_deid_studio_ray.stages.deid import add_pid

    table, _ = _clustered_pages()
    num_partitions = 16
    ds = (
        rd.from_arrow(table)
        .map_batches(partial(add_pid, num_partitions=num_partitions), batch_format="pyarrow")
        .sort("pid")
    )

    def bytes_per_pid(batch: pa.Table) -> pa.Table:
        import collections

        acc: dict[int, int] = collections.defaultdict(int)
        for pid, h in zip(batch["pid"].to_pylist(), batch["html"].to_pylist()):
            acc[int(pid)] += len(h or b"")
        return pa.table(
            {
                "pid": pa.array(list(acc.keys()), pa.int32()),
                "b": pa.array(list(acc.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(bytes_per_pid, batch_format="pyarrow")
        .groupby("pid")
        .aggregate(Sum("b", alias_name="nb"))
        .take_all()
    )
    totals = [int(r["nb"]) for r in rows]
    assert len(totals) >= num_partitions // 2
    mean = sum(totals) / len(totals)
    assert max(totals) <= 4 * mean, (
        f"pid byte skew {max(totals) / mean:.1f}x exceeds bound: {sorted(totals)}"
    )
