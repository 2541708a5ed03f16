"""Local stand-in for the driver's correctness harness.

Runs every ``queries()`` entry and compares against ``oracle_sql()`` via
DuckDB with the driver's comparison semantics: row count + column names +
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: PYTHONPATH=/root/repo python tools/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(result, Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    memlimit = os.environ.get("EDS_ORACLE_MEMLIMIT")
    if memlimit:
        # cap the oracle side: a superlinear SQL re-derivation should FAIL
        # loudly (duckdb OutOfMemoryException) instead of OOMing the box.
        # Spill goes to /tmp — duckdb's default ./.tmp would land inside
        # the repo working tree.
        con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
        con.execute(f"SET memory_limit='{memlimit}'")
    for table in TABLES:
        con.sql(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
        )

    skip_oracle = {
        s for s in os.environ.get("EDS_SKIP_ORACLE", "").split(",") if s
    }
    failures = 0
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        elapsed = time.time() - t0
        if name in skip_oracle:
            # EDS_SKIP_ORACLE: oracles whose SQL is superlinear at this SF
            # (self-join dedup/ANN re-derivations) — the engine run is still
            # executed and counted; the value MATCH stands at smaller SFs
            print(f"ok   {name}: engine-run, oracle-skipped ({len(mine)} rows, {elapsed:.1f}s)")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(mine)} rows, {elapsed:.1f}s)")
            continue
        try:
            oracle = canon(con.sql(oracles[name]).df())
        except Exception as exc:
            print(f"FAIL {name}: oracle raised {exc}")
            failures += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(oracle.columns)}")
            failures += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} vs {len(oracle)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=False, rtol=1e-9)
            print(f"ok   {name}: MATCH ({len(mine)} rows, {elapsed:.1f}s)")
        except AssertionError as exc:
            print(f"FAIL {name}: value mismatch\n{str(exc)[:500]}")
            failures += 1

    # entry smoke
    if not only:
        try:
            result = entrymod.entry()
            df = to_pandas(result)
            print(f"ok   entry(): {len(df)} rows, {len(df.columns)} cols")
        except Exception as exc:
            print(f"FAIL entry(): {exc}")
            failures += 1

    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = set(sys.argv[2:]) or None
    raise SystemExit(main(sf, names))
