"""Hand-computed semantics pins for the round-3 relational additions:
MAD outlier detection, events-per-user histogram, cohort retention.

Each test builds a tiny engineered parquet directory so every number is
checkable by hand, and cross-checks the Ray result against the registered
DuckDB oracle on the same files (the sf0.001 sweep in test_queries_oracle
covers the generated corpus; these pin edge semantics: discrete-median tie
handling, the strict ``> 3*mad`` bound, null exclusion, month boundaries).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from edge_deid_studio_ray.pipelines.queries import ORACLE_SQL, QUERIES


def _oracle(tmp_path, name: str, tables: list[str]):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')")
    return con.execute(ORACLE_SQL[name]).fetchall()


class TestEventsValueOutliers:
    def test_hand_computed_median_mad_and_strict_bound(self, ray_session, tmp_path):
        # type "a": values 1,1,1,1,100 -> median 1 (ceil(0.5*5)=3rd), devs
        # 0,0,0,0,99 -> mad 0, strict dev > 0 catches exactly the 99.
        # type "b": 1..5 -> median 3, devs sorted 0,1,1,2,2 -> mad 1,
        # 3*mad = 3, no dev exceeds 3 strictly -> 0 outliers.
        # type "c": a null value must drop from n_events and the histograms.
        events = pa.table(
            {
                "event_type": pa.array(["a"] * 5 + ["b"] * 5 + ["c"] * 3, pa.string()),
                "value": pa.array(
                    [1.0, 1.0, 1.0, 1.0, 100.0] + [1.0, 2.0, 3.0, 4.0, 5.0] + [7.0, None, 7.0],
                    pa.float64(),
                ),
            }
        )
        pq.write_table(events, tmp_path / "events.parquet")
        rows = {
            r["event_type"]: r
            for r in QUERIES["events_value_outliers"](str(tmp_path)).take_all()
        }
        assert rows["a"]["median"] == 1.0 and rows["a"]["mad"] == 0.0
        assert rows["a"]["n_outliers"] == 1 and rows["a"]["n_events"] == 5
        assert rows["b"]["median"] == 3.0 and rows["b"]["mad"] == 1.0
        assert rows["b"]["n_outliers"] == 0
        assert rows["c"]["n_events"] == 2 and rows["c"]["mad"] == 0.0

        oracle = {r[0]: r for r in _oracle(tmp_path, "events_value_outliers", ["events"])}
        for k, r in rows.items():
            assert (r["n_events"], r["median"], r["mad"], r["n_outliers"]) == (
                oracle[k][1],
                oracle[k][2],
                oracle[k][3],
                oracle[k][4],
            )

    def test_even_count_takes_lower_middle_element(self, ray_session, tmp_path):
        # quantile_disc(0.5) over an even count picks element ceil(0.5*n) —
        # the LOWER middle: median of 1,2,3,4 is 2, not 2.5.
        events = pa.table(
            {
                "event_type": pa.array(["e"] * 4, pa.string()),
                "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            }
        )
        pq.write_table(events, tmp_path / "events.parquet")
        (row,) = QUERIES["events_value_outliers"](str(tmp_path)).take_all()
        assert row["median"] == 2.0
        (orow,) = _oracle(tmp_path, "events_value_outliers", ["events"])
        assert orow[2] == 2.0 and orow[3] == row["mad"]


class TestEventsPerUserHistogram:
    def test_hand_computed_distribution(self, ray_session, tmp_path):
        events = pa.table(
            {"user_id": pa.array([1, 1, 1, 2, 2, 3, 4, 4, 4], pa.int64())}
        )
        pq.write_table(events, tmp_path / "events.parquet")
        rows = {
            r["n_events"]: r["n_users"]
            for r in QUERIES["events_per_user_histogram"](str(tmp_path)).take_all()
        }
        assert rows == {3: 2, 2: 1, 1: 1}
        oracle = dict(_oracle(tmp_path, "events_per_user_histogram", ["events"]))
        assert rows == oracle

    def test_matches_brute_force_on_random_users(self, ray_session, tmp_path):
        rng = np.random.default_rng(7)
        users = rng.integers(0, 200, size=5000)
        pq.write_table(
            pa.table({"user_id": pa.array(users, pa.int64())}), tmp_path / "events.parquet"
        )
        rows = {
            r["n_events"]: r["n_users"]
            for r in QUERIES["events_per_user_histogram"](str(tmp_path)).take_all()
        }
        counts = np.bincount(users)
        counts = counts[counts > 0]
        brute: dict[int, int] = {}
        for c in counts:
            brute[int(c)] = brute.get(int(c), 0) + 1
        assert rows == brute


class TestCustomerOrderCohorts:
    def test_hand_built_retention_matrix(self, ray_session, tmp_path):
        us = lambda s: np.datetime64(s, "us")
        orders = pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "o_orderdate": pa.array(
                    [
                        us("2024-01-05"),   # cust 1 cohort = 2024-01
                        us("2024-01-31"),   # same month, second order
                        us("2024-03-01"),   # retained in 2024-03
                        us("2024-03-15"),   # cust 2 cohort = 2024-03
                        us("2024-03-20"),
                    ],
                    pa.timestamp("us"),
                ),
            }
        )
        pq.write_table(orders, tmp_path / "orders.parquet")
        rows = {
            (r["cohort_month"], r["order_month"]): r
            for r in QUERIES["customer_order_cohorts"](str(tmp_path)).take_all()
        }
        assert rows[("2024-01", "2024-01")]["n_orders"] == 2
        assert rows[("2024-01", "2024-01")]["n_customers"] == 1
        assert rows[("2024-01", "2024-03")]["n_orders"] == 1
        assert rows[("2024-03", "2024-03")]["n_orders"] == 2
        assert rows[("2024-03", "2024-03")]["n_customers"] == 1
        assert len(rows) == 3

        oracle = {
            (r[0], r[1]): r
            for r in _oracle(tmp_path, "customer_order_cohorts", ["orders"])
        }
        assert set(oracle) == set(rows)
        for k, r in rows.items():
            assert (r["n_orders"], r["n_customers"]) == (oracle[k][2], oracle[k][3])

    def test_month_boundary_is_calendar_not_30_days(self, ray_session, tmp_path):
        # Jan 31 and Feb 1 are different months even though 1 day apart.
        us = lambda s: np.datetime64(s, "us")
        orders = pa.table(
            {
                "o_custkey": pa.array([9, 9], pa.int64()),
                "o_orderdate": pa.array(
                    [us("2024-01-31"), us("2024-02-01")], pa.timestamp("us")
                ),
            }
        )
        pq.write_table(orders, tmp_path / "orders.parquet")
        rows = {
            (r["cohort_month"], r["order_month"])
            for r in QUERIES["customer_order_cohorts"](str(tmp_path)).take_all()
        }
        assert rows == {("2024-01", "2024-01"), ("2024-01", "2024-02")}
