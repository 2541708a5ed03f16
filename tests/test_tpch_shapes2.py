"""Hand-computed semantics pins for the second TPC-H-shape batch:
waiting suppliers (Q21), disjunctive revenue (Q19), CASE priority counts
(Q12), market share (Q8), product profit (Q9).

Each test builds a tiny engineered parquet directory so every number is
checkable by hand, and cross-checks the Ray result against the registered
DuckDB oracle on the same files (the sf sweeps in test_queries_oracle cover
the generated corpus; these pin the edge semantics: unique-latest-shipper
ties, multi-supplier and order-status gates, branch boundaries of the
disjunction, zero-share years, and the exact integer cost term).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from edge_deid_studio_ray.pipelines.queries import ORACLE_SQL, QUERIES


def _oracle(tmp_path, name: str, tables: list[str]):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')")
    return con.execute(ORACLE_SQL[name]).fetchall()


def _ts(s: str):
    import numpy as np

    return np.datetime64(s, "us")


def _write_lineitem(tmp_path, rows):
    """rows: (orderkey, partkey, suppkey, qty, price, disc, flag, shipdate)"""
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array(range(1, len(rows) + 1), pa.int32()),
                "l_quantity": pa.array([float(r[3]) for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[4] for r in rows], pa.float64()),
                "l_discount": pa.array([r[5] for r in rows], pa.float64()),
                "l_tax": pa.array([0.0] * len(rows), pa.float64()),
                "l_returnflag": pa.array([r[6] for r in rows], pa.string()),
                "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
                "l_shipdate": pa.array([_ts(r[7]) for r in rows], pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )


def _write_orders(tmp_path, rows):
    """rows: (orderkey, custkey, status, priority, orderdate)"""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
                "o_totalprice": pa.array([100.0] * len(rows), pa.float64()),
                "o_orderdate": pa.array([_ts(r[4]) for r in rows], pa.timestamp("us")),
                "o_orderpriority": pa.array([r[3] for r in rows], pa.string()),
            }
        ),
        tmp_path / "orders.parquet",
    )


def _write_supplier(tmp_path, rows):
    """rows: (suppkey, name, nationkey)"""
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([r[0] for r in rows], pa.int64()),
                "s_name": pa.array([r[1] for r in rows], pa.string()),
                "s_nationkey": pa.array([r[2] for r in rows], pa.int32()),
                "s_acctbal": pa.array([0.0] * len(rows), pa.float64()),
            }
        ),
        tmp_path / "supplier.parquet",
    )


class TestWaitingSuppliers:
    def test_unique_latest_shipper_semantics(self, ray_session, tmp_path):
        # order 1 (F): s10 ships last alone -> blamed; order 2 (F): s10/s20
        # tie at the max -> nobody; order 3 (F): single supplier -> excluded;
        # order 4 (O): not finished -> excluded; order 5 (F): s20's own later
        # lineitem beats s30 -> s20 blamed.
        _write_lineitem(
            tmp_path,
            [
                (1, 1, 10, 1, 10.0, 0.0, "N", "2020-01-05"),
                (1, 1, 20, 1, 10.0, 0.0, "N", "2020-01-03"),
                (2, 1, 10, 1, 10.0, 0.0, "N", "2020-02-01"),
                (2, 1, 20, 1, 10.0, 0.0, "N", "2020-02-01"),
                (3, 1, 30, 1, 10.0, 0.0, "N", "2020-03-01"),
                (4, 1, 10, 1, 10.0, 0.0, "N", "2020-04-02"),
                (4, 1, 20, 1, 10.0, 0.0, "N", "2020-04-01"),
                (5, 1, 20, 1, 10.0, 0.0, "N", "2020-03-01"),
                (5, 1, 20, 1, 10.0, 0.0, "N", "2020-03-05"),
                (5, 1, 30, 1, 10.0, 0.0, "N", "2020-03-04"),
            ],
        )
        _write_orders(
            tmp_path,
            [
                (1, 1, "F", "1-URGENT", "2020-01-01"),
                (2, 1, "F", "1-URGENT", "2020-01-01"),
                (3, 1, "F", "1-URGENT", "2020-01-01"),
                (4, 1, "O", "1-URGENT", "2020-01-01"),
                (5, 1, "F", "1-URGENT", "2020-01-01"),
            ],
        )
        _write_supplier(tmp_path, [(10, "SUPP_10", 0), (20, "SUPP_20", 0), (30, "SUPP_30", 0)])

        rows = QUERIES["waiting_suppliers"](str(tmp_path)).take_all()
        got = [(r["s_name"], r["numwait"]) for r in rows]
        assert got == [("SUPP_10", 1), ("SUPP_20", 1)]
        assert got == _oracle(tmp_path, "waiting_suppliers", ["lineitem", "orders", "supplier"])


class TestDisjunctiveRevenue:
    def test_each_branch_and_boundaries(self, ray_session, tmp_path):
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
                    "p_name": pa.array(["a", "b", "c", "d"], pa.string()),
                    "p_brand": pa.array(
                        ["Brand#12", "Brand#23", "Brand#24", "Brand#12"], pa.string()
                    ),
                    "p_type": pa.array(["t"] * 4, pa.string()),
                    "p_size": pa.array([3, 8, 12, 40], pa.int32()),
                    "p_retailprice": pa.array([1.0] * 4, pa.float64()),
                }
            ),
            tmp_path / "part.parquet",
        )
        # branch 1: qty 5 in [1,11], 10.00 @ 10% -> 9.0
        # branch 1 rejected: qty 20 out of band
        # branch 2: qty 15 in [10,20], 20.00 @ 0% -> 20.0
        # branch 3: qty 25 in [20,30], 30.00 @ 5% -> 28.5
        # size 40 part: no branch
        _write_lineitem(
            tmp_path,
            [
                (1, 1, 1, 5, 10.0, 0.10, "N", "2020-01-01"),
                (1, 1, 1, 20, 10.0, 0.0, "N", "2020-01-01"),
                (1, 2, 1, 15, 20.0, 0.0, "N", "2020-01-01"),
                (1, 3, 1, 25, 30.0, 0.05, "N", "2020-01-01"),
                (1, 4, 1, 5, 99.0, 0.0, "N", "2020-01-01"),
            ],
        )
        df = QUERIES["disjunctive_revenue"](str(tmp_path))
        assert df["revenue"].tolist() == [57.5]
        assert _oracle(tmp_path, "disjunctive_revenue", ["lineitem", "part"]) == [(57.5,)]

    def test_no_matches_is_zero_not_null(self, ray_session, tmp_path):
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1], pa.int64()),
                    "p_name": pa.array(["a"], pa.string()),
                    "p_brand": pa.array(["Brand#1"], pa.string()),
                    "p_type": pa.array(["t"], pa.string()),
                    "p_size": pa.array([3], pa.int32()),
                    "p_retailprice": pa.array([1.0], pa.float64()),
                }
            ),
            tmp_path / "part.parquet",
        )
        _write_lineitem(tmp_path, [(1, 1, 1, 5, 10.0, 0.0, "N", "2020-01-01")])
        assert QUERIES["disjunctive_revenue"](str(tmp_path))["revenue"].tolist() == [0.0]
        assert _oracle(tmp_path, "disjunctive_revenue", ["lineitem", "part"]) == [(0.0,)]


class TestReturnflagPriorityCounts:
    def test_case_split_and_ship_window(self, ray_session, tmp_path):
        _write_lineitem(
            tmp_path,
            [
                (1, 1, 1, 1, 10.0, 0.0, "A", "1996-03-01"),
                (1, 1, 1, 1, 10.0, 0.0, "A", "1996-04-01"),
                (2, 1, 1, 1, 10.0, 0.0, "A", "1996-05-01"),
                (2, 1, 1, 1, 10.0, 0.0, "A", "1995-12-31"),  # out of window
                (3, 1, 1, 1, 10.0, 0.0, "R", "1996-06-01"),
            ],
        )
        _write_orders(
            tmp_path,
            [
                (1, 1, "F", "1-URGENT", "1996-01-01"),
                (2, 1, "F", "5-LOW", "1996-01-01"),
                (3, 1, "F", "2-HIGH", "1996-01-01"),
            ],
        )
        rows = QUERIES["returnflag_priority_counts"](str(tmp_path)).take_all()
        got = [(r["l_returnflag"], r["high_line_count"], r["low_line_count"]) for r in rows]
        assert got == [("A", 2, 1), ("R", 1, 0)]
        assert got == _oracle(tmp_path, "returnflag_priority_counts", ["lineitem", "orders"])


def _write_dims(tmp_path):
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
            }
        ),
        tmp_path / "region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([2, 7, 0], pa.int32()),
                "n_name": pa.array(["NATION_2", "NATION_7", "NATION_0"], pa.string()),
                "n_regionkey": pa.array([0, 1, 1], pa.int32()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_name": pa.array(["c1", "c2"], pa.string()),
                "c_nationkey": pa.array([2, 7], pa.int32()),
                "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
                "c_mktsegment": pa.array(["BUILDING"] * 2, pa.string()),
            }
        ),
        tmp_path / "customer.parquet",
    )


class TestMarketShare:
    def test_share_arithmetic_and_zero_year(self, ray_session, tmp_path):
        _write_dims(tmp_path)
        # s7 in NATION_7, s1 in NATION_0
        _write_supplier(tmp_path, [(7, "S7", 7), (1, "S1", 0)])
        # o1: ASIA cust, 1996 — s7 ships 100.00, s1 ships 300.00 -> share .25
        # o2: ASIA cust, 1997 — only s1 -> share 0.0
        # o3: EUROPE cust, 1996 — excluded entirely
        # o4: ASIA cust, 1995 — outside the window
        _write_orders(
            tmp_path,
            [
                (1, 1, "F", "1-URGENT", "1996-05-01"),
                (2, 1, "F", "1-URGENT", "1997-03-01"),
                (3, 2, "F", "1-URGENT", "1996-05-01"),
                (4, 1, "F", "1-URGENT", "1995-05-01"),
            ],
        )
        _write_lineitem(
            tmp_path,
            [
                (1, 1, 7, 1, 100.0, 0.0, "N", "1996-05-02"),
                (1, 1, 1, 1, 300.0, 0.0, "N", "1996-05-02"),
                (2, 1, 1, 1, 50.0, 0.0, "N", "1997-03-02"),
                (3, 1, 7, 1, 999.0, 0.0, "N", "1996-05-02"),
                (4, 1, 7, 1, 999.0, 0.0, "N", "1995-05-02"),
            ],
        )
        rows = QUERIES["market_share"](str(tmp_path)).take_all()
        got = [(r["o_year"], r["mkt_share"]) for r in rows]
        assert got == [(1996, 0.25), (1997, 0.0)]
        assert got == _oracle(
            tmp_path,
            "market_share",
            ["lineitem", "orders", "customer", "supplier", "nation", "region"],
        )


class TestProductProfit:
    def test_exact_cost_term_and_name_filter(self, ray_session, tmp_path):
        _write_dims(tmp_path)
        _write_supplier(tmp_path, [(1, "S1", 0)])
        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2], pa.int64()),
                    "p_name": pa.array(["red widget", "blue bolt"], pa.string()),
                    "p_brand": pa.array(["Brand#1"] * 2, pa.string()),
                    "p_type": pa.array(["t"] * 2, pa.string()),
                    "p_size": pa.array([1, 1], pa.int32()),
                    "p_retailprice": pa.array([10.0, 10.0], pa.float64()),
                }
            ),
            tmp_path / "part.parquet",
        )
        _write_orders(tmp_path, [(1, 1, "F", "1-URGENT", "1996-05-01")])
        # red part: qty 2 at 50.00, 0% disc -> revenue 100.00, cost
        # 0.55 * 10.00 * 2 = 11.00 -> profit 89.00; blue part excluded.
        _write_lineitem(
            tmp_path,
            [
                (1, 1, 1, 2, 100.0, 0.0, "N", "1996-05-02"),
                (1, 2, 1, 2, 100.0, 0.0, "N", "1996-05-02"),
            ],
        )
        rows = QUERIES["product_profit"](str(tmp_path)).take_all()
        got = [(r["nation"], r["o_year"], r["profit"]) for r in rows]
        assert got == [("NATION_0", 1996, 89.0)]
        assert got == _oracle(
            tmp_path, "product_profit", ["lineitem", "orders", "part", "supplier", "nation"]
        )
