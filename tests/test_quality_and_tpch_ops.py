"""Hand-computed semantics pins for the Gopher quality-rule bundle, the
TPC-H Q17/Q13/Q14/Q10 plan shapes, the Zipf-slope fit, and the LAG-window
debounce.

Each test builds a tiny engineered parquet directory so every number is
checkable by hand, and cross-checks the Ray result against the registered
DuckDB oracle on the same files.  The sf0.001/0.01/0.1 sweeps cover the
generated corpus; these pin the edge semantics: integer-exact rule
thresholds and multi-reason attribution (Gopher), the strict `<` boundary
of the Q17 quantity threshold, the Q13 zero bucket, window inclusivity,
rank tie-breaks, and the non-greedy LAG gap contract.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from edge_deid_studio_ray.pipelines.queries import ORACLE_SQL, QUERIES


def _oracle(tmp_path, name: str, tables: list[str]):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    return con.execute(ORACLE_SQL[name]).fetchall()


def _ts(s: str) -> np.datetime64:
    return np.datetime64(s, "us")


class TestGopherQualityFlags:
    def test_one_doc_per_reason_and_multi_reason_attribution(self, ray_session, tmp_path):
        stop8 = "the be to of and that have with"  # 8 words, wlen 24
        docs = [
            # A: kept — 52 words, all rules pass
            stop8 + " " + " ".join(["word"] * 44),
            # B: word_count only (10 words, stopwords still >= 2)
            "the and " + " ".join(["word"] * 8),
            # C: mean_word_len (wlen 60 < 3*60) + stopwords (0 hits)
            " ".join(["a"] * 60),
            # D: bullet_lines only — 10/10 lines bullet-led; "-" words keep
            # alpha exactly at the pass bound (5*50 >= 4*60)
            "\n".join(["- then keep with have them"] * 10),
            # E: ellipsis_lines only — 1 of 2 lines ends with …, syms=1 stays
            # under the 10% symbol bound
            "the and " + " ".join(["word"] * 28) + "\n"
            + " ".join(["word"] * 29) + " word…",
            # F: symbol_ratio only — 6 '#' inside one word of 52 (10*6 > 52)
            stop8 + " wo######rd " + " ".join(["word"] * 43),
            # G: alpha_words only — 35 digit-words of 60 (5*25 < 4*60)
            "the and " + " ".join(["word"] * 23) + " " + " ".join(["123"] * 35),
        ]
        pq.write_table(
            pa.table({"text": pa.array(docs, pa.string())}), tmp_path / "documents.parquet"
        )
        rows = {
            r["reason"]: r["n_docs"]
            for r in QUERIES["gopher_quality_flags"](str(tmp_path)).take_all()
        }
        assert rows == {
            "kept": 1,
            "word_count": 1,
            "mean_word_len": 1,
            "stopwords": 1,  # doc C counts here too: multi-reason attribution
            "bullet_lines": 1,
            "ellipsis_lines": 1,
            "symbol_ratio": 1,
            "alpha_words": 1,
        }
        assert dict(_oracle(tmp_path, "gopher_quality_flags", ["documents"])) == rows

    def test_empty_doc_fails_only_word_count(self, ray_session, tmp_path):
        pq.write_table(
            pa.table({"text": pa.array([""], pa.string())}), tmp_path / "documents.parquet"
        )
        rows = {
            r["reason"]: r["n_docs"]
            for r in QUERIES["gopher_quality_flags"](str(tmp_path)).take_all()
        }
        # wc == 0: every wc-guarded rule is skipped, only word_count fires
        assert rows["word_count"] == 1 and rows["kept"] == 0
        assert sum(v for k, v in rows.items() if k not in ("word_count", "kept")) == 0
        assert dict(_oracle(tmp_path, "gopher_quality_flags", ["documents"])) == rows


class TestSmallQuantityRevenue:
    def test_strict_threshold_boundary_and_brand_filter(self, ray_session, tmp_path):
        # pk1 (Brand#23): qtys [1,7,7,7,8] -> sq=30, cnt=5; 1*5*5=25 < 30 ✓
        # pk2 (Brand#23): qtys [1,6,6,6,6] -> sq=25, cnt=5; 25 < 25 ✗ (strict)
        # pk3 (other brand): qty 1 among heavy rows — excluded by brand
        part = pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                "p_brand": pa.array(["Brand#23", "Brand#23", "Brand#9"], pa.string()),
            }
        )
        qtys = [(1, 1.0), (1, 7.0), (1, 7.0), (1, 7.0), (1, 8.0)]
        qtys += [(2, 1.0), (2, 6.0), (2, 6.0), (2, 6.0), (2, 6.0)]
        qtys += [(3, 1.0), (3, 50.0)]
        prices = [123.45] + [10.0] * (len(qtys) - 1)
        lineitem = pa.table(
            {
                "l_partkey": pa.array([q[0] for q in qtys], pa.int64()),
                "l_quantity": pa.array([q[1] for q in qtys], pa.float64()),
                "l_extendedprice": pa.array(prices, pa.float64()),
            }
        )
        pq.write_table(part, tmp_path / "part.parquet")
        pq.write_table(lineitem, tmp_path / "lineitem.parquet")
        out = QUERIES["small_quantity_revenue"](str(tmp_path)).to_pylist()
        assert out == [{"n_lines": 1, "avg_yearly": 12345 / 700.0}]
        (orow,) = _oracle(tmp_path, "small_quantity_revenue", ["part", "lineitem"])
        assert orow == (1, 12345 / 700.0)


class TestCustomerOrderCounts:
    def test_zero_bucket_and_priority_filter(self, ray_session, tmp_path):
        customer = pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())})
        orders = pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "o_orderkey": pa.array([10, 11, 12, 13, 14], pa.int64()),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "5-LOW", "4-NOT SPECIFIED", "1-URGENT", "4-NOT SPECIFIED"],
                    pa.string(),
                ),
            }
        )
        pq.write_table(customer, tmp_path / "customer.parquet")
        pq.write_table(orders, tmp_path / "orders.parquet")
        out = [
            (r["c_count"], r["custdist"])
            for r in QUERIES["customer_order_counts"](str(tmp_path)).to_pylist()
        ]
        # c1 has 2 qualifying orders, c2 has 1; c3's only order is filtered
        # INSIDE the join predicate (zero bucket), c4 has none -> zero=2
        assert out == [(0, 2), (2, 1), (1, 1)]
        assert _oracle(tmp_path, "customer_order_counts", ["customer", "orders"]) == out


class TestPromoRevenueRatio:
    def test_window_and_conditional_sums(self, ray_session, tmp_path):
        part = pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_type": pa.array(["PROMO", "STANDARD"], pa.string()),
            }
        )
        lineitem = pa.table(
            {
                "l_partkey": pa.array([1, 2, 1], pa.int64()),
                "l_shipdate": pa.array(
                    [_ts("1996-03-05"), _ts("1996-03-31"), _ts("1996-04-01")],
                    pa.timestamp("us"),
                ),
                "l_extendedprice": pa.array([10.0, 20.0, 99.0], pa.float64()),
                "l_discount": pa.array([0.10, 0.0, 0.0], pa.float64()),
            }
        )
        pq.write_table(part, tmp_path / "part.parquet")
        pq.write_table(lineitem, tmp_path / "lineitem.parquet")
        (row,) = QUERIES["promo_revenue_ratio"](str(tmp_path)).to_pylist()
        # promo units 1000*90=90000, standard 2000*100=200000; the 04-01 row
        # is outside the half-open window
        assert row == {
            "promo_revenue": 9.0,
            "total_revenue": 29.0,
            "promo_pct": (100.0 * 90000) / 290000,
        }
        (orow,) = _oracle(tmp_path, "promo_revenue_ratio", ["part", "lineitem"])
        assert orow == (9.0, 29.0, (100.0 * 90000) / 290000)


class TestReturnedTopCustomers:
    def test_flag_filter_window_and_name_joins(self, ray_session, tmp_path):
        customer = pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_name": pa.array(["Customer#1", "Customer#2"], pa.string()),
                "c_nationkey": pa.array([0, 1], pa.int32()),
            }
        )
        nation = pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
            }
        )
        orders = pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                "o_orderdate": pa.array(
                    [_ts("1995-11-01"), _ts("1996-02-01"), _ts("1995-12-31")],
                    pa.timestamp("us"),
                ),
            }
        )
        lineitem = pa.table(
            {
                "l_orderkey": pa.array([10, 10, 11, 12], pa.int64()),
                "l_returnflag": pa.array(["R", "N", "R", "R"], pa.string()),
                "l_extendedprice": pa.array([10.0, 999.0, 999.0, 5.0], pa.float64()),
                "l_discount": pa.array([0.0, 0.0, 0.0, 0.05], pa.float64()),
            }
        )
        for name, t in [
            ("customer", customer),
            ("nation", nation),
            ("orders", orders),
            ("lineitem", lineitem),
        ]:
            pq.write_table(t, tmp_path / f"{name}.parquet")
        out = QUERIES["returned_top_customers"](str(tmp_path)).take_all()
        # o10's N-flag line and o11 (outside the order-date window) drop;
        # c1: 1000*100=100000 units -> 10.0; c2: 500*95=47500 -> 4.75
        assert out == [
            {"c_custkey": 1, "c_name": "Customer#1", "n_name": "ALPHA", "revenue": 10.0},
            {"c_custkey": 2, "c_name": "Customer#2", "n_name": "BETA", "revenue": 4.75},
        ]
        oracle = _oracle(
            tmp_path, "returned_top_customers", ["customer", "nation", "orders", "lineitem"]
        )
        assert oracle == [(1, "Customer#1", "ALPHA", 10.0), (2, "Customer#2", "BETA", 4.75)]


class TestWordZipfSlope:
    def test_closed_form_ties_and_single_word_exclusion(self, ray_session, tmp_path):
        docs = [
            ("xx", "a a a a a a a a b b b b c c"),  # freqs 8,4,2 at ranks 1,2,3
            ("yy", "b b a a"),  # tie: word-asc puts a at rank 1 -> flat, slope 0
            ("zz", "solo"),  # one word -> ln(rank) constant -> excluded
        ]
        pq.write_table(
            pa.table(
                {
                    "lang": pa.array([d[0] for d in docs], pa.string()),
                    "text": pa.array([d[1] for d in docs], pa.string()),
                }
            ),
            tmp_path / "documents.parquet",
        )
        pts = [(1, 8), (2, 4), (3, 2)]
        sx = sum(math.log(r) for r, _ in pts)
        sy = sum(math.log(n) for _, n in pts)
        sxy = sum(math.log(r) * math.log(n) for r, n in pts)
        sxx = sum(math.log(r) ** 2 for r, _ in pts)
        expect_xx = round((3 * sxy - sx * sy) / (3 * sxx - sx * sx), 6)
        out = {
            r["lang"]: (r["n_words"], r["zipf_slope"])
            for r in QUERIES["word_zipf_slope"](str(tmp_path)).take_all()
        }
        assert out == {"xx": (3, expect_xx), "yy": (2, 0.0)}
        assert dict(
            (lang, (n, s)) for lang, n, s in _oracle(tmp_path, "word_zipf_slope", ["documents"])
        ) == out


class TestEventsDebounced:
    def test_non_greedy_gap_and_tie_contract(self, ray_session, tmp_path):
        base = 1_000_000_000_000_000  # epoch µs
        rows = [
            # user 1 type x: 0s keep, +30s drop, +91s keep (61s after the
            # PREVIOUS RAW event at 30s — non-greedy), +200s keep
            (1, "x", base, 1),
            (1, "x", base + 30_000_000, 2),
            (1, "x", base + 91_000_000, 3),
            (1, "x", base + 200_000_000, 4),
            # user 2 type x: identical ts tie — event_id order makes the
            # second a 0-gap drop
            (2, "x", base, 5),
            (2, "x", base, 6),
            # user 1 type y: independent key, first always kept
            (1, "y", base, 7),
        ]
        events = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] for r in rows], pa.int64()).cast(pa.timestamp("us")),
                "event_id": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
        pq.write_table(events, tmp_path / "events.parquet")
        out = {
            r["event_type"]: r["n_kept"]
            for r in QUERIES["events_debounced"](str(tmp_path)).take_all()
        }
        assert out == {"x": 4, "y": 1}
        assert dict(_oracle(tmp_path, "events_debounced", ["events"])) == out

    def test_exactly_60s_gap_is_dropped(self, ray_session, tmp_path):
        base = 1_000_000_000_000_000
        events = pa.table(
            {
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": pa.array(["x", "x"], pa.string()),
                "ts": pa.array([base, base + 60_000_000], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_id": pa.array([1, 2], pa.int64()),
            }
        )
        pq.write_table(events, tmp_path / "events.parquet")
        out = {
            r["event_type"]: r["n_kept"]
            for r in QUERIES["events_debounced"](str(tmp_path)).take_all()
        }
        assert out == {"x": 1}  # strict >60s: the boundary event drops
        assert dict(_oracle(tmp_path, "events_debounced", ["events"])) == out
