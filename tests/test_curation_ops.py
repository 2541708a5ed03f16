"""Hand-computed semantics pins for the curation-layer batch: C4-style
blocklist dictionary tagging, Flesch readability, prototype-distance
(label-centroid) outlier pruning, and association-rule lift.

Each test builds a tiny engineered parquet directory so every number is
checkable by hand, and cross-checks the Ray result against the registered
DuckDB oracle on the same files.  The sf0.001/0.01 sweeps cover the
generated corpus; these pin the edge semantics: case folding and leftmost
non-overlapping multi-word counts (blocklist), the syllable/sentence floors
and the exact float expression (Flesch), the (cos6, vec_id) ranking
contract (centroid outliers), and the distinct-basket projection + exact
int64 lift products (affinity)."""

from __future__ import annotations

import duckdb
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


class TestBlocklistTermStats:
    def test_case_fold_overlap_and_substring_semantics(self, ray_session, tmp_path):
        docs = [
            # case folding: all three count; "Spark" twice in one doc
            "Spark SPARK loves spark",
            # multi-word non-overlap: "batch batch batch" has ONE
            # "batch batch" (leftmost non-overlapping, Python str.count)
            "batch batch batch",
            # substring (not token) semantics: "dedup" contains "dup"
            "dedup dedup",
            "nothing matching at all",
        ]
        pq.write_table(
            pa.table({"text": pa.array(docs, pa.string())}),
            tmp_path / "documents.parquet",
        )
        rows = {
            r["term"]: (r["n_docs"], r["n_occurrences"])
            for r in QUERIES["blocklist_term_stats"](str(tmp_path)).take_all()
        }
        assert rows["spark"] == (1, 3)
        assert rows["batch batch"] == (1, 1)
        assert rows["dup"] == (1, 2)
        assert rows["noise"] == (0, 0)
        oracle = {t: (d, o) for t, d, o in _oracle(tmp_path, "blocklist_term_stats", ["documents"])}
        assert oracle == rows

    def test_null_text_counts_nothing(self, ray_session, tmp_path):
        pq.write_table(
            pa.table({"text": pa.array(["spark", None], pa.string())}),
            tmp_path / "documents.parquet",
        )
        rows = {
            r["term"]: (r["n_docs"], r["n_occurrences"])
            for r in QUERIES["blocklist_term_stats"](str(tmp_path)).take_all()
        }
        assert rows["spark"] == (1, 1)
        assert rows["scan"] == (0, 0)


class TestDocReadability:
    def test_hand_computed_flesch(self, ray_session, tmp_path):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(
                        [
                            # 5 words, syllables 2+1+1+1+2 = 7, 2 sentence runs
                            "Hello world. This is fine!",
                            # no vowels → 1 syllable per word floor; no
                            # punctuation → sentence floor of 1
                            "xyz zz",
                            # CJK words carry no [aeiouy] → floor of 1 each
                            "你好 世界",
                            # zero words → excluded on both engines
                            "",
                        ],
                        pa.string(),
                    ),
                }
            ),
            tmp_path / "documents.parquet",
        )
        rows = {
            r["doc_id"]: r
            for r in QUERIES["doc_readability"](str(tmp_path)).take_all()
        }
        assert set(rows) == {1, 2, 3}
        r1 = rows[1]
        assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 7)
        assert r1["flesch"] == round(206.835 - 1.015 * (5 / 2) - 84.6 * (7 / 5), 6)
        assert (rows[2]["n_syllables"], rows[2]["n_sentences"]) == (2, 1)
        assert (rows[3]["n_words"], rows[3]["n_syllables"]) == (2, 2)
        oracle = {
            r[0]: r for r in _oracle(tmp_path, "doc_readability", ["documents"])
        }
        assert set(oracle) == {1, 2, 3}
        for d in (1, 2, 3):
            assert oracle[d] == (
                rows[d]["doc_id"],
                rows[d]["n_words"],
                rows[d]["n_sentences"],
                rows[d]["n_syllables"],
                rows[d]["flesch"],
            )


class TestLabelCentroidOutliers:
    def test_hand_computed_cosines_and_rank_order(self, ray_session, tmp_path):
        # label 0 centroid-sum = [2, 2]; cos([1,0]) = cos([0,1]) = 0.707107,
        # cos([1,1]) = 1.0 → bottom order (cos6, vec_id): 10, 11, 12
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([10, 11, 12, 20], pa.int64()),
                    "embedding": pa.array(
                        [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [3.0, 4.0]],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array([0, 0, 0, 1], pa.int32()),
                }
            ),
            tmp_path / "embeddings.parquet",
        )
        out = QUERIES["label_centroid_outliers"](str(tmp_path)).take_all()
        rows = [(r["label"], r["vec_id"], r["cos_centroid"]) for r in out]
        rows.sort()
        assert rows == [
            (0, 10, 0.707107),
            (0, 11, 0.707107),
            (0, 12, 1.0),
            (1, 20, 1.0),
        ]
        assert sorted(_oracle(tmp_path, "label_centroid_outliers", ["embeddings"])) == rows

    def test_bottom5_prune_is_lossless(self, ray_session, tmp_path):
        # 8 vectors on one label with strictly increasing alignment to the
        # centroid direction — only the 5 least aligned survive
        vecs = [[1.0, float(i)] for i in range(8)]
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(list(range(8)), pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32())),
                    "label": pa.array([0] * 8, pa.int32()),
                }
            ),
            tmp_path / "embeddings.parquet",
        )
        out = QUERIES["label_centroid_outliers"](str(tmp_path)).take_all()
        assert len(out) == 5
        assert sorted(
            [(r["label"], r["vec_id"], r["cos_centroid"]) for r in out]
        ) == sorted(_oracle(tmp_path, "label_centroid_outliers", ["embeddings"]))


class TestPartAffinityLift:
    def test_distinct_projection_and_exact_lift(self, ray_session, tmp_path):
        # order 1: {1,2,3} (part 1 listed twice → distinct), order 2: {1,2},
        # order 3: {1,4}.  N=3; parts 1→3, 2→2, 3→1, 4→1.
        # pairs (1,2):2 lift 2·3/(3·2)=1.0, (1,3):1 lift 1.0, (2,3):1 lift
        # 1.5, (1,4):1 lift 1.0
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 1, 1, 2, 2, 3, 3], pa.int64()),
                    "l_partkey": pa.array([1, 1, 2, 3, 1, 2, 1, 4], pa.int64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        out = QUERIES["part_affinity_lift"](str(tmp_path)).to_pylist()
        rows = {(r["p1"], r["p2"]): (r["n_orders"], r["lift"]) for r in out}
        assert rows == {
            (1, 2): (2, 1.0),
            (1, 3): (1, 1.0),
            (2, 3): (1, 1.5),
            (1, 4): (1, 1.0),
        }
        oracle = {
            (p1, p2): (n, lift)
            for p1, p2, n, lift in _oracle(tmp_path, "part_affinity_lift", ["lineitem"])
        }
        assert oracle == rows


class TestMinhashEstimateError:
    def test_signature_and_exact_jaccard_pins(self, ray_session, tmp_path):
        import hashlib

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(
                        [
                            "a b c d",  # grams {a b c, b c d}; +appended adds 1
                            "",  # empty vs {"appended"} → est 0, exact 0
                            "hi",  # {"hi"} vs {"hi appended"} → 0
                        ],
                        pa.string(),
                    ),
                }
            ),
            tmp_path / "documents.parquet",
        )
        rows = {
            r["left"]: r
            for r in QUERIES["minhash_estimate_error"](str(tmp_path)).take_all()
        }
        assert rows[1]["ngram_jaccard"] == 2 / 3

        # independent recompute of the doc-1 estimate via the md5 bridge
        def h(i, g):
            return int.from_bytes(
                hashlib.md5(f"{i}|{g}".encode()).digest()[:8], "little"
            )

        ga = {"a b c", "b c d"}
        gb = {"a b c", "b c d", "c d appended"}
        eq = sum(
            1
            for i in range(16)
            if min(h(i, g) for g in ga) == min(h(i, g) for g in gb)
        )
        assert rows[1]["est_jaccard"] == eq / 16
        assert rows[1]["abs_err"] == abs(eq / 16 - 2 / 3)
        assert (rows[2]["est_jaccard"], rows[2]["ngram_jaccard"]) == (0.0, 0.0)
        assert (rows[3]["est_jaccard"], rows[3]["ngram_jaccard"]) == (0.0, 0.0)
        oracle = {
            r[0]: r
            for r in _oracle(tmp_path, "minhash_estimate_error", ["documents"])
        }
        for d in (1, 2, 3):
            assert oracle[d] == (
                rows[d]["left"],
                rows[d]["right"],
                rows[d]["ngram_jaccard"],
                rows[d]["est_jaccard"],
                rows[d]["abs_err"],
            )


class TestDocContainment:
    def test_half_in_full_and_edge_cases(self, ray_session, tmp_path):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(
                        [
                            # len 11 → half "a b c": gram {a b c} ⊆ full grams
                            "a b c d e f",
                            # half "ab cd" (2 words → joined gram) not a full
                            # trigram → 0.0
                            "ab cd ef gh",
                            # empty → vacuous containment 1.0
                            "",
                        ],
                        pa.string(),
                    ),
                }
            ),
            tmp_path / "documents.parquet",
        )
        rows = {
            r["right"]: r["containment"]
            for r in QUERIES["doc_containment"](str(tmp_path)).take_all()
        }
        assert rows == {1: 1.0, 2: 0.0, 3: 1.0}
        oracle = {
            r[1]: r[2] for r in _oracle(tmp_path, "doc_containment", ["documents"])
        }
        assert oracle == rows
