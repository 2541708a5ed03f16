"""Round-4 hardening: coded triangle fallback, trigram vocab prune,
vectorized bucket keys."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_ibuckets_matches_kbucket_elementwise():
    from edge_deid_studio_ray.pipelines.queries import _ibuckets, _kbucket

    rng = np.random.default_rng(7)
    vals = rng.integers(-(10**12), 10**12, size=4096).tolist() + [0, -1, 1, 2**40]
    for nb in (7, 64, 251):
        expect = [_kbucket(int(v), nb) for v in vals]
        for source in (
            vals,
            np.asarray(vals, dtype=np.int64),
            pa.array(vals, pa.int64()),
            pa.chunked_array([pa.array(vals[:100], pa.int64()), pa.array(vals[100:], pa.int64())]),
        ):
            got = _ibuckets(source, nb).to_pylist()
            assert got == expect


def test_triangles_bucketed_path_matches_broadcast(ray_session):
    """VERDICT r3 #1b done-criterion: forcing the fully-bucketed wedge-join
    path (broadcast_edge_cap=0) must reproduce the broadcast path exactly."""
    from edge_deid_studio_ray.pipelines.queries import q_copurchase_triangles

    sf = "/root/testdata/sf0.001"
    broadcast = q_copurchase_triangles(sf)
    bucketed = q_copurchase_triangles(sf, broadcast_edge_cap=0)
    nb_ = int(broadcast["n_triangles"].iloc[0])
    assert nb_ > 0, "fixture corpus must contain triangles for this test to bite"
    assert nb_ == int(bucketed["n_triangles"].iloc[0])


def test_wedge_pair_chunks_cover_triangular_space():
    from edge_deid_studio_ray.pipelines.queries import _wedge_pair_chunks

    nbrs = np.arange(10, 75, dtype=np.int64)  # d=65 -> C(65,2)=2080 pairs
    got = np.concatenate(list(_wedge_pair_chunks(nbrs, cap=100)))
    d = nbrs.size
    i, j = np.triu_indices(d, k=1)
    expect = (nbrs[i] << 32) | nbrs[j]
    assert sorted(got.tolist()) == sorted(expect.tolist())
    assert got.size == d * (d - 1) // 2
    assert list(_wedge_pair_chunks(np.array([5], dtype=np.int64))) == []


class TestTrigramPrune:
    def _wide_charset_corpus(self, ray_session=None):
        """Synthetic CJK-like corpus: a huge fraction of trigram types are
        singletons (the Heap's-law regime the prune exists for)."""
        import ray.data as rd

        rng = np.random.default_rng(11)
        charset = [chr(0x4E00 + i) for i in range(600)]
        core = "資料處理引擎批次串流"  # repeated in every doc -> survives the prune
        texts = [
            core + "".join(rng.choice(charset) for _ in range(120)) for _ in range(60)
        ]
        t = pa.table(
            {
                "doc_id": pa.array(range(60), pa.int64()),
                "lang": pa.array(["zh"] * 60, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )
        return rd.from_arrow(t), texts

    def test_min_count_prune_bounds_model_and_records_stats(self, ray_session):
        from collections import Counter

        from edge_deid_studio_ray.functions.corpusops import trigram_model

        ds, texts = self._wide_charset_corpus()
        stats: dict = {}
        logp, denoms = trigram_model(ds, min_count=2, prune_stats=stats)

        # ground truth from the raw texts
        c: Counter = Counter()
        for t in texts:
            for i in range(len(t) - 2):
                c[t[i : i + 3]] += 1
        kept = {g: n for g, n in c.items() if n >= 2}
        dropped = {g: n for g, n in c.items() if n < 2}

        assert set(k[1] for k in logp) == set(kept)
        n_l, v_l = denoms["zh"]
        assert n_l == sum(kept.values()) and v_l == len(kept)
        assert stats["zh"]["kept_types"] == len(kept)
        assert stats["zh"]["dropped_types"] == len(dropped)
        assert stats["zh"]["dropped_tokens"] == sum(dropped.values())
        # the point of the prune: a wide random charset is nearly all
        # singletons, so the broadcast table collapses
        assert len(dropped) > 20 * max(1, len(kept))

    def test_min_count_one_is_identity(self, ray_session):
        from edge_deid_studio_ray.functions.corpusops import trigram_model

        ds, _ = self._wide_charset_corpus()
        base = trigram_model(ds)
        stats: dict = {}
        same = trigram_model(ds, min_count=1, prune_stats=stats)
        assert base[0] == same[0] and base[1] == same[1]
        assert stats["zh"]["dropped_types"] == 0

    def test_fully_pruned_language_is_excluded_from_scoring(self, ray_session):
        import ray.data as rd

        from edge_deid_studio_ray.functions.corpusops import (
            trigram_model,
            trigram_nll_scores,
        )

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "lang": pa.array(["xx", "en"], pa.string()),
                # 'xx' doc: every trigram unique -> fully pruned at min_count=2
                "text": pa.array(["abcdefghij", "aaaa aaaa aaaa"], pa.string()),
            }
        )
        ds = rd.from_arrow(t)
        logp, denoms = trigram_model(ds, min_count=2)
        assert "xx" not in denoms and "en" in denoms
        rows = trigram_nll_scores(ds, logp, denoms).take_all()
        assert sorted(r["doc_id"] for r in rows) == [2]


class TestBridgeLsh:
    def test_bridge_gaussian_deterministic_and_standard(self):
        from edge_deid_studio_ray.functions.simsearch import bridge_gaussian

        vals = [bridge_gaussian(f"hp:29:{t}:{p}:{d}") for t in range(4) for p in range(4) for d in range(16)]
        assert vals == [bridge_gaussian(f"hp:29:{t}:{p}:{d}") for t in range(4) for p in range(4) for d in range(16)]
        # crude standard-normal sanity: mean ~0, sd ~1 over 256 draws
        m = sum(vals) / len(vals)
        sd = (sum((v - m) ** 2 for v in vals) / len(vals)) ** 0.5
        assert abs(m) < 0.25 and 0.75 < sd < 1.25

    def test_sign_round_dp_changes_only_boundary_dots(self):
        import numpy as np

        from edge_deid_studio_ray.functions.simsearch import hyperplane_bucket

        rng = np.random.default_rng(3)
        mat = rng.standard_normal((50, 8))
        planes = rng.standard_normal((4, 8))
        plain = hyperplane_bucket(mat, planes)
        rounded = hyperplane_bucket(mat, planes, sign_round_dp=12)
        # dots here are O(1), far from the 1e-12 grid: identical buckets
        assert plain.tolist() == rounded.tolist()


class TestSynthQualityFixture:
    """The corruption slice must surface every validate_span_example issue
    kind, and the fixture writer must mirror the distributed mutation."""

    def test_mutation_variants_cover_all_issue_kinds(self):
        from edge_deid_studio_ray.kernels.quality import validate_span_example
        from edge_deid_studio_ray.pipelines.queries import (
            _SYNTH_MUTATE_EVERY,
            _mutate_arrow_entities,
        )

        text = "hello world example"
        base = [
            {"type": "NAME", "start": 0, "end": 5, "text": "hello",
             "confidence": 1.0, "source": "synthetic", "language": "zh"},
            {"type": "ID", "start": 6, "end": 11, "text": "world",
             "confidence": 1.0, "source": "synthetic", "language": "zh"},
        ]
        kinds = set()
        for v in range(5):
            i = v * _SYNTH_MUTATE_EVERY
            mutated = _mutate_arrow_entities(i, text, [dict(e) for e in base])
            ents = [{**e, "span": (e["start"], e["end"])} for e in mutated]
            for issue in validate_span_example(text, ents):
                kinds.add(issue["kind"])
        assert kinds == {
            "missing_type", "span_out_of_bounds", "empty_span",
            "text_mismatch", "overlap",
        }
        # non-slice rows pass through untouched
        assert _mutate_arrow_entities(1, text, base) is base

    def test_fixture_mirrors_distributed_mutation(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from edge_deid_studio_ray.pipelines import queries as q

        ex_path, ent_path = q._ensure_synth_fixture("/root/testdata/sf0.001")
        ex = pq.read_table(ex_path)
        ent = pq.read_table(ent_path)
        assert ex.num_rows == q._synth_rows_for("/root/testdata/sf0.001")
        # the distributed query path regenerates the same mutated rows:
        # re-derive entity tuples for a handful of examples straight from
        # the seeded generator + mutation kernel
        from edge_deid_studio_ray.kernels.synthetic import generate_synthetic_span_examples
        from edge_deid_studio_ray.pipelines.training_data import _entities_to_arrow

        exs = generate_synthetic_span_examples(num_examples=ex.num_rows, seed=9, language="zh")
        by_ex: dict[int, list] = {}
        for eid, t, s, e, tx in zip(
            ent["example_id"].to_pylist(), ent["type"].to_pylist(),
            ent["start"].to_pylist(), ent["end"].to_pylist(),
            ent["ent_text"].to_pylist(),
        ):
            by_ex.setdefault(eid, []).append((t, s, e, tx))
        for i in [0, 1, 37, 74, 111, 148, 185]:
            expect = [
                (e["type"], e["start"], e["end"], e["text"])
                for e in q._mutate_arrow_entities(
                    i, exs[i]["text"], _entities_to_arrow(exs[i]["entities"])
                )
            ]
            assert by_ex.get(i, []) == expect, i


class TestNewOpsBucketInvariance:
    """The continuation-session co-group operators must produce identical
    results under any EDS_GROUP_BUCKETS value (physical knob only)."""

    NAMES = [
        "nb_lang_confusion",
        "chi2_term_lang",
        "k_anonymity_audit",
        "lang_jsd_divergence",
        "events_funnel_conformance",
        "copurchase_kcore",
    ]

    def _canon(self, result):
        import pandas as pd
        from ray.data import Dataset

        if isinstance(result, Dataset):
            df = result.to_pandas()
        elif isinstance(result, pa.Table):
            df = result.to_pandas()
        else:
            df = result
        df = df[sorted(df.columns)].copy()
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

    def test_results_invariant_under_bucket_count(self, ray_session, monkeypatch):
        from edge_deid_studio_ray.pipelines.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        base = {n: self._canon(QUERIES[n](sf)) for n in self.NAMES}
        monkeypatch.setenv("EDS_GROUP_BUCKETS", "5")
        for n in self.NAMES:
            again = self._canon(QUERIES[n](sf))
            assert again.equals(base[n]), n


class TestLevenshteinOracleEquivalence:
    """The funnel-conformance DP must be bit-identical to DuckDB's
    levenshtein (the oracle function) on arbitrary strings."""

    def test_hypothesis_matches_duckdb(self):
        import duckdb
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from edge_deid_studio_ray.pipelines.queries import _levenshtein as lev

        con = duckdb.connect()
        alphabet = st.text(alphabet="svcpe?", max_size=24)

        @settings(max_examples=200, deadline=None)
        @given(alphabet, alphabet)
        def check(a, b):
            got = con.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
            assert lev(a, b) == got, (a, b)

        check()


class TestRound4WrapOps:
    """Link inversion (pages_anchor_text), CCNet line dedup
    (pages_line_dedup) and the script-mix gate (doc_script_ratios).
    The oracle sweep pins them against DuckDB; these tests pin the parts
    SQL can't: UTF-32 codepoint semantics (astral chars count once) and
    the structural invariants of the aggregations."""

    def test_script_ratios_astral_and_cjk(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from edge_deid_studio_ray.pipelines.queries import q_doc_script_ratios

        t = pa.table(
            {
                "text": pa.array(["ab1 \U0001F680\U0001F680漢字", "\U0001F30D xyz", None, ""], pa.string()),
                "lang": pa.array(["en", "en", "zh", "zh"], pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        got = q_doc_script_ratios(str(tmp_path)).to_pandas().set_index("lang")
        en = got.loc["en"]
        assert int(en["n_alpha"]) == 5 and int(en["n_digit"]) == 1
        assert int(en["n_space"]) == 2 and int(en["n_cjk"]) == 2
        # astral chars are ONE codepoint each in UTF-32: 8 + 5
        assert int(en["n_chars"]) == 13
        zh = got.loc["zh"]
        assert int(zh["n_chars"]) == 0 and int(zh["n_cjk"]) == 0

    def test_script_ratios_matches_python_recount(self, ray_session):
        import pyarrow.parquet as pq

        from edge_deid_studio_ray.pipelines.queries import q_doc_script_ratios

        sf = "/root/testdata/sf0.001"
        got = q_doc_script_ratios(sf).to_pandas().set_index("lang").sort_index()
        t = pq.read_table(f"{sf}/documents.parquet", columns=["text", "lang"])
        from collections import defaultdict

        agg = defaultdict(lambda: [0] * 5)
        for text, lang in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
            a = agg[lang]
            for ch in text or "":
                o = ord(ch)
                a[0] += (65 <= o <= 90) or (97 <= o <= 122)
                a[1] += 48 <= o <= 57
                a[2] += o in (32, 9, 10, 13)
                a[3] += 0x4E00 <= o <= 0x9FFF
                a[4] += 1
        assert set(got.index) == set(agg)
        for lang, (na, nd, nsp, nc, nch) in agg.items():
            row = got.loc[lang]
            assert (
                int(row["n_alpha"]),
                int(row["n_digit"]),
                int(row["n_space"]),
                int(row["n_cjk"]),
                int(row["n_chars"]),
            ) == (na, nd, nsp, nc, nch)

    def test_pages_line_dedup_finds_template_lines(self, ray_session):
        from edge_deid_studio_ray.pipelines.queries import q_pages_line_dedup

        df = q_pages_line_dedup("/root/testdata/sf0.001").to_pandas()
        assert len(df) > 0
        assert (df["n_pages"] >= 2).all()
        assert (df["n_total"] >= df["n_pages"]).all()
        # boilerplate lines are nav/footer template tokens, not content
        assert int(df["line"].str.len().max()) < 200

    def test_pages_pii_density_invariants(self, ray_session):
        from edge_deid_studio_ray.pipelines.queries import q_pages_pii_density

        df = q_pages_pii_density("/root/testdata/sf0.001").to_pandas()
        assert len(df) > 0
        assert (df["n_chars"] >= df["n_pages"]).all()
        assert (df["n_pii"] >= 0).all()
        # the synthetic corpus embeds PII in content paragraphs, so the
        # token contract must fire somewhere
        assert int(df["n_pii"].sum()) > 0

    def test_pages_anchor_text_invariants(self, ray_session):
        from edge_deid_studio_ray.pipelines.queries import q_pages_anchor_text

        df = q_pages_anchor_text("/root/testdata/sf0.001").to_pandas()
        assert len(df) > 0
        assert (df["top_anchor_n"] <= df["n_total"]).all()
        assert (df["n_anchors"] >= 1).all()
        assert df["href"].str.startswith("/").all()
        assert df["href"].is_unique

    def test_copurchase_assortativity_bounds_and_moments(self, ray_session):
        from edge_deid_studio_ray.pipelines.queries import q_copurchase_assortativity

        df = q_copurchase_assortativity("/root/testdata/sf0.001")
        row = df.iloc[0]
        assert row["m_edges"] > 0
        # Σ(j+k) over edges = Σ_u d_u² ≥ 2M (every degree ≥ 1)
        assert row["sum_d2"] >= 2 * row["m_edges"]
        assert row["sum_d3"] >= row["sum_d2"]
        assert -1.0 <= row["assortativity"] <= 1.0

    def test_embedding_covariance_diagonal_matches_variance(self, ray_session):
        import pyarrow.parquet as pq

        from edge_deid_studio_ray.pipelines.queries import q_embedding_covariance

        sf = "/root/testdata/sf0.001"
        got = q_embedding_covariance(sf).to_pandas()
        t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        q = np.floor(mat * 1e6 + 0.5)
        n = q.shape[0]
        # independent recount of one diagonal and one off-diagonal cell
        for i, j in [(0, 0), (0, 1), (5, 9)]:
            num = n * float((q[:, i] * q[:, j]).sum()) - q[:, i].sum() * q[:, j].sum()
            expect = round(num / n / n / 1e12, 6)
            cell = got[(got["i"] == i) & (got["j"] == j)]["cov"].iloc[0]
            assert abs(cell - expect) < 2e-6
        # upper triangle only, all dims present
        assert (got["i"] <= got["j"]).all()
        d = int(got["j"].max()) + 1
        assert len(got) == d * (d + 1) // 2


class TestLinkPagerank:
    def test_pagerank_invariants(self, ray_session):
        """Integer PageRank over the extracted outlink graph: mass is
        conserved up to floor losses, every rank carries at least the
        teleport floor, and the top-20 are the in-link-rich landing pages
        (doc pages have zero in-degree by construction of the synthetic
        corpus — all links point at root-relative nav/footer targets)."""
        from edge_deid_studio_ray.pipelines.queries import q_link_pagerank

        df = q_link_pagerank("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 20
        assert (df["rank"] > 0).all()
        # sorted (rank desc, url asc)
        assert list(df["rank"]) == sorted(df["rank"], reverse=True)
        # top of the ranking is landing pages, not the zero-in-degree docs
        assert not df["url"].str.contains("/doc").any()
        # landing pages are root-relative resolutions on a crawled host
        assert df["url"].str.match(r"https://site\d+\.example/").all()


class TestAllPairsJaccard:
    def test_prefix_filter_join_invariants(self, ray_session):
        """The exact prefix-filter join: ordered pairs, τ respected, and
        every perturbed twin of a ≥5-word doc qualifies (appending one word
        to a doc with g 5-grams gives J = g/(g+5) ≥ 0.8 whenever g ≥ 20)."""
        import pyarrow.parquet as pq

        from edge_deid_studio_ray.pipelines.queries import q_allpairs_jaccard_join

        sf = "/root/testdata/sf0.001"
        df = q_allpairs_jaccard_join(sf).to_pandas()
        assert len(df) > 0
        assert (df["left"] < df["right"]).all()
        assert (df["jaccard"] >= 0.8).all() and (df["jaccard"] <= 1.0).all()
        docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
        twins = set()
        for _, r in docs.iterrows():
            w = (r["text"] or "").lower().split()
            g = max(len(w) - 4, 1) if w else 0
            if g >= 20:
                twins.add((int(r["doc_id"]), int(r["doc_id"]) + 1_000_000))
        got = set(zip(df["left"], df["right"]))
        missing = twins - got
        assert not missing, f"prefix filter missed {len(missing)} guaranteed twins"
