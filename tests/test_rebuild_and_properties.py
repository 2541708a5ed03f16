"""CSV rebuild parity vs the reference handler + hypothesis property tests
comparing kernels against the reference on randomized inputs."""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def ref_path():
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF_SRC)
    os.environ.setdefault("USE_STUB", "true")
    return REF_SRC


class TestCsvRebuildParity:
    def test_matches_reference_handler(self, ref_path, tmp_path):
        from deid_pipeline.handlers.csv import CsvHandler

        from edge_deid_studio_ray.config import EngineConfig
        from edge_deid_studio_ray.kernels.docpipe import process_document
        from edge_deid_studio_ray.kernels.rebuild import rebuild_csv

        payload = (
            "name,phone,id\n"
            "alice,0912-345-678,A123456789\n"
            "bob,0987-654-321,B234567890\n"
        )
        csv_path = tmp_path / "input.csv"
        csv_path.write_text(payload, encoding="utf-8")

        # our engine's full pass over the csv route
        row = process_document(
            html=payload.encode(), url="https://x/input.csv", lang="zh", cfg=EngineConfig()
        )
        mine = rebuild_csv(payload, row["entities"], row["replacement_map"])

        # the reference handler driven the same way: its extract + our
        # entities (spans identical by the parity suite) + same map
        handler = CsvHandler()
        document = handler.extract(csv_path, language="zh")
        assert document.text == row["extracted_text"]
        ref_entities = [
            {
                "type": e["type"],
                "text": e["text"],
                "cell": {"row": int(e["cell_address"][1:].split("C")[0]),
                         "col": int(e["cell_address"][1:].split("C")[1])},
            }
            for e in row["entities"]
            if e.get("cell_address")
        ]
        artifacts = handler.rebuild(
            document,
            output_text=row["clean_text"],
            entities=ref_entities,
            replacement_map=row["replacement_map"],
            events=[],
            output_dir=tmp_path / "out",
        )
        # compare raw bytes: csv.writer emits \r\n on both sides and
        # read_text would silently translate universal newlines
        ref_out = (tmp_path / "out" / "input.deid.csv").read_bytes().decode("utf-8")
        assert mine == ref_out
        # PII gone, replacements present
        assert "A123456789" not in mine and "0912-345-678" not in mine


entity_strategy = st.fixed_dictionaries(
    {
        "span": st.tuples(st.integers(0, 40), st.integers(0, 40)).map(
            lambda t: (min(t), max(t) + 1)
        ),
        "type": st.sampled_from(
            ["ID", "PHONE", "EMAIL", "NAME", "ADDRESS", "PASSPORT", "MEDICAL_ID", "X"]
        ),
        "score": st.sampled_from([0.3, 0.7, 1.0]),
        "source": st.sampled_from(["regex", "bert", "regex_stub"]),
    }
)


class TestRebuildDispatcher:
    def test_routes(self):
        from edge_deid_studio_ray.kernels.rebuild import rebuild_artifact

        text_out = rebuild_artifact(
            "html", b"<p>x</p>", output_text="clean text", entities=[], replacement_map={}
        )
        assert text_out == {"artifact": "clean text", "kind": "text", "rebuild_supported": True}

        csv_out = rebuild_artifact(
            "csv",
            b"name,phone\nbob,0912-345-678\n",
            output_text="",
            entities=[{"type": "PHONE", "text": "0912-345-678", "cell_address": "R2C2"}],
            replacement_map={"PHONE:0912-345-678": "0955-000-111"},
        )
        assert csv_out["kind"] == "csv"
        assert "0955-000-111" in csv_out["artifact"]

    def test_pdf_route_returns_redaction_fields(self):
        from edge_deid_studio_ray.kernels.docpipe import process_document
        from edge_deid_studio_ray.kernels.rebuild import rebuild_artifact
        from tests.test_minipdf import TWO_BLOCK_STREAM, build_pdf

        raw = build_pdf([TWO_BLOCK_STREAM])
        row = process_document(html=raw, url="https://x.test/a.pdf")
        out = rebuild_artifact(
            "pdf",
            raw,
            output_text=row["clean_text"],
            entities=row["entities"],
            replacement_map=row["replacement_map"],
        )
        assert out["kind"] == "pdf" and out["rebuild_supported"]
        assert out["redaction_count"] >= 1
        assert out["artifact"].startswith(b"%PDF-")


class TestHypothesisParity:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(entity_strategy, max_size=8))
    def test_resolve_conflicts_matches_reference(self, ref_path, entities):
        from deid_pipeline.pii.detectors.composite import CompositeDetector

        from edge_deid_studio_ray.kernels import resolve_conflicts

        ref = CompositeDetector()._resolve_conflicts([dict(e) for e in entities])
        mine = resolve_conflicts([dict(e) for e in entities])
        assert [(tuple(e["span"]), e["type"], e["source"]) for e in ref] == [
            (tuple(e["span"]), e["type"], e["source"]) for e in mine
        ]

    @settings(max_examples=100, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=60,
        ),
        st.lists(entity_strategy, max_size=4),
        st.sampled_from(["replace", "blackbox"]),
    )
    def test_replace_matches_reference(self, ref_path, text, entities, mode):
        from deid_pipeline.pii.utils.replacer import Replacer

        from edge_deid_studio_ray.kernels import context_hash, replace_text

        entities = [e for e in entities if e["span"][1] <= len(text)]
        ch = context_hash(text)
        ref_clean, _ = Replacer().replace(text, [dict(e) for e in entities], mode=mode, context_hash=ch)
        my_clean, _ = replace_text(text, [dict(e) for e in entities], mode, context_hash=ch)
        assert ref_clean == my_clean

    @settings(max_examples=150, deadline=None)
    @given(st.text(max_size=200))
    def test_regex_detect_matches_reference_on_random_text(self, ref_path, text):
        from deid_pipeline.pii.detectors.regex_detector import RegexDetector

        from edge_deid_studio_ray.config import RULES_DIR
        from edge_deid_studio_ray.kernels import compile_rules, regex_detect

        ref = RegexDetector("/root/reference/configs/regex_zh.yaml").detect(text)
        mine = regex_detect(text, compile_rules(str(RULES_DIR / "regex_zh.yaml")))
        assert [(tuple(e["span"]), e["type"]) for e in ref] == [
            (tuple(e["span"]), e["type"]) for e in mine
        ]
