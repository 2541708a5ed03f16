"""Legacy spaCy + EntityRuler detector stage (A4)."""

import pyarrow as pa
import pytest

from edge_deid_studio_ray.config import EngineConfig
from edge_deid_studio_ray.stages.spacy_detect import (
    FakeSpacyPipeline,
    SpacyDetectStage,
    load_spacy_pipeline,
    spacy_detect,
)


class TestSpacyDetect:
    def test_label_mapping_and_backstop_order(self):
        import re

        patterns = [("PHONE", re.compile(r"09\d{2}-\d{3}-\d{3}"))]
        nlp = FakeSpacyPipeline(patterns)
        text = "John Smith of Acme Corp called 0912-345-678 from Taipei"
        ents = spacy_detect(text, nlp, patterns)
        # pipeline ents map through SPACY_TO_PII_TYPE with (0.99, "spacy");
        # the regex backstop re-emits the phone with (1.0, "regex")
        got = {(e["type"], e["source"]) for e in ents}
        assert ("NAME", "spacy") in got
        assert ("ORGANIZATION", "spacy") in got
        assert ("ADDRESS", "spacy") in got  # Taipei via GPE
        assert ("PHONE", "spacy") in got  # EntityRuler-injected pattern
        assert ("PHONE", "regex") in got  # separate backstop pass
        starts = [e["span"][0] for e in ents]
        assert starts == sorted(starts)
        for e in ents:
            if e["source"] == "spacy":
                assert e["score"] == 0.99
            else:
                assert e["score"] == 1.0

    def test_unmapped_labels_dropped(self):
        class WeirdPipeline(FakeSpacyPipeline):
            def __call__(self, text):
                doc = super().__call__(text)

                class _E:
                    label_ = "DATE"
                    start_char = 0
                    end_char = 4

                doc.ents = list(doc.ents) + [_E()]
                return doc

        ents = spacy_detect("2024 plain text", WeirdPipeline([]), [])
        assert all(e["type"] != "DATE" for e in ents)

    def test_real_spacy_import_gated(self):
        with pytest.raises(NotImplementedError, match="spaCy is not installed"):
            load_spacy_pipeline("zh_core_web_sm", [])


class TestSpacyDetectStage:
    def test_actor_pool_stage(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": [
                        "contact John Smith at 0912-345-678",
                        "nothing personal here",
                    ],
                }
            )
        )
        out = ds.map_batches(
            SpacyDetectStage,
            fn_constructor_kwargs={"cfg": EngineConfig(), "lang": "zh"},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=1,
            num_cpus=1,
        ).take_all()
        by_id = {r["doc_id"]: r["entities"] for r in out}
        types = {e["type"] for e in by_id[1]}
        assert "NAME" in types and "PHONE" in types
        # conflict resolution kept one entity per span region
        spans = [(e["start"], e["end"]) for e in by_id[1]]
        assert len(spans) == len(set(spans))
        assert by_id[2] == []
