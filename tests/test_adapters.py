"""Offline dataset adapters (S11) + replacement Provider seam.

Mirrors /root/reference/tests/test_training_adapters.py cases plus the
Ray-Dataset shells and the Replacer(provider=) injection seam."""

import pyarrow as pa
import pytest

from edge_deid_studio_ray.pipelines.adapters import (
    WIKIANN_ID2LABEL,
    decode_bio_spans,
    masked_pair_span_dataset,
    normalize_bio_tag,
    token_ner_span_dataset,
)


class TestBioDecode:
    def test_span_example_builds_entities(self):
        # reference test_token_examples_to_span_examples_builds_entities
        text, entities = decode_bio_spans(
            ["John", "Smith", "works"], ["B-NAME", "I-NAME", "O"], language="en"
        )
        assert text == "John Smith works"
        assert len(entities) == 1
        ent = entities[0]
        assert ent["type"] == "NAME"
        assert text[ent["span"][0] : ent["span"][1]] == "John Smith"

    def test_normalize_bio_tag_canonical_map(self):
        assert normalize_bio_tag("B-PER") == "B-NAME"
        assert normalize_bio_tag("I-LOC") == "I-ADDRESS"
        assert normalize_bio_tag("ORG") == "ORGANIZATION"
        assert normalize_bio_tag("O") == "O"
        assert normalize_bio_tag("") == "O"

    def test_type_change_without_b_tag_splits_entities(self):
        text, entities = decode_bio_spans(
            ["Paris", "John"], ["I-ADDRESS", "I-NAME"], language="en"
        )
        assert [e["type"] for e in entities] == ["ADDRESS", "NAME"]

    def test_b_tag_splits_adjacent_entities(self):
        text, entities = decode_bio_spans(
            ["John", "Mary"], ["B-NAME", "B-NAME"], language="en"
        )
        assert len(entities) == 2
        assert [e["text"] for e in entities] == ["John", "Mary"]


class TestTokenNerDataset:
    def test_integer_tags_through_label_list(self, ray_session):
        import ray.data as rd

        # wikiann-shaped dump: tags are ids into WIKIANN_ID2LABEL
        ds = rd.from_arrow(
            pa.table(
                {
                    "tokens": [["John", "Smith", "visited", "Paris"]],
                    "tags": [[2, 5, 6, 0]],  # B-PER I-PER O B-LOC
                }
            )
        )
        out = token_ner_span_dataset(
            ds, tags_field="tags", tag_names=WIKIANN_ID2LABEL
        ).take_all()
        assert len(out) == 1
        ents = out[0]["entities"]
        assert [(e["type"], e["text"]) for e in ents] == [
            ("NAME", "John Smith"),
            ("ADDRESS", "Paris"),
        ]

    def test_integer_tags_without_mapping_raise(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"tokens": [["x"]], "ner_tags": [[1]]}))
        with pytest.raises(Exception, match="label mapping|RuntimeError"):
            token_ner_span_dataset(ds).take_all()

    def test_string_tags_and_field_inference(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table({"tokens": [["Acme", "Corp"]], "ner_tags": [["B-ORG", "I-ORG"]]})
        )
        out = token_ner_span_dataset(ds).take_all()
        assert out[0]["entities"][0]["type"] == "ORGANIZATION"
        assert out[0]["text"] == "Acme Corp"


class TestMaskedPairDataset:
    def test_recovers_gold_spans(self, ray_session):
        import ray.data as rd

        # reference test_masked_pair_extraction_finds_spans_and_types,
        # through the Dataset shell with field-candidate inference
        ds = rd.from_arrow(
            pa.table(
                {
                    "original_text": ["My name is John Smith and phone 0912345678."],
                    "anonymized_text": ["My name is <NAME> and phone <PHONE>."],
                }
            )
        )
        out = masked_pair_span_dataset(ds).take_all()
        assert len(out) == 1
        row = out[0]
        types = {e["type"] for e in row["entities"]}
        assert "NAME" in types and "PHONE" in types
        for e in row["entities"]:
            assert row["text"][e["start"] : e["end"]] == e["text"]

    def test_rows_without_entities_dropped(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "text": ["nothing masked here", ""],
                    "masked_text": ["nothing masked here", "<NAME>"],
                }
            )
        )
        assert masked_pair_span_dataset(ds).count() == 0


class TestProviderSeam:
    def test_default_matches_fallback_generate(self):
        from edge_deid_studio_ray.kernels.replace import fallback_generate, replace_text

        text = "call 0912-345-678 now"
        ents = [{"type": "PHONE", "span": (5, 17)}]
        clean, events = replace_text(text, ents, "replace", context_hash="h1")
        assert events[0]["replacement"] == fallback_generate("PHONE", "0912-345-678", "h1", "zh_TW")

    def test_injected_provider_changes_output(self):
        from edge_deid_studio_ray.kernels.replace import Provider, replace_text

        class UpperProvider(Provider):
            def generate(self, entity_type, original, context_hash, locale):
                return f"[{entity_type}]"

        text = "call 0912-345-678 now"
        ents = [{"type": "PHONE", "span": (5, 17)}]
        clean, _ = replace_text(text, ents, "replace", provider=UpperProvider())
        assert clean == "call [PHONE] now"

    def test_registry_and_config_wiring(self):
        from edge_deid_studio_ray.config import EngineConfig
        from edge_deid_studio_ray.kernels.docpipe import process_document
        from edge_deid_studio_ray.kernels.replace import get_provider

        assert type(get_provider("fallback")).__name__ == "FallbackProvider"
        row = process_document(
            text="phone 0912-345-678", cfg=EngineConfig(provider_name="mask")
        )
        assert any(ev["replacement"].startswith("<PHONE:") for ev in row["events"])

    def test_unknown_provider_raises(self):
        from edge_deid_studio_ray.kernels.replace import get_provider

        with pytest.raises(KeyError, match="unknown provider"):
            get_provider("nope-not-registered")
