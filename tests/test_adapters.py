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


class TestGpt2Provider:
    """The GPT-2 generate provider shell (reference fake_provider.py:184-223)
    driven end to end with a deterministic fake causal LM — the prompting /
    greedy-decode / 'Replacement:'-split path all execute; only the HF model
    load is import-gated."""

    @staticmethod
    def _fake_lm():
        import numpy as np

        class Enc:
            def __init__(self, ids):
                self.input_ids = np.array([ids], dtype=np.int64)

        class FakeTokenizer:
            """Char-codepoint 'tokens'; decode == chr-join. Greedy LM below
            appends a deterministic surrogate derived from the prompt."""

            eos_token_id = 0

            def __call__(self, prompt, return_tensors=None):
                return Enc([ord(c) for c in prompt])

            def decode(self, ids, skip_special_tokens=False):
                return "".join(chr(int(i)) for i in ids if int(i) != 0)

        class FakeCausalLM:
            def generate(self, input_ids, max_length, num_return_sequences, do_sample, pad_token_id):
                import numpy as np

                assert do_sample is False  # greedy, as the reference pins
                prompt = "".join(chr(int(i)) for i in input_ids[0])
                # deterministic function of the prompt: surrogate token
                tag = f" FAKE-{sum(input_ids[0].tolist()) % 9973:04d}"
                new = [ord(c) for c in tag][: max_length - input_ids.shape[1]]
                out = np.concatenate([input_ids[0], np.array(new, dtype=np.int64)])
                return out[None, :]

        return FakeTokenizer(), FakeCausalLM()

    def test_generate_path_prompting_and_split(self):
        from edge_deid_studio_ray.kernels.replace import Gpt2Provider

        tok, lm = self._fake_lm()
        provider = Gpt2Provider(tokenizer=tok, model=lm)
        out = provider.generate("NAME", "John Smith", "h1", "en_US")
        assert out.startswith("FAKE-") and len(out) == 9
        # deterministic: same inputs → same surrogate
        assert out == provider.generate("NAME", "John Smith", "h2", "zh_TW")
        # different original → different prompt → different surrogate
        assert out != provider.generate("NAME", "Alice Chen", "h1", "en_US")

    def test_replace_text_through_gpt2_seam(self):
        from edge_deid_studio_ray.kernels.replace import Gpt2Provider, replace_text

        tok, lm = self._fake_lm()
        provider = Gpt2Provider(tokenizer=tok, model=lm)
        text = "patient John Smith arrived"
        ents = [{"type": "NAME", "span": (8, 18)}]
        clean, events = replace_text(text, ents, "replace", provider=provider)
        assert clean.startswith("patient FAKE-") and clean.endswith(" arrived")
        assert events[0]["original"] == "John Smith"

    def test_registry_name_and_import_gate(self):
        import pytest as _pytest

        from edge_deid_studio_ray.kernels.replace import _PROVIDERS, Gpt2Provider

        assert _PROVIDERS["gpt2"] is Gpt2Provider
        with _pytest.raises(NotImplementedError, match="transformers"):
            Gpt2Provider("/nonexistent/gpt2")

    def test_custom_registration_with_injected_lm(self):
        from edge_deid_studio_ray.kernels.replace import (
            Gpt2Provider,
            get_provider,
            register_provider,
        )

        fake = self._fake_lm()

        class TestLmProvider(Gpt2Provider):
            def __init__(self):
                super().__init__(tokenizer=fake[0], model=fake[1])

        register_provider("gpt2_test", TestLmProvider)
        p = get_provider("gpt2_test")
        assert p.generate("PHONE", "0912-345-678", "h", "zh_TW").startswith("FAKE-")
