"""Byte-identity tests against the ACTUAL reference implementation.

Imports the reference package read-only from /root/reference/src and runs its
default deterministic path (regex detection + composite resolution +
deterministic fallback replacement — the tests/conftest.py:8-29 matrix) next
to our kernels on the synthetic pages corpus.  ``clean_text`` must match
byte-for-byte per url in both replace and blackbox modes.

The reference's HTML/PDF extractors need bs4/PyMuPDF (not installed), so
extraction runs through OUR kernel on both sides; everything downstream of
extracted text is compared against reference code directly.
"""

from __future__ import annotations

import os
import sys

import pytest

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module")
def reference():
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF_SRC)
    os.environ.setdefault("USE_STUB", "true")
    try:
        from deid_pipeline.pii.detectors.composite import CompositeDetector
        from deid_pipeline.pii.detectors.regex_detector import RegexDetector
        from deid_pipeline.pii.utils.replacer import Replacer
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")
    return {
        "det_zh": CompositeDetector(RegexDetector("/root/reference/configs/regex_zh.yaml")),
        "det_en": CompositeDetector(RegexDetector("/root/reference/configs/regex_en.yaml")),
        "replacer": Replacer(),
    }


def _our_entities(text: str, lang: str):
    from edge_deid_studio_ray.config import RULES_DIR
    from edge_deid_studio_ray.kernels import compile_rules, regex_detect, resolve_conflicts

    rules = str(RULES_DIR / f"regex_{lang}.yaml")
    return resolve_conflicts(regex_detect(text, compile_rules(rules)))


@pytest.mark.parametrize("mode", ["replace", "blackbox"])
def test_clean_text_byte_identical_on_pages_corpus(reference, mode):
    from edge_deid_studio_ray.kernels import context_hash, replace_text
    from edge_deid_studio_ray.kernels.docpipe import extract_page
    from edge_deid_studio_ray.sources.pages import synthesize_page

    for i in range(500):
        page = synthesize_page(i)
        lang = page["lang"]
        text, _, route, _ = extract_page(page["html"], page["text"], url=page["url"])

        ref_det = reference["det_zh"] if lang == "zh" else reference["det_en"]
        ref_entities = ref_det.detect(text)
        our_entities = _our_entities(text, lang)

        assert [(tuple(e["span"]), e["type"]) for e in ref_entities] == [
            (tuple(e["span"]), e["type"]) for e in our_entities
        ], f"entity mismatch on row {i} ({route})"

        ch = context_hash(text)
        ref_clean, _ = reference["replacer"].replace(text, ref_entities, mode=mode, context_hash=ch)
        our_clean, _ = replace_text(text, our_entities, mode, context_hash=ch)
        assert ref_clean == our_clean, f"clean_text mismatch on row {i} ({route}, {mode})"


def test_fallback_provider_matches_reference(reference):
    from deid_pipeline.pii.utils.fake_provider import FakeProvider

    from edge_deid_studio_ray.kernels import fallback_generate

    provider = FakeProvider()
    cases = [
        ("ID", "A123456789"),
        ("TW_ID", "B234567890"),
        ("PHONE", "0912-345-678"),
        ("EMAIL", "someone@example.com"),
        ("UNIFIED_BUSINESS_NO", "12345678"),
        ("PASSPORT", "PA1234567"),
        ("MEDICAL_ID", "M1234567"),
        ("CONTRACT_NO", "CN-000001"),
        ("ORGANIZATION", "Acme"),
        ("NAME", "王小明"),
        ("ADDRESS", "台北市信義路1號"),
        ("UNKNOWN_KIND", "xyz"),
    ]
    for ch in ("e" * 64, "f" * 64):
        for entity_type, original in cases:
            assert provider.generate_deterministic(
                entity_type, original, context_hash=ch
            ) == fallback_generate(entity_type, original, ch, "zh_TW")


def test_normalize_entity_matches_reference(reference):
    from deid_pipeline.core.contracts import normalize_entity as ref_normalize

    from edge_deid_studio_ray.kernels import normalize_entity

    cases = [
        {"type": "ID", "span": [1, 3], "score": 0.5},
        {"type": "PHONE", "span": (0, 4), "confidence": 0.9, "source": "bert"},
        {"type": "NAME", "span": [2, 5], "text": "abc", "language": "en"},
        {"type": "ADDRESS", "span": [0, 2], "page_index": 3, "bbox": [1.0, 2, 3, 4]},
    ]
    for case in cases:
        assert ref_normalize(dict(case), language="zh", text="abcdefgh") == normalize_entity(
            dict(case), language="zh", text="abcdefgh"
        )


def test_anchor_attachment_matches_reference(reference):
    from deid_pipeline.core.anchors import attach_segment_anchors as ref_attach
    from deid_pipeline.handlers.base import SegmentSpec, build_document_from_segments

    from edge_deid_studio_ray.kernels.anchors import attach_segment_anchors
    from edge_deid_studio_ray.kernels.segments import build_text_from_segments

    specs = [
        {"text": "abc", "page_index": 0, "bbox": (1, 2, 3, 4)},
        {"text": "defgh", "page_index": 1},
        {"text": "ij", "cell": {"sheet": "csv", "row": 1, "col": 1, "address": "R1C1"}},
    ]
    ref_doc = build_document_from_segments(
        input_path=__import__("pathlib").Path("/tmp/x.txt"),
        language="zh",
        segments=[SegmentSpec(text=s["text"], page_index=s.get("page_index"), bbox=s.get("bbox"), cell=s.get("cell")) for s in specs],
    )
    our_text, our_segments = build_text_from_segments(specs)
    assert ref_doc.text == our_text
    assert [(s.start, s.end) for s in ref_doc.segments] == [
        (s["start"], s["end"]) for s in our_segments
    ]

    for span in [(0, 2), (4, 8), (2, 5), (10, 12), (0, 12)]:
        ref_ents = [{"type": "ID", "span": span}]
        our_ents = [{"type": "ID", "span": span}]
        ref_attach(ref_ents, ref_doc.segments)
        attach_segment_anchors(our_ents, our_segments)
        assert ref_ents == our_ents, f"anchor mismatch for span {span}"


def test_full_reference_pipeline_end_to_end_on_txt(reference, tmp_path):
    """Strongest contract check: the reference's ACTUAL DeidPipeline.process
    (extract→detect→replace→normalize→rebuild wiring, __init__.py:49-148)
    runs end-to-end on .txt inputs (no optional deps on that route; cv2 is
    stubbed for the handler-registry import) and must agree with our kernel
    on clean_text, replacement_map, events, and entities."""
    import os
    import sys
    import types

    sys.modules.setdefault("cv2", types.ModuleType("cv2"))
    os.environ["REGEX_RULES_FILE"] = "/root/reference/configs/regex_zh.yaml"
    os.environ["REGEX_EN_RULES_FILE"] = "/root/reference/configs/regex_en.yaml"
    from deid_pipeline import DeidPipeline

    from edge_deid_studio_ray.kernels.docpipe import extract_page, process_document
    from edge_deid_studio_ray.kernels.synthetic import generate_synthetic_span_examples
    from edge_deid_studio_ray.sources.pages import synthesize_page

    corpus: list[str] = []
    corpus += [ex["text"] for ex in generate_synthetic_span_examples(num_examples=20, seed=3)]
    corpus += [
        ex["text"] for ex in generate_synthetic_span_examples(num_examples=10, seed=4, language="en")
    ]
    for i in range(40):
        page = synthesize_page(i)
        text, _, _, _ = extract_page(page["html"], page["text"], url=page["url"])
        corpus.append(text)

    pipeline = DeidPipeline(language="zh")
    for idx, text in enumerate(corpus):
        path = tmp_path / f"doc{idx}.txt"
        path.write_text(text, encoding="utf-8")
        ref = pipeline.process(str(path))
        mine = process_document(text=path.read_text(encoding="utf-8"), lang="zh")

        assert mine["clean_text"] == ref.text, idx
        assert mine["replacement_map"] == ref.replacement_map, idx
        assert [
            (e["entity_type"], e["original"], e["replacement"], (e["start"], e["end"]), e["source"])
            for e in mine["events"]
        ] == [
            (e["entity_type"], e["original"], e["replacement"], tuple(e["span"]), e["source"])
            for e in ref.events
        ], idx
        assert [
            (e["type"], (e["start"], e["end"]), e["confidence"], e["text"]) for e in mine["entities"]
        ] == [(e["type"], tuple(e["span"]), e["confidence"], e["text"]) for e in ref.entities], idx
