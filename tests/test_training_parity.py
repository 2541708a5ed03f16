"""Parity tests for training-side kernels vs the ACTUAL reference modules."""

from __future__ import annotations

import os
import sys

import pytest

REF_SRC = "/root/reference/src"


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF_SRC)
    os.environ.setdefault("USE_STUB", "true")
    yield


def test_canonicalize_entity_type_parity():
    from deid_pipeline.training.canonical import canonicalize_entity_type as ref

    from edge_deid_studio_ray.kernels.canonical import canonicalize_entity_type as mine

    cases = [
        "PER", "LASTNAME_1", "PATIENT_LAST_NAME", "user-name", "IP",
        "ip_address_2", "weird!!type", "DOB", "CREDITCARD", "license-plate-3",
        "tel_home", "X", "EMAIL_ADDR", "BANKACCT", "zip_code", "AGE_1",
        "MED_RECORD_ID", "WEBSITE_URL", "DATETIME_STAMP", "HOSPITAL_2",
    ]
    for case in cases:
        assert ref(case) == mine(case), case
    assert ref(None) == mine(None) is None
    assert ref("") == mine("") is None


def test_placeholders_parity():
    from deid_pipeline.training.placeholders import (
        canonicalize_placeholder_text as ref_canon,
        contains_cjk as ref_cjk,
        replace_spans_with_placeholders as ref_replace,
    )

    from edge_deid_studio_ray.kernels.markup import (
        canonicalize_placeholder_text as my_canon,
        contains_cjk as my_cjk,
        replace_spans_with_placeholders as my_replace,
    )

    text = "Call John at 0912345678 or <LASTNAME_1> home [EMAIL_2] {PHONE} 王"
    ents = [
        {"type": "NAME", "span": (5, 9)},
        {"type": "PHONE", "span": (13, 23)},
        {"type": "BAD", "span": (999, 1000)},  # out of bounds → dropped
        {"type": None, "span": (0, 4)},        # unmappable → dropped
    ]
    assert ref_replace(text, ents) == my_replace(text, ents)
    assert ref_canon(text) == my_canon(text)
    assert ref_cjk(text) == my_cjk(text) is True
    assert ref_cjk("abc") == my_cjk("abc") is False


def test_pii_markup_parity():
    from deid_pipeline.training.pii_markup import (
        extract_pii_blocks as ref_extract,
        mask_pii_blocks as ref_mask,
        mask_spans as ref_mask_spans,
    )

    from edge_deid_studio_ray.kernels.markup import (
        extract_pii_blocks as my_extract,
        mask_pii_blocks as my_mask,
        mask_spans as my_mask_spans,
    )

    for text in (
        "a <PII type='NAME'>John</PII> b [PHONE]0912[/PHONE] c",
        "only [ID]A123456789[/ID] bracket",
        'xml <PII type="EMAIL">a@b.c</PII> wins over [X]y[/X]',
        "no markup at all",
    ):
        ref_blocks, my_blocks = ref_extract(text), my_extract(text)
        assert [
            (b.pii_type, b.value, b.value_span, b.block_span) for b in ref_blocks
        ] == [
            (b["pii_type"], b["value"], tuple(b["value_span"]), tuple(b["block_span"]))
            for b in my_blocks
        ]
        assert ref_mask(text, ref_blocks) == my_mask(text, my_blocks)
    assert ref_mask_spans("abcdef", [(1, 3), (4, 5)], placeholder="*") == my_mask_spans(
        "abcdef", [(1, 3), (4, 5)], placeholder="*"
    )


def test_masked_pair_parity():
    from deid_pipeline.training.masked_pairs import extract_entities_from_masked_pair as ref

    from edge_deid_studio_ray.kernels.markup import extract_entities_from_masked_pair as mine

    cases = [
        ("John Smith called 0912345678 from 1 Main St today",
         "<NAME> <NAME> called <PHONE> from <ADDRESS> today"),
        ("Alice wrote to bob@x.com twice", "Alice wrote to [EMAIL] twice"),
        ("one two three four", "one {ID_1} {PHONE_2} four"),
        ("merged span of many tokens here", "merged <PII> here"),
        ("identical text", "identical text"),
    ]
    for orig, masked in cases:
        r, m = ref(orig, masked), mine(orig, masked)
        assert [(e["type"], tuple(e["span"]), e["text"]) for e in r] == [
            (e["type"], tuple(e["span"]), e["text"]) for e in m
        ], (orig, masked)


def test_synthetic_corpus_parity():
    from deid_pipeline.training.synthetic import generate_synthetic_span_examples as ref

    from edge_deid_studio_ray.kernels.synthetic import generate_synthetic_span_examples as mine

    for lang in ("zh", "en"):
        for seed in (0, 7):
            a = ref(num_examples=25, seed=seed, language=lang)
            b = mine(num_examples=25, seed=seed, language=lang)
            assert [x["text"] for x in a] == [x["text"] for x in b]
            assert [
                [(e["type"], tuple(e["span"]), e["text"]) for e in x["entities"]] for x in a
            ] == [[(e["type"], tuple(e["span"]), e["text"]) for e in x["entities"]] for x in b]


def test_validate_span_example_parity():
    from deid_pipeline.training.quality import (
        summarize_numbers as ref_summ,
        validate_span_example as ref_validate,
    )

    from edge_deid_studio_ray.kernels.quality import (
        summarize_numbers as my_summ,
        validate_span_example as my_validate,
    )

    bad = [
        {"type": "", "span": (0, 2)},
        {"type": "ID", "span": None},
        {"type": "ID", "span": (5, 2)},
        {"type": "ID", "span": (0, 999)},
        {"type": "ID", "span": (0, 3), "text": "XX"},
        {"type": "A", "span": (1, 4)},
        {"type": "B", "span": (2, 6)},
        {"type": "ID", "span": (-1, 3)},
    ]
    assert ref_validate("hello world", bad) == my_validate("hello world", bad)
    for values in ([], [1.0], [3.0, 1.0, 2.0, 9.0, 5.0], list(range(100))):
        assert ref_summ(values) == my_summ(values)


def test_evalkit_parity():
    from deid_pipeline.training.deid_eval import (
        check_format_compliance as ref_fc,
        compute_pii_removal_recall as ref_rr,
        compute_type_consistency as ref_tc,
        repetition_3gram_rate as ref_rep,
        sequence_similarity as ref_sim,
    )
    from deid_pipeline.training.pii_markup import extract_pii_blocks as ref_blocks

    from edge_deid_studio_ray.kernels.evalkit import (
        check_format_compliance as my_fc,
        compute_pii_removal_recall as my_rr,
        compute_type_consistency as my_tc,
        repetition_3gram_rate as my_rep,
        sequence_similarity as my_sim,
    )
    from edge_deid_studio_ray.kernels.markup import extract_pii_blocks as my_blocks

    assert ref_rep("abcabcabc hello") == my_rep("abcabcabc hello")
    assert ref_rep("ab") == my_rep("ab")
    assert ref_sim("hello world", "hello there") == my_sim("hello world", "hello there")
    assert ref_fc("output: leaked <PII", ["badword"]) == my_fc("output: leaked <PII", ["badword"])
    assert ref_fc("", []) == my_fc("", [])
    assert ref_fc("clean text", ["bad"]) == my_fc("clean text", ["bad"])

    text = "id [ID]A123456789[/ID] and [PHONE]0912345678[/PHONE]"
    pred = "id B234567890 and 0987654321"
    ref_b, my_b = ref_blocks(text), my_blocks(text)
    assert ref_tc(ref_b, pred) == my_tc(my_b, pred)
    assert ref_rr([b.value for b in ref_b], pred) == my_rr([b["value"] for b in my_b], pred)


def test_rewriter_parity():
    import random

    from deid_pipeline.training.rewriter import make_noisy as ref_noisy

    from edge_deid_studio_ray.kernels.markup import make_noisy as my_noisy

    text = "你好，世界。測試：一，二；三. done, yes: no; end."
    for seed in (0, 1, 2):
        assert ref_noisy(text, random.Random(seed)) == my_noisy(text, random.Random(seed))


def test_fill_placeholders_matches_reference_with_fallback_provider():
    from deid_pipeline.pii.utils.fake_provider import FakeProvider
    from deid_pipeline.training.rewriter import fill_placeholders_with_fake_values as ref_fill

    from edge_deid_studio_ray.kernels.markup import fill_placeholders_with_fake_values as my_fill

    text = "Name <NAME> called <PHONE_1> about [EMAIL] at {ADDRESS}"
    ch = "c" * 64
    assert ref_fill(text, FakeProvider(), context_hash=ch) == my_fill(text, context_hash=ch)


def test_tokenization_parity():
    """build_bio_label_list + align_entities_to_tokens byte-equal to the
    reference (training/tokenization.py:8-48), incl. the -100 special-token
    convention, B-/I- prefixes on subword offsets, first-entity-wins, and
    unknown-label fallback to O."""
    from deid_pipeline.training.tokenization import (
        align_entities_to_tokens as ref_align,
        build_bio_label_list as ref_labels,
    )

    from edge_deid_studio_ray.kernels.tokenization import (
        align_entities_to_tokens as my_align,
        build_bio_label_list as my_labels,
    )

    type_sets = [
        ["PHONE", "EMAIL", "PHONE", ""],   # dup + falsy
        [],
        ["b", "a", "c"],
    ]
    for types in type_sets:
        assert ref_labels(types) == my_labels(types)

    labels = ref_labels(["PHONE", "NAME"])
    label_to_id = {lab: i for i, lab in enumerate(labels)}
    entities = [
        {"span": (5, 15), "type": "PHONE"},
        {"span": (5, 9), "type": "NAME"},     # overlapping: first wins
        {"span": (20, 24), "type": "GHOST"},  # unknown label -> O fallback
        {"span": None, "type": "PHONE"},      # falsy span skipped
        {"span": (30, 34), "type": None},     # falsy type skipped
    ]
    # subword-style offsets: CLS, inside/at-start/overhanging tokens, SEP
    offset_mapping = [
        (0, 0), (0, 4), (5, 9), (9, 15), (13, 17), (20, 24), (30, 34), (0, 0),
    ]
    kwargs = dict(entities=entities, offset_mapping=offset_mapping, label_to_id=label_to_id)
    assert ref_align(**kwargs) == my_align(**kwargs)
    got = my_align(**kwargs)
    assert got[0] == got[-1] == -100
    assert labels[got[2]] == "B-PHONE" and labels[got[3]] == "I-PHONE"
    assert labels[got[4]] == "O"  # overhangs the entity end -> not inside


def test_prompt_template_parity(tmp_path):
    from deid_pipeline.training.prompts import PromptTemplate as RefTemplate

    from edge_deid_studio_ray.kernels.prompts import PromptTemplate as MyTemplate

    f = tmp_path / "tpl.txt"
    f.write_text("Deidentify: {RAW_TEXT} -- end", encoding="utf-8")
    assert RefTemplate.from_file(f).render("abc") == MyTemplate.from_file(f).render("abc")
    assert RefTemplate.from_file(f).render(None) == MyTemplate.from_file(f).render(None)
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        MyTemplate.from_file(tmp_path / "missing.txt")
