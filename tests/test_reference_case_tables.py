"""Ported reference unit case tables (SURVEY §5: tests/pii_test_suite.py,
test_replacer.py) run against our kernels — same inputs, same assertions."""

from __future__ import annotations

import re

from edge_deid_studio_ray.config import RULES_DIR
from edge_deid_studio_ray.kernels import (
    compile_rules,
    context_hash,
    regex_detect,
    replace_text,
    resolve_conflicts,
)

ZH = str(RULES_DIR / "regex_zh.yaml")


def _detect(text: str):
    return resolve_conflicts(regex_detect(text, compile_rules(ZH)))


class TestRegexPrecisionCases:
    # pii_test_suite.py:19-31
    def test_simple_cases(self):
        # NOTE: the reference test expects MEDICAL_ID first for "M1234567",
        # but the reference DETECTOR emits PASSPORT first (rule order:
        # PASSPORT precedes MEDICAL_ID in regex_zh.yaml and both match) —
        # verified by running the reference code directly.  The byte-identity
        # contract follows the code, so the expectation here matches the
        # detector, not the reference test's stale assertion.
        cases = [
            ("身分證 A123456789", "ID", "A123456789"),
            ("電話 0912-345-678", "PHONE", "0912-345-678"),
            ("病歷號 M1234567", "PASSPORT", "M1234567"),
        ]
        for text, expected_type, expected_value in cases:
            entities = regex_detect(text, compile_rules(ZH))
            assert len(entities) >= 1
            assert entities[0]["type"] == expected_type
            start, end = entities[0]["span"]
            assert text[start:end] == expected_value
        # after composite conflict resolution the high-overlap matches merge;
        # MEDICAL_ID (priority 60) loses to PASSPORT (95)
        resolved = _detect("病歷號 M1234567")
        assert [e["type"] for e in resolved] == ["PASSPORT"]


class TestCompositeConflictCase:
    # pii_test_suite.py:55-63
    def test_stable_spans(self):
        entities = _detect("A123456789 0912-345-678")
        assert len(entities) >= 1
        for ent in entities:
            assert "span" in ent and "type" in ent


class TestReplacementConsistency:
    # pii_test_suite.py:65-80 + test_replacer.py:4-15
    def test_same_original_same_replacement(self):
        text = "ID A123456789 and again A123456789. Phone 0912345678."
        entities = _detect(text)
        new_text, events = replace_text(
            text, entities, "replace", context_hash=context_hash(text)
        )
        assert "A123456789" not in new_text
        id_replacements = [
            e["replacement"] for e in events if e.get("original") == "A123456789"
        ]
        assert len(id_replacements) >= 2
        assert len(set(id_replacements)) == 1

    def test_context_hash_scopes_consistency(self):
        # pii_test_suite.py:74-80: explicit context hash pins the mapping
        text = "病人A: 身分證A123456789, 電話0912345678。病人B: 身分證A123456789"
        entities = _detect(text)
        _, events = replace_text(text, entities, "replace", context_hash="suite-doc")
        replaced_values = {
            e["replacement"] for e in events if e.get("original") == "A123456789"
        }
        assert len(replaced_values) == 1


class TestContextualReplacement:
    # pii_test_suite.py:82-89: format-preserving surrogate.  The reference
    # test asserts a single-letter prefix, but the winning entity type is
    # PASSPORT (see above) whose deterministic surrogate prefix is P/PA/PB
    # (fake_provider.py:131-134) — the reference's own code yields "PB..."
    # for this context hash, so the stale single-letter assertion is
    # corrected to the passport surrogate format.
    def test_id_like_format_preserved(self):
        text = "病歷號: M1234567 診斷: 感冒"
        entities = _detect(text)
        replaced_text, _ = replace_text(
            text, entities, "replace", context_hash=context_hash(text)
        )
        assert re.search(r"病歷號: [A-Z]{1,2}[0-9]{7}", replaced_text)
        assert "M1234567" not in replaced_text


class TestBlackboxLength:
    # test_replacer.py:17-24
    def test_blackbox_keeps_length(self):
        text = "ID A123456789 and Phone 0912345678."
        entities = _detect(text)
        masked, _ = replace_text(text, entities, "blackbox")
        assert len(masked) == len(text)
        assert "A123456789" not in masked
        assert "0912345678" not in masked
