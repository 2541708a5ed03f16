"""Port of the reference's randomized synthetic-document factory + recall
test (tests/test_data_factory.py:9-64, pii_test_suite.py:32-52), seeded for
determinism and run against the regex detection path (the model-dependent
BERT recall test is env-gated in the reference too)."""

from __future__ import annotations

import random

from edge_deid_studio_ray.config import RULES_DIR
from edge_deid_studio_ray.kernels import compile_rules, regex_detect, resolve_conflicts

ZH = str(RULES_DIR / "regex_zh.yaml")


class DataFactory:
    """Reference TestDataFactory semantics with an injectable rng."""

    def __init__(self, rng: random.Random):
        self.rng = rng

    def generate_tw_id(self) -> str:
        first_letter = self.rng.choice("ABCDEFGHJKLMNPQRSTUVXYWZ")
        gender = str(self.rng.randint(1, 2))
        body = "".join(str(self.rng.randint(0, 9)) for _ in range(7))
        return f"{first_letter}{gender}{body}{self.rng.randint(0, 9)}"

    def generate_medical_record(self) -> str:
        prefix = self.rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
        digits = "".join(
            str(self.rng.randint(0, 9)) for _ in range(self.rng.choice([7, 8]))
        )
        return f"{prefix}{digits}"

    def generate_test_document(self, pii_count: int = 10):
        words = ["lorem", "ipsum", "dolor", "sit", "amet"]
        content = " ".join(self.rng.choice(words) for _ in range(200))
        generators = [
            ("ID", self.generate_tw_id),
            ("PHONE", lambda: f"09{self.rng.randint(0, 99):02d}{self.rng.randint(0, 9_999_999):07d}"),
            ("MEDICAL_ID", self.generate_medical_record),
            ("EMAIL", lambda: f"user{self.rng.randint(0, 9999):04d}@example.com"),
        ]
        insertion_points = sorted(self.rng.sample(range(len(content)), pii_count))
        inserted = []
        for point in insertion_points:
            pii_type, generator = self.rng.choice(generators)
            value = generator()
            inserted.append((pii_type, value))
            content = content[:point] + f" {value} " + content[point:]
        return content, inserted


def _detect(text: str):
    return resolve_conflicts(regex_detect(text, compile_rules(ZH)))


def test_regex_recall_on_random_documents():
    """pii_test_suite.py:32-52 criterion: expected TYPE set ⊆ detected TYPE
    set in >= 90% of documents.  (The reference factory itself emits
    quirky values — 11-digit "phones" whose regex match covers only a
    10-digit prefix, and insertion points that can split earlier values —
    so value-level coverage is not achievable even by the reference's own
    detector; its test checks types only.)  Equivalence classes account for
    composite priority resolution: an injected MEDICAL_ID-shaped value may
    resolve as PASSPORT/ID (higher priority over the same span).
    """
    equivalent = {
        "ID": {"ID", "PASSPORT", "MEDICAL_ID", "UNIFIED_BUSINESS_NO"},
        "MEDICAL_ID": {"MEDICAL_ID", "PASSPORT", "ID"},
        "PHONE": {"PHONE"},
        "EMAIL": {"EMAIL"},
    }
    rng = random.Random(1234)
    factory = DataFactory(rng)
    recalled = 0
    n_docs = 100
    for _ in range(n_docs):
        text, inserted = factory.generate_test_document(pii_count=5)
        detected_types = {e["type"] for e in _detect(text)}
        if all(detected_types & equivalent[t] for t, _ in inserted):
            recalled += 1
    assert recalled / n_docs >= 0.90, f"recall {recalled}%"


def test_every_injected_value_absent_after_replacement():
    from edge_deid_studio_ray.kernels import context_hash, replace_text

    rng = random.Random(77)
    factory = DataFactory(rng)
    for _ in range(20):
        text, inserted = factory.generate_test_document(pii_count=5)
        entities = _detect(text)
        clean, _ = replace_text(text, entities, "replace", context_hash=context_hash(text))
        for _, value in inserted:
            assert value not in clean, value
