"""Deterministic synthetic span-example corpus generator.

Reproduces /root/reference/src/deid_pipeline/training/synthetic.py:26-121
draw-for-draw (same ``random.Random`` call sequence → identical corpora for
identical (num_examples, seed, language)).  Used as the training-data
fixture factory and in quality/eval pipelines.
"""

from __future__ import annotations

import random
from typing import Any


def _random_tw_id(rng: random.Random) -> str:
    letter = rng.choice("ABCDEFGHJKLMNPQRSTUVXYWZ")
    digits = "".join(str(rng.randint(0, 9)) for _ in range(9))
    return f"{letter}{digits}"


def _random_tw_phone(rng: random.Random) -> str:
    return "09" + "".join(str(rng.randint(0, 9)) for _ in range(8))


def _random_email(rng: random.Random, idx: int) -> str:
    return f"user{idx}{rng.randint(0, 9999):04d}@example.com"


_ZH_NAMES = ["王小明", "陳怡君", "林志明", "張雅婷"]
_ZH_ADDRESSES = ["台北市信義路1號", "新北市中山路10號", "台中市民生路99號"]
_ZH_TEMPLATES = [("病患姓名：", "。\n"), ("聯絡方式：", "。\n"), ("身分證：", "。\n")]
_EN_NAMES = ["John Smith", "Alice Chen", "Michael Brown", "Emily Davis"]
_EN_ADDRESSES = ["1 Main St", "10 Broadway Ave", "99 Market Rd"]
_EN_TEMPLATES = [("Patient name: ", ".\n"), ("Contact: ", ".\n"), ("ID: ", ".\n")]


def generate_synthetic_span_examples(
    *, num_examples: int = 100, seed: int = 0, language: str = "zh"
) -> list[dict[str, Any]]:
    """``[{"text": str, "entities": [...]}]`` with gold spans recorded at
    insertion time; rng draw order matches the reference exactly."""
    rng = random.Random(int(seed))
    if language == "zh":
        names, addresses, templates = _ZH_NAMES, _ZH_ADDRESSES, _ZH_TEMPLATES
    else:
        names, addresses, templates = _EN_NAMES, _EN_ADDRESSES, _EN_TEMPLATES

    examples: list[dict[str, Any]] = []
    for idx in range(int(num_examples)):
        parts: list[str] = []
        entities: list[dict[str, Any]] = []
        cursor = 0

        def add_text(s: str) -> None:
            nonlocal cursor
            parts.append(s)
            cursor += len(s)

        def add_entity(entity_type: str, value: str) -> None:
            nonlocal cursor
            start = cursor
            add_text(value)
            entities.append(
                {
                    "type": entity_type,
                    "span": (start, cursor),
                    "text": value,
                    "confidence": 1.0,
                    "score": 1.0,
                    "source": "synthetic",
                    "language": language,
                }
            )

        # rng draw order is part of the determinism contract:
        # name → phone → email → address → id, then template assembly
        name = rng.choice(names)
        phone = (
            _random_tw_phone(rng)
            if language == "zh"
            else f"+1-555-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}"
        )
        email = _random_email(rng, idx)
        address = rng.choice(addresses)
        ident = (
            _random_tw_id(rng)
            if language == "zh"
            else f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}"
        )

        add_text(templates[0][0])
        add_entity("NAME", name)
        add_text(templates[0][1])

        add_text(templates[1][0])
        add_entity("PHONE", phone)
        add_text(", ")
        add_entity("EMAIL", email)
        add_text(templates[1][1])

        add_text("Address: " if language != "zh" else "地址：")
        add_entity("ADDRESS", address)
        add_text(".\n")

        add_text(templates[2][0])
        add_entity("ID", ident)
        add_text(templates[2][1])

        examples.append({"text": "".join(parts), "entities": entities})
    return examples
