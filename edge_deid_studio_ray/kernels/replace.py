"""Deterministic replacement / masking kernels.

Reproduces the reference's replacement semantics
(/root/reference/src/deid_pipeline/pii/utils/replacer.py:41-102) and its
faker-free deterministic fallback provider
(fake_provider.py:83-173) as pure functions.

Why no cache: the reference routes every replacement through a process-global
LRU (replace/cache.py:13-53), but the cache key embeds
``(type, original, context_hash)`` and the factory is a pure function of that
key — so caching is correctness-neutral.  In a distributed engine a shared
mutable cache would be a cross-node liability for zero semantic gain; an
``lru_cache`` on the generator gives the same throughput win per worker.

Seeds use ``random.Random`` (Mersenne Twister), whose output sequence is
stable across Python versions/platforms by spec, so replacements are
reproducible cluster-wide.
"""

from __future__ import annotations

import hashlib
import random
from functools import lru_cache
from typing import Any

Entity = dict[str, Any]

_TW_LOCALES = {"zh_tw", "zh_hant_tw"}

_TW_NAMES = ["王小明", "陳怡君", "林志明", "張雅婷"]
_EN_NAMES = ["John Smith", "Alice Chen", "Michael Brown", "Emily Davis"]
_TW_ADDRESSES = ["台北市信義路1號", "新北市中山路10號", "台中市民生路99號"]


def _is_tw(locale: str) -> bool:
    loc = str(locale or "en_US").lower()
    return loc.replace("-", "_") in _TW_LOCALES or "tw" in loc


def _placeholder(entity_type: str, stable_key: str) -> str:
    digest = hashlib.sha256(stable_key.encode("utf-8")).hexdigest()[:8]
    return f"<{entity_type}:{digest}>"


@lru_cache(maxsize=4096)
def fallback_generate(entity_type: str, original: str, context_hash: str, locale: str = "zh_TW") -> str:
    """Deterministic surrogate value for (type, original, context_hash).

    Byte-identical to the reference fallback path
    (fake_provider.py:83-173): seed = first 8 hex chars of
    sha256(f"{type}:{original}:{hash}"), then a fixed per-type sequence of
    ``random.Random`` draws.  The draw *order* is part of the contract.
    """
    stable_key = f"{entity_type}:{original}:{context_hash}"
    seed = int(hashlib.sha256(stable_key.encode("utf-8")).hexdigest()[:8], 16)
    rng = random.Random(int(seed))
    is_tw = _is_tw(locale)

    if entity_type in {"ID", "TW_ID"}:
        if is_tw:
            letter = rng.choice("ABCDEFGHJKLMNPQRSTUVXYWZ")
            gender = rng.choice(["1", "2"])
            mid = "".join(str(rng.randint(0, 9)) for _ in range(7))
            checksum = str(rng.randint(0, 9))
            return f"{letter}{gender}{mid}{checksum}"
        return f"{rng.randint(0, 999):03d}-{rng.randint(0, 99):02d}-{rng.randint(0, 9999):04d}"

    if entity_type == "PHONE":
        if is_tw:
            return "09" + "".join(str(rng.randint(0, 9)) for _ in range(8))
        return f"555-{rng.randint(100, 999):03d}-{rng.randint(0, 9999):04d}"

    if entity_type == "EMAIL":
        return f"user{rng.randint(0, 999999):06d}@example.com"

    if entity_type == "UNIFIED_BUSINESS_NO":
        return f"{rng.randint(0, 99999999):08d}"

    if entity_type == "PASSPORT":
        prefix = rng.choice(["P", "PA", "PB"])
        digits = "".join(str(rng.randint(0, 9)) for _ in range(7))
        return f"{prefix}{digits}"

    if entity_type == "MEDICAL_ID":
        digits = "".join(str(rng.randint(0, 9)) for _ in range(7))
        return f"M{digits}"

    if entity_type == "CONTRACT_NO":
        return f"CN-{rng.randint(0, 999999):06d}"

    if entity_type == "ORGANIZATION":
        return f"Example Organization {rng.randint(1, 9999)}"

    if entity_type == "NAME":
        return rng.choice(_TW_NAMES) if is_tw else rng.choice(_EN_NAMES)

    if entity_type == "ADDRESS":
        if is_tw:
            return rng.choice(_TW_ADDRESSES)
        return f"{rng.randint(1, 999)} Main Street"

    return _placeholder(entity_type, stable_key)


class Provider:
    """Replacement-provider protocol — the ``Replacer(provider=)`` seam of
    the reference (pii/utils/replacer.py:12-14).  Implementations supply
    ``generate(entity_type, original, context_hash, locale) -> str``;
    determinism w.r.t. the arguments is required for cluster-wide
    reproducibility (faker/GPT-2 providers in the reference are
    version-dependent and therefore excluded from the byte-identity oracle —
    they plug in through this same seam)."""

    def generate(self, entity_type: str, original: str, context_hash: str, locale: str) -> str:
        raise NotImplementedError


class FallbackProvider(Provider):
    """Default provider: the reference's faker-free deterministic fallback
    (byte-identical to fake_provider.py:83-173)."""

    def generate(self, entity_type: str, original: str, context_hash: str, locale: str) -> str:
        return fallback_generate(entity_type, original, context_hash, locale)


class MaskProvider(Provider):
    """Type-tagged placeholder provider (``<TYPE:hash8>``) — a minimal
    injectable alternative that keeps outputs grep-able."""

    def generate(self, entity_type: str, original: str, context_hash: str, locale: str) -> str:
        return _placeholder(entity_type, f"{entity_type}:{original}:{context_hash}")


class Gpt2Provider(Provider):
    """Generate-style provider shell — the reference's GPT-2 surrogate path
    (fake_provider.py:184-223): prompt the causal LM with

        Replace the following {TYPE} value with a fictional value that fits
        the context: '{original}'.\\nReplacement:

    greedy-decode ``len(prompt)+20`` tokens, and take the text after the
    final ``Replacement:`` marker.

    Only the MODEL is import-gated: pass ``model_path`` to load a local HF
    checkpoint (transformers+torch, absent in this sandbox), or inject any
    ``(tokenizer, model)`` pair with the HF call shape —
    ``tokenizer(prompt, return_tensors=...)`` → ``.input_ids`` with
    ``.shape``, ``model.generate(input_ids, max_length=, do_sample=False,
    pad_token_id=)`` → sequences, ``tokenizer.decode(seq,
    skip_special_tokens=True)`` — so the whole prompting/decode path runs
    under test with a deterministic fake LM.  Determinism across workers
    requires a deterministic model (greedy decode, fixed weights); like the
    reference's GPT-2/faker paths it is therefore excluded from the
    byte-identity oracle and plugs in through the Provider seam."""

    MAX_NEW_TOKENS = 20  # reference: max_length = prompt_len + 20

    def __init__(self, model_path: str | None = None, *, tokenizer: Any = None, model: Any = None):
        if tokenizer is None or model is None:
            try:
                import torch  # type: ignore  # noqa: F401
                from transformers import (  # type: ignore
                    AutoModelForCausalLM,
                    AutoTokenizer,
                )
            except ImportError as exc:
                raise NotImplementedError(
                    "transformers/torch not installed; inject tokenizer=/model= "
                    "or use the 'fallback' provider"
                ) from exc
            tokenizer = AutoTokenizer.from_pretrained(str(model_path), local_files_only=True)
            model = AutoModelForCausalLM.from_pretrained(str(model_path), local_files_only=True)
            model.eval()
        self.tokenizer = tokenizer
        self.model = model

    def generate(self, entity_type: str, original: str, context_hash: str, locale: str) -> str:
        prompt = (
            f"Replace the following {entity_type} value with a fictional value "
            f"that fits the context: '{original}'.\nReplacement:"
        )
        inputs = self.tokenizer(prompt, return_tensors="pt")
        outputs = self.model.generate(
            inputs.input_ids,
            max_length=int(inputs.input_ids.shape[1]) + self.MAX_NEW_TOKENS,
            num_return_sequences=1,
            do_sample=False,
            pad_token_id=getattr(self.tokenizer, "eos_token_id", 0),
        )
        generated = self.tokenizer.decode(outputs[0], skip_special_tokens=True)
        if "Replacement:" in generated:
            return generated.split("Replacement:", 1)[-1].strip()
        return generated.replace(prompt, "").strip()


_PROVIDERS: dict[str, type[Provider]] = {
    "fallback": FallbackProvider,
    "mask": MaskProvider,
    "gpt2": Gpt2Provider,
}


def register_provider(name: str, cls: type[Provider]) -> None:
    """Register an injectable provider class (resolved per worker by name so
    frozen configs stay small and picklable)."""
    _PROVIDERS[name] = cls


@lru_cache(maxsize=16)
def get_provider(name: str) -> Provider:
    try:
        return _PROVIDERS[name]()
    except KeyError:
        raise KeyError(f"unknown provider {name!r}; registered: {sorted(_PROVIDERS)}") from None


def replace_text(
    text: str,
    entities: list[Entity],
    mode: str = "replace",
    *,
    context_hash: str | None = None,
    locale: str = "zh_TW",
    provider: Provider | None = None,
) -> tuple[str, list[dict[str, Any]]]:
    """Replace or mask entity spans; returns ``(new_text, events)``.

    Semantics of replacer.py:41-102:

    - entities are processed in **descending span-start order** and spliced
      right-to-left, so earlier (left) offsets stay valid;
    - replace mode: surrogate from :func:`fallback_generate`; event records
      ``span = (start, start + len(replacement))`` — the start is an
      original-text offset while the width is the replacement's;
    - blackbox mode: length-preserving ``"█" * (end - start)`` fill; events
      carry no original/replacement (they are dropped from replacement maps
      downstream, mirroring DeidPipeline.process, __init__.py:100-117).
    """
    normalized = (mode or "").strip().lower()
    if normalized in {"blackbox", "black", "redact", "mask"}:
        return _blackbox_mode(text, entities)
    return _replace_mode(
        text, entities, context_hash=context_hash, locale=locale, provider=provider
    )


def _sorted_desc(entities: list[Entity]) -> list[Entity]:
    return sorted(entities, key=lambda e: e["span"][0], reverse=True)


def _replace_mode(
    text: str,
    entities: list[Entity],
    *,
    context_hash: str | None,
    locale: str,
    provider: Provider | None = None,
) -> tuple[str, list[dict[str, Any]]]:
    doc_hash = context_hash or hashlib.sha256(text.encode("utf-8", errors="replace")).hexdigest()
    generate = (provider or get_provider("fallback")).generate
    new_text = text
    events: list[dict[str, Any]] = []
    for ent in _sorted_desc(entities):
        start, end = ent["span"]
        original = text[start:end]
        entity_type = str(ent["type"])
        replacement = generate(entity_type, original, doc_hash, locale)
        new_text = new_text[:start] + replacement + new_text[end:]
        events.append(
            {
                "original": original,
                "replacement": replacement,
                "type": entity_type,
                "span": (start, start + len(replacement)),
                "source": ent.get("source", "unknown"),
            }
        )
    return new_text, events


def _blackbox_mode(text: str, entities: list[Entity]) -> tuple[str, list[dict[str, Any]]]:
    new_text = text
    events: list[dict[str, Any]] = []
    for ent in _sorted_desc(entities):
        start, end = ent["span"]
        block = "█" * (end - start)
        new_text = new_text[:start] + block + new_text[end:]
        events.append({"type": ent["type"], "span": (start, start + len(block)), "source": ent.get("source", "unknown")})
    return new_text, events
