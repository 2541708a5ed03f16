"""NER detection as a Ray Data actor-pool stage.

Ray-native restatement of the reference NER detectors
(/root/reference/src/deid_pipeline/pii/detectors/bert_detector.py:28-177,
bert_onnx_detector.py:26-174): a callable CLASS for
``map_batches(NerDetectStage, concurrency=N, batch_size=B)`` — the model /
session loads ONCE per actor in ``__init__`` (the actor-pool equivalent of
the reference's process-global ``lru_cache`` registry, runtime/registry.py).

Semantics preserved:
- long-text chunking: character windows of ``window`` with stride
  ``window // 2`` (bert_detector.py:59-63);
- per-chunk entities offset back into document coordinates;
- cross-window merge: same-type entities overlapping > 0.5·min_len merge,
  keeping max score (bert_detector.py:138-160);
- ENTITY_TYPE_MAP normalization (PER→NAME, LOC/GPE→ADDRESS, ORG→ORGANIZATION,
  bert_detector.py:16-25) applied by backends;
- the stub backend reproduces ``_stub_detection`` (bert_detector.py:162-177)
  exactly: TW-id + mobile regexes, ``source="regex_stub"``;
- detected entities are merged with the regex detector's and resolved with
  the composite conflict rules, mirroring ``get_detector`` composition
  (pii/detectors/__init__.py:20-76: NER first, regex backstop appended).

Real transformer/ONNX backends are import-gated (not installed here); the
windowing / merge / composite plumbing they need is identical and fully
tested via the stub.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import pyarrow as pa

from ..config import EngineConfig
from ..kernels.detect import compile_rules, regex_detect, resolve_conflicts

ENTITY_TYPE_MAP = {
    "PER": "NAME",
    "PERSON": "NAME",
    "LOC": "ADDRESS",
    "GPE": "ADDRESS",
    "ORG": "ORGANIZATION",
    "ID": "ID",
    "PHONE": "PHONE",
    "EMAIL": "EMAIL",
}


def decode_bio_spans(
    token_offsets: list[tuple[int, int]],
    labels: list[str],
    confidences: list[float],
    *,
    offset: int = 0,
    source: str = "bert",
) -> list[dict[str, Any]]:
    """Per-token BIO labels → entity spans.

    Exact decode semantics of ``BertNERDetector._process_chunk``
    (bert_detector.py:95-135): ``B-`` opens an entity (closing any open
    one), ``I-`` of the SAME normalized type extends the span and keeps the
    max confidence, anything else closes; ``(0, 0)`` offsets (special
    tokens) are skipped; types normalize through ENTITY_TYPE_MAP.  A real
    transformer/ONNX backend only needs to produce (offsets, labels,
    confidences) per window — this decode + the window merge are the rest.
    """
    entities: list[dict[str, Any]] = []
    current: dict[str, Any] | None = None

    for (token_start, token_end), label, confidence in zip(token_offsets, labels, confidences):
        if token_start == token_end == 0:
            continue
        base_label = label.replace("B-", "").replace("I-", "")
        normalized_type = ENTITY_TYPE_MAP.get(base_label, base_label)

        if label.startswith("B-"):
            if current:
                entities.append(current)
            current = {
                "span": [int(token_start) + offset, int(token_end) + offset],
                "type": normalized_type,
                "score": float(confidence),
                "source": source,
            }
        elif label.startswith("I-") and current and current["type"] == normalized_type:
            current["span"][1] = int(token_end) + offset
            current["score"] = max(float(current["score"]), float(confidence))
        else:
            if current:
                entities.append(current)
            current = None

    if current:
        entities.append(current)
    return entities


class StubNerBackend:
    """Deterministic stub scorer — regex parity with bert_detector.py:162-177."""

    def __init__(self) -> None:
        self.id_re = re.compile(r"[A-Z][12]\d{8}")
        self.phone_re = re.compile(r"09\d{2}-?\d{3}-?\d{3}")

    def detect_chunk(self, text: str, offset: int) -> list[dict[str, Any]]:
        entities: list[dict[str, Any]] = []
        for match in self.id_re.finditer(text):
            entities.append(
                {
                    "span": [match.start() + offset, match.end() + offset],
                    "type": "ID",
                    "score": 1.0,
                    "source": "regex_stub",
                }
            )
        for match in self.phone_re.finditer(text):
            entities.append(
                {
                    "span": [match.start() + offset, match.end() + offset],
                    "type": "PHONE",
                    "score": 1.0,
                    "source": "regex_stub",
                }
            )
        return entities


class TokenLabelBackend:
    """Model-shaped backend: per-token BIO labels → :func:`decode_bio_spans`.

    Stands in for a transformer/ONNX scorer in tests and offline runs: a
    vocabulary dict maps lowercased tokens to BIO labels (with confidences),
    tokenization is whitespace-with-offsets.  Exercises the exact plumbing a
    real model uses — only the label source differs.
    """

    def __init__(self, vocab: dict[str, tuple[str, float]] | None = None):
        import re as _re

        self.token_re = _re.compile(r"\S+")
        self.vocab = vocab or {
            "john": ("B-PER", 0.95),
            "smith": ("I-PER", 0.9),
            "alice": ("B-PER", 0.94),
            "taipei": ("B-LOC", 0.92),
            "acme": ("B-ORG", 0.91),
        }

    def detect_chunk(self, text: str, offset: int) -> list[dict[str, Any]]:
        offsets: list[tuple[int, int]] = []
        labels: list[str] = []
        confidences: list[float] = []
        for match in self.token_re.finditer(text):
            label, confidence = self.vocab.get(match.group().lower(), ("O", 0.99))
            offsets.append((match.start(), match.end()))
            labels.append(label)
            confidences.append(confidence)
        return decode_bio_spans(offsets, labels, confidences, offset=offset)


def _softmax(logits):
    """Row-stable softmax (bert_onnx_detector.py:17-20)."""
    import numpy as np

    shifted = logits - np.max(logits, axis=-1, keepdims=True)
    exp = np.exp(shifted)
    return exp / np.sum(exp, axis=-1, keepdims=True)


class SimpleNerTokenizer:
    """Minimal offsets-preserving tokenizer with the HF overflow-window
    encoding SHAPE (``input_ids`` / ``attention_mask`` / ``offset_mapping``
    as ``[n_windows, max_len]`` arrays, cls/sep/pad specials at offset
    ``(0, 0)``, ``stride`` tokens of overlap between windows) — what
    ``AutoTokenizer(..., return_overflowing_tokens=True,
    padding="max_length")`` produces for the reference detector
    (bert_onnx_detector.py:67-76), minus subword splitting: tokens are
    ``\\S+`` runs looked up in a plain vocabulary dict (unk=1).
    """

    PAD_ID, UNK_ID, CLS_ID, SEP_ID = 0, 1, 2, 3

    def __init__(self, vocab: dict[str, int]):
        import re as _re

        self.token_re = _re.compile(r"\S+")
        self.vocab = dict(vocab)
        self.special_ids = {self.PAD_ID, self.CLS_ID, self.SEP_ID}

    def encode(self, text: str, max_len: int, overlap: int) -> dict[str, Any]:
        import numpy as np

        tokens = [
            (m.start(), m.end(), m.group().lower())
            for m in self.token_re.finditer(text)
        ]
        capacity = max(1, max_len - 2)  # room for cls + sep
        step = max(1, capacity - overlap)
        windows: list[list[tuple[int, int, str]]] = []
        pos = 0
        while True:
            windows.append(tokens[pos : pos + capacity])
            if pos + capacity >= len(tokens):
                break
            pos += step
        n = len(windows)
        input_ids = np.full((n, max_len), self.PAD_ID, dtype=np.int64)
        attention = np.zeros((n, max_len), dtype=np.int64)
        offsets = np.zeros((n, max_len, 2), dtype=np.int64)
        for w, body in enumerate(windows):
            input_ids[w, 0] = self.CLS_ID
            for j, (s, e, tok) in enumerate(body, start=1):
                input_ids[w, j] = self.vocab.get(tok, self.UNK_ID)
                offsets[w, j] = (s, e)
            input_ids[w, len(body) + 1] = self.SEP_ID
            attention[w, : len(body) + 2] = 1
        return {
            "input_ids": input_ids,
            "attention_mask": attention,
            "offset_mapping": offsets,
        }


class OnnxNerBackend:
    """ONNX Runtime token-classification backend.

    Real inference semantics of the reference (bert_onnx_detector.py:26-174):
    overflow-windowed encoding, ONE batched ``session.run`` over all
    windows, softmax → argmax + max-prob confidence, per-chunk BIO decode
    that skips special/pad tokens and drops sub-threshold labels
    (BERT_CONFIDENCE_THRESHOLD 0.85, reference config.py:101), then the
    0.5-overlap same-type merge.

    Only the SESSION is import-gated: pass ``model_path`` to build a real
    ``onnxruntime.InferenceSession``, or inject any object with
    ``get_inputs() / get_outputs() / run()`` (tests drive the full path
    with a numpy matmul session, so every line here executes without
    onnxruntime installed)."""

    def __init__(
        self,
        model_path: str | None = None,
        *,
        session: Any | None = None,
        vocab: dict[str, int] | None = None,
        id2label: dict[int, str] | None = None,
        confidence: float = 0.85,
        max_len: int = 512,
        window_stride: float = 0.5,
    ):
        if session is None:
            try:
                import onnxruntime  # type: ignore
            except ImportError as exc:
                raise NotImplementedError(
                    "onnxruntime not installed; inject session= or use StubNerBackend"
                ) from exc
            session = onnxruntime.InferenceSession(
                str(model_path), providers=["CPUExecutionProvider"]
            )
        self.session = session
        self.input_names = {i.name for i in session.get_inputs()}
        self.output_name = session.get_outputs()[0].name
        self.tokenizer = SimpleNerTokenizer(vocab or {})
        self.id2label = {int(k): str(v) for k, v in (id2label or {}).items()}
        self.confidence = float(confidence)
        self.max_len = int(max_len)
        capacity = self.max_len - 2
        # HF stride semantics: number of overlapping tokens between windows
        # (reference clamps to [0, max_len-1]; capacity-1 here since specials
        # don't carry text)
        self.overlap = max(0, min(capacity - 1, int(self.max_len * float(window_stride))))

    def detect(self, text: str) -> list[dict[str, Any]]:
        enc = self.tokenizer.encode(text, self.max_len, self.overlap)
        feeds = {k: enc[k] for k in self.input_names if k in enc}
        logits = self.session.run([self.output_name], feeds)[0]
        probs = _softmax(logits)
        pred_ids = probs.argmax(axis=-1)
        pred_conf = probs.max(axis=-1)

        entities: list[dict[str, Any]] = []
        input_ids = enc["input_ids"]
        offsets = enc["offset_mapping"]
        for chunk in range(input_ids.shape[0]):
            current: dict[str, Any] | None = None
            for token_id, label_id, conf, (tok_start, tok_end) in zip(
                input_ids[chunk].tolist(),
                pred_ids[chunk].tolist(),
                pred_conf[chunk].tolist(),
                offsets[chunk].tolist(),
            ):
                if token_id in self.tokenizer.special_ids:
                    continue
                if tok_start == tok_end == 0:
                    continue
                label = self.id2label.get(int(label_id), "O")
                confidence = float(conf)
                if label == "O" or confidence < self.confidence:
                    if current is not None:
                        entities.append(current)
                        current = None
                    continue
                base = label.replace("B-", "").replace("I-", "")
                entity_type = ENTITY_TYPE_MAP.get(base, base)
                if label.startswith("B-"):
                    if current is not None:
                        entities.append(current)
                    current = {
                        "span": [int(tok_start), int(tok_end)],
                        "type": str(entity_type),
                        "score": confidence,
                        "source": "onnx",
                    }
                elif (
                    label.startswith("I-")
                    and current is not None
                    and current.get("type") == str(entity_type)
                ):
                    current["span"][1] = int(tok_end)
                    current["score"] = max(float(current["score"]), confidence)
                else:
                    if current is not None:
                        entities.append(current)
                    current = None
            if current is not None:
                entities.append(current)
        return merge_ner_entities(entities)

    def detect_chunk(self, text: str, offset: int) -> list[dict[str, Any]]:
        """NerDetectStage seam: document offsets for a char-window chunk."""
        return [
            {**e, "span": [e["span"][0] + offset, e["span"][1] + offset]}
            for e in self.detect(text)
        ]


_NER_BACKEND_FACTORIES: dict[str, Callable[[], Any]] = {
    "stub": StubNerBackend,
    "token_label": TokenLabelBackend,
}
_NER_BACKEND_INSTANCES: dict[str, Any] = {}


def register_ner_backend(name: str, factory: Callable[[], Any]) -> None:
    """Register a backend factory resolvable by ``EngineConfig.ner_backend``
    (e.g. a partial of :class:`OnnxNerBackend` with a model path).  The
    name travels in the frozen config; the instance builds lazily per
    worker process."""
    _NER_BACKEND_FACTORIES[name] = factory
    _NER_BACKEND_INSTANCES.pop(name, None)


def get_ner_backend(name: str) -> Any:
    """Per-worker-process backend cache — the task-pool analogue of the
    actor-pool ``__init__`` load, mirroring the reference's process-global
    ``lru_cache`` registry (runtime/registry.py:10-51): a worker builds the
    backend once and every subsequent task on that worker reuses it."""
    if name not in _NER_BACKEND_INSTANCES:
        try:
            factory = _NER_BACKEND_FACTORIES[name]
        except KeyError:
            raise ValueError(
                f"unknown NER backend {name!r}; registered: "
                f"{sorted(_NER_BACKEND_FACTORIES)}"
            ) from None
        _NER_BACKEND_INSTANCES[name] = factory()
    return _NER_BACKEND_INSTANCES[name]


def merge_ner_entities(entities: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Cross-window merge (bert_detector.py:138-160): sort by start; merge an
    overlapping same-type pair when overlap > 0.5·min_len, keep max score."""
    if not entities:
        return []
    entities = sorted(entities, key=lambda x: x["span"][0])
    merged = [entities[0]]
    for current in entities[1:]:
        last = merged[-1]
        if current["span"][0] <= last["span"][1]:
            overlap = min(last["span"][1], current["span"][1]) - current["span"][0]
            min_length = min(
                last["span"][1] - last["span"][0], current["span"][1] - current["span"][0]
            )
            if current["type"] == last["type"] and overlap > min_length * 0.5:
                merged[-1]["span"][1] = max(last["span"][1], current["span"][1])
                merged[-1]["score"] = max(last["score"], current["score"])
                continue
        merged.append(current)
    return merged


def detect_with_windows(
    text: str, backend: Any, *, window: int = 512
) -> list[dict[str, Any]]:
    """Char-window chunk loop + merge (bert_detector.py:59-75 semantics)."""
    stride = max(1, window // 2)
    entities: list[dict[str, Any]] = []
    for offset in range(0, len(text), stride):
        entities.extend(backend.detect_chunk(text[offset : offset + window], offset))
    return merge_ner_entities(entities)


class NerDetectStage:
    """Actor-pool stage: NER (stub/ONNX) + regex backstop + composite resolve.

    Usage::

        ds.map_batches(NerDetectStage, fn_constructor_kwargs={"cfg": cfg},
                       batch_format="pyarrow", batch_size=64,
                       concurrency=8, num_cpus=1)
    """

    def __init__(self, cfg: EngineConfig | None = None, backend_factory: Callable[[], Any] | None = None):
        self.cfg = cfg or EngineConfig()
        self.backend = (backend_factory or StubNerBackend)()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = (
            batch["lang"].to_pylist() if "lang" in batch.column_names else ["zh"] * len(texts)
        )
        out: list[list[dict[str, Any]]] = []
        for text, lang in zip(texts, langs):
            text = text or ""
            ner = detect_with_windows(text, self.backend, window=self.cfg.ner_window)
            rules = compile_rules(str(self.cfg.rules_path(lang or "zh")))
            combined = ner + regex_detect(text, rules)
            resolved = resolve_conflicts(combined, self.cfg.entity_priority)
            out.append(
                [
                    {
                        "type": e["type"],
                        "start": int(e["span"][0]),
                        "end": int(e["span"][1]),
                        "confidence": float(e["score"]),
                        "source": e.get("source", "unknown"),
                        "text": text[int(e["span"][0]) : int(e["span"][1])],
                    }
                    for e in resolved
                ]
            )
        entity_struct = pa.struct(
            [
                ("type", pa.string()),
                ("start", pa.int64()),
                ("end", pa.int64()),
                ("confidence", pa.float64()),
                ("source", pa.string()),
                ("text", pa.string()),
            ]
        )
        return batch.append_column("entities", pa.array(out, pa.list_(entity_struct)))
