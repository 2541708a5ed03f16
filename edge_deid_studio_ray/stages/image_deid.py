"""Image de-identification pipeline (OCR → detect → replace → redaction
boxes) as an actor-pool stage.

Ray-native restatement of ``ImageDeidProcessor.process``
(/root/reference/src/deid_pipeline/image_deid/processor.py:22-62, SURVEY.md
§3.2): OCR produces text + a per-character offset map
``[((page, l, t, r, b), char_index), ...]`` (parser/text_extractor.py:17-18);
detection + deterministic replacement run on the text; per-entity bounding
boxes are merged from the per-char map (``_attach_bboxes``,
processor.py:115-144 — reproduced exactly in :func:`attach_offset_bboxes`);
the visual-redaction step emits the rectangle list (the cv2 drawing itself
is backend-gated, as is real OCR — this environment has neither, so the
default OCR backend is a deterministic fake that exercises the full
plumbing).
"""

from __future__ import annotations

import hashlib
import random
from typing import Any, Callable

import pyarrow as pa

from ..config import EngineConfig
from ..kernels.contracts import context_hash, normalize_entity
from ..kernels.detect import compile_rules, regex_detect, resolve_conflicts
from ..kernels.replace import replace_text

OffsetMap = list[tuple[tuple[int, int, int, int, int], int]]


def attach_offset_bboxes(entities: list[dict[str, Any]], offset_map: OffsetMap) -> None:
    """Merge per-char bboxes into one bbox per entity, in place.

    Exact semantics of ``ImageDeidProcessor._attach_bboxes``
    (processor.py:115-144): only page-0 positions participate; the merged
    box is the min/max envelope; entities whose span has no mapped chars
    are left untouched.
    """
    position_index = {pos[1]: pos[0] for pos in offset_map}
    for entity in entities:
        if "span" not in entity:
            continue
        start, end = entity["span"]
        bboxes = []
        for i in range(int(start), int(end)):
            bbox = position_index.get(i)
            if not bbox:
                continue
            page, left, top, right, bottom = bbox
            if page != 0:
                continue
            bboxes.append((left, top, right, bottom))
        if not bboxes:
            continue
        entity["page_index"] = 0
        entity["bbox"] = (
            int(min(b[0] for b in bboxes)),
            int(min(b[1] for b in bboxes)),
            int(max(b[2] for b in bboxes)),
            int(max(b[3] for b in bboxes)),
        )


class FakeOcrBackend:
    """Deterministic OCR stand-in: derives text + a per-char offset map from
    the payload bytes (real EasyOCR/tesseract backends are import-gated and
    slot in behind the same ``read(payload) -> (text, offset_map)``)."""

    _WORDS = ["patient", "id", "A123456789", "phone", "0912-345-678", "visit", "note"]

    def read(self, payload: bytes) -> tuple[str, OffsetMap]:
        rng = random.Random(int.from_bytes(hashlib.blake2b(payload or b"", digest_size=4).digest(), "big"))
        words = [rng.choice(self._WORDS) for _ in range(rng.randint(3, 8))]
        text = " ".join(words)
        offset_map: OffsetMap = []
        x, y, char_height, char_width = 10, 20, 18, 9
        for idx, ch in enumerate(text):
            if ch != " ":
                offset_map.append(((0, x, y, x + char_width, y + char_height), idx))
            x += char_width
        return text, offset_map


def fill_black_boxes(img, boxes: list[tuple[int, int, int, int]]):
    """Black-box redaction fill on a decoded image array, in place — the
    numpy equivalent of the reference's ``cv2.rectangle(..., thickness=-1)``
    fill loop (handlers/image.py:45-141).  Only the jpg/png ENCODE step
    needs a raster library; the fill itself does not.

    Boxes are (left, top, right, bottom) pixel envelopes, clamped to the
    image; returns the array for chaining.
    """
    height, width = img.shape[:2]
    for left, top, right, bottom in boxes:
        t = max(0, min(int(top), height))
        b = max(0, min(int(bottom), height))
        l = max(0, min(int(left), width))
        r = max(0, min(int(right), width))
        if b > t and r > l:
            img[t:b, l:r] = 0
    return img


def _real_ocr_backend():
    """Import-gated real backend.  When wired, the decoded image array MUST
    run through ``kernels.imageproc.ocr_preprocess`` (gray → adaptive
    Gaussian threshold 11/2 → 3×3 median) before recognition — the exact
    preprocessing the reference applies (parser/ocr.py:79-93), implemented
    pure-numpy and unit-tested so extraction parity holds the day a real
    engine lands."""
    try:  # pragma: no cover - OCR libs not installed here
        import easyocr  # type: ignore  # noqa: F401

        raise NotImplementedError(
            "wire easyocr Reader here (decode -> kernels.imageproc.ocr_preprocess -> readtext)"
        )
    except ImportError:
        return None


class ImageDeidStage:
    """Actor-pool stage: rows (media_id, payload) → deid text + redaction boxes.

    The OCR engine loads once per actor (the reference keeps per-process
    singletons, parser/ocr.py:25-201).  Use via::

        ds.map_batches(ImageDeidStage, batch_format="pyarrow",
                       batch_size=16, concurrency=N, num_cpus=1)
    """

    def __init__(self, cfg: EngineConfig | None = None, ocr_factory: Callable[[], Any] | None = None):
        self.cfg = cfg or EngineConfig()
        self.ocr = (ocr_factory or (lambda: _real_ocr_backend() or FakeOcrBackend()))()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list[Any]] = {
            "media_id": [],
            "text": [],
            "clean_text": [],
            "n_spans": [],
            "redaction_boxes": [],
        }
        rules = compile_rules(str(self.cfg.rules_path("zh")))
        for media_id, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            text, offset_map = self.ocr.read(payload or b"")
            entities = resolve_conflicts(regex_detect(text, rules), self.cfg.entity_priority)
            clean, _ = replace_text(
                text, entities, self.cfg.mode, context_hash=context_hash(text), locale=self.cfg.faker_locale
            )
            normalized = [normalize_entity(e, language="zh", text=text) for e in entities]
            attach_offset_bboxes(normalized, offset_map)
            out["media_id"].append(media_id)
            out["text"].append(text)
            out["clean_text"].append(clean)
            out["n_spans"].append(len(normalized))
            out["redaction_boxes"].append(
                [list(e["bbox"]) for e in normalized if e.get("bbox") is not None]
            )
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "text": pa.array(out["text"], pa.string()),
                "clean_text": pa.array(out["clean_text"], pa.string()),
                "n_spans": pa.array(out["n_spans"], pa.int64()),
                "redaction_boxes": pa.array(out["redaction_boxes"], pa.list_(pa.list_(pa.int32()))),
            }
        )
