"""Fused per-document de-identification pipeline (extract → detect → resolve
→ replace → normalize → anchors).

This single pure function is both:

- the body of the hot ``map_batches`` stage (stages/deid.py) — one call per
  row inside a vectorized batch loop, and
- the plain-Python oracle that the Dataset pipeline is byte-identity tested
  against.

Stage order and IR mirror ``DeidPipeline.process``
(/root/reference/src/deid_pipeline/__init__.py:49-148) restricted to the
deterministic default matrix (regex detection + deterministic fallback
replacement; tests/conftest.py:8-29).
"""

from __future__ import annotations

from typing import Any

from ..config import EngineConfig
from .anchors import attach_segment_anchors
from .boilerplate import extract_main_content
from .contracts import context_hash, normalize_entity, replacement_key
from .detect import compile_rules, regex_detect, resolve_conflicts
from .html_text import decode_html_bytes, html_to_text
from .pdf_text import is_pdf, pdf_parse
from .replace import replace_text
from .segments import build_text_from_segments


def _resolve_ocr_backend(name: str | None):
    """OCR backend registry ("fake" = deterministic plumbing backend; real
    engines are import-gated in stages/image_deid.py).  Lazy import keeps
    the kernel layer free of stage imports at module load."""
    if name is None:
        return None
    if name == "fake":
        from ..stages.image_deid import FakeOcrBackend

        return FakeOcrBackend()
    if name == "easyocr":
        from ..stages.image_deid import _real_ocr_backend

        backend = _real_ocr_backend()
        if backend is None:
            raise NotImplementedError("OCR backend 'easyocr' is not installed")
        return backend
    # an actual registry lookup: an unknown (or typo'd) name must not
    # silently resolve to whatever single real backend happens to exist
    raise ValueError(f"unknown OCR backend {name!r}; registered: fake, easyocr")


def extract_page(
    html: bytes | None,
    text: str | None,
    *,
    url: str | None = None,
    extract_mode: str = "full",
    pdf_ocr: str | None = None,
    ocr_threshold: int = 50,
) -> tuple[str, list[dict[str, Any]], str, str | None]:
    """Extract text from a page row; returns (text, segments, route, error).

    Routing (HandlerRegistry-by-extension analogue, handlers/registry.py):
    - pre-extracted ``text`` present → passthrough (single segment);
    - url ending ``.csv`` → per-cell segments with R{r}C{c} cell refs
      (csv.py:14-39 semantics, "\\n" join);
    - ``%PDF-`` payload → layout-aware block extractor (pdf.py:13-42
      semantics: per-block segments with page_index + bbox, "\\n" join);
    - otherwise HTML → all-text extraction (text.py:17-24 semantics) or
      main-content boilerplate strip when ``extract_mode="main_content"``.
    """
    if text is not None:
        extracted, segments = build_text_from_segments([{"text": text}])
        return extracted, segments, "text", None

    raw = html or b""
    if url is not None and url.lower().endswith(".csv"):
        from .segments import csv_to_segments

        specs = csv_to_segments(decode_html_bytes(raw))
        extracted, segments = build_text_from_segments(specs)
        return extracted, segments, "csv", None

    if is_pdf(raw):
        try:
            specs, num_pages = pdf_parse(raw)
        except NotImplementedError:
            extracted, segments = build_text_from_segments([{"text": ""}])
            return extracted, segments, "pdf", "pdf_backend_unavailable"
        # per-page OCR fallback (text_extractor.py:155-183): pages whose
        # extracted text is below the threshold are re-read through OCR and
        # their blocks REPLACED by the OCR text, as the reference does
        ocr = _resolve_ocr_backend(pdf_ocr)
        if ocr is not None:
            by_page: dict[int, list[dict[str, Any]]] = {}
            for s in specs:
                by_page.setdefault(int(s.get("page_index") or 0), []).append(s)
            rebuilt: list[dict[str, Any]] = []
            for page in range(num_pages):
                page_specs = by_page.get(page, [])
                page_text = "\n".join(s["text"] for s in page_specs).strip()
                if len(page_text) < ocr_threshold:
                    ocr_text, _ = ocr.read(raw + b"#page%d" % page)
                    ocr_text = (ocr_text or "").strip()
                    if ocr_text:
                        rebuilt.append({"text": ocr_text, "page_index": page})
                    else:
                        # OCR came back empty (blank scan): KEEP the page's
                        # real extracted blocks — replacing 30 genuine chars
                        # with nothing is content loss, and unredacted PII
                        # if any of them matched a rule
                        rebuilt.extend(page_specs)
                else:
                    rebuilt.extend(page_specs)
            specs = rebuilt
        extracted, segments = build_text_from_segments(specs or [{"text": ""}])
        return extracted, segments, "pdf", None

    if raw.startswith(b"PK\x03\x04"):
        from .ooxml import ooxml_to_segments

        dispatched = ooxml_to_segments(raw)
        if dispatched is not None:
            specs, route = dispatched
            extracted, segments = build_text_from_segments(specs)
            return extracted, segments, route, None

    decoded = decode_html_bytes(raw)
    if extract_mode == "main_content":
        extracted = extract_main_content(decoded)
    else:
        extracted = html_to_text(decoded)
    extracted_text, segments = build_text_from_segments([{"text": extracted}])
    return extracted_text, segments, "html", None


def process_document(
    *,
    html: bytes | None = None,
    text: str | None = None,
    url: str | None = None,
    lang: str = "zh",
    cfg: EngineConfig | None = None,
) -> dict[str, Any]:
    """Run the full deid pipeline on one page; returns the output row dict.

    Output columns (Arrow-encodable):
    ``extracted_text, context_hash, clean_text, entities, events,
    replacement_map, route, error, n_spans, n_chars, n_bytes`` plus the
    per-stage ``t_*_ms`` timings.  ``replacement_map`` (the reference's
    DeidResult field, consumed by the docx/pptx/xlsx/csv rebuild sinks) is
    derivable from ``events`` — the Arrow batch stage drops it rather than
    shipping a redundant map column."""
    from time import perf_counter

    cfg = cfg or EngineConfig()

    # per-stage wall timings mirror DeidResult.timings_ms
    # (/root/reference/src/deid_pipeline/__init__.py:133-139); they aggregate
    # into per-partition metrics in the lineage manifests.
    t0 = perf_counter()
    extracted_text, segments, route, error = extract_page(
        html,
        text,
        url=url,
        extract_mode=cfg.extract_mode,
        pdf_ocr=cfg.pdf_ocr,
        ocr_threshold=cfg.ocr_threshold,
    )
    doc_hash = context_hash(extracted_text)
    t1 = perf_counter()

    patterns = compile_rules(str(cfg.rules_path(lang)))
    detected = regex_detect(extracted_text, patterns)
    if cfg.ner_backend:
        # get_detector composition (reference pii/detectors/__init__.py:20-76):
        # NER first, regex backstop appended, one composite resolve.  The
        # backend resolves by name per worker process (lazy import keeps the
        # kernel layer stage-free at module load).
        from ..stages.ner import detect_with_windows, get_ner_backend

        detected = (
            detect_with_windows(
                extracted_text,
                get_ner_backend(cfg.ner_backend),
                window=cfg.ner_window,
            )
            + detected
        )
    raw_entities = resolve_conflicts(detected, cfg.entity_priority)
    t2 = perf_counter()

    from .replace import get_provider

    clean_text, raw_events = replace_text(
        extracted_text,
        raw_entities,
        cfg.mode,
        context_hash=doc_hash,
        locale=cfg.faker_locale,
        provider=get_provider(cfg.provider_name),
    )
    t3 = perf_counter()

    # Fast path for the common single-segment document: normalization +
    # anchor attachment fuse into the final Arrow-shaped dict build below
    # (normalize_entity adds nothing observable there beyond confidence
    # coercion + text slicing, and a lone unanchored segment attaches no
    # anchors).  Multi-segment docs take the full per-entity path.
    single_plain_segment = len(segments) == 1 and not (
        segments[0].get("page_index") is not None
        or segments[0].get("bbox") is not None
        or segments[0].get("cell") is not None
    )
    if single_plain_segment:
        arrow_entities = [
            {
                "type": str(e["type"]),
                "start": int(e["span"][0]),
                "end": int(e["span"][1]),
                "confidence": float(e.get("confidence", e.get("score", 0.0))),
                "source": str(e.get("source") or "unknown"),
                "text": extracted_text[int(e["span"][0]) : int(e["span"][1])],
                "page_index": None,
                "bbox": None,
                "cell_address": None,
            }
            for e in raw_entities
        ]
    else:
        entities = [
            normalize_entity(e, language=lang, text=extracted_text) for e in raw_entities
        ]
        attach_segment_anchors(entities, segments)
        arrow_entities = [
            {
                "type": e["type"],
                "start": int(e["span"][0]),
                "end": int(e["span"][1]),
                "confidence": float(e["confidence"]),
                "source": e["source"],
                "text": e.get("text", ""),
                "page_index": e.get("page_index"),
                "bbox": list(e["bbox"]) if e.get("bbox") is not None else None,
                "cell_address": (e.get("cell") or {}).get("address"),
            }
            for e in entities
        ]

    # canonical events + replacement map (DeidPipeline.process, __init__.py:100-117):
    # blackbox events carry no original/replacement and are skipped.
    events: list[dict[str, Any]] = []
    replacement_map: dict[str, str] = {}
    for ev in raw_events:
        original = ev.get("original")
        replacement = ev.get("replacement")
        entity_type = ev.get("type")
        if original is not None and replacement is not None and entity_type is not None:
            replacement_map[replacement_key(str(entity_type), str(original))] = str(replacement)
            events.append(
                {
                    "entity_type": str(entity_type),
                    "original": str(original),
                    "replacement": str(replacement),
                    "start": int(ev["span"][0]),
                    "end": int(ev["span"][1]),
                    "source": str(ev.get("source", "unknown")),
                }
            )

    return {
        "extracted_text": extracted_text,
        "context_hash": doc_hash,
        "clean_text": clean_text,
        "entities": arrow_entities,
        "events": events,
        "replacement_map": replacement_map,
        "route": route,
        "error": error,
        "n_spans": len(arrow_entities),
        "n_chars": len(extracted_text),
        # bytes of the input the pipeline ACTUALLY consumed: the text
        # passthrough route never parses the html payload, so counting it
        # would inflate manifest byte counters and throughput accounting
        "n_bytes": (
            len((text or "").encode("utf-8", "replace"))
            if route == "text" or html is None
            else len(html)
        ),
        "t_extract_ms": (t1 - t0) * 1000.0,
        "t_detect_ms": (t2 - t1) * 1000.0,
        "t_replace_ms": (t3 - t2) * 1000.0,
    }
