"""Tests for the NER actor-pool stage, training-data pipelines, quality
report aggregation, and multimodal stages."""

from __future__ import annotations

import pyarrow as pa
import pytest


class TestNerStage:
    def test_stub_detection_semantics(self):
        # Expected spans mirror the reference stub (_stub_detection,
        # bert_detector.py:162-177: [A-Z][12]\d{8} → ID, 09\d{2}-?\d{3}-?\d{3}
        # → PHONE, source=regex_stub).  The reference module itself imports
        # torch at module scope, so parity is asserted against the literal
        # pattern semantics instead of the import.
        from edge_deid_studio_ray.stages.ner import StubNerBackend, detect_with_windows

        text = "id A123456789 phone 0912-345-678 end"
        mine = detect_with_windows(text, StubNerBackend(), window=512)
        assert [(tuple(e["span"]), e["type"], e["source"]) for e in mine] == [
            ((3, 13), "ID", "regex_stub"),
            ((20, 32), "PHONE", "regex_stub"),
        ]
        assert detect_with_windows("no entities here", StubNerBackend()) == []

    def test_window_merge_across_boundaries(self):
        from edge_deid_studio_ray.stages.ner import StubNerBackend, detect_with_windows

        # place an ID right on a window boundary: stride windows overlap it,
        # both windows detect it, merge must collapse to one entity
        pad = "x" * 250
        text = pad + " A123456789 " + "y" * 300
        entities = detect_with_windows(text, StubNerBackend(), window=512)
        assert len(entities) == 1
        start, end = entities[0]["span"]
        assert text[start:end] == "A123456789"

    def test_actor_pool_stage(self, ray_session):
        import ray.data as rd

        from edge_deid_studio_ray.stages.ner import NerDetectStage

        table = pa.table(
            {
                "text": ["id A123456789 mail a@b.com", "phone 0912-345-678", ""],
                "lang": ["zh", "zh", "en"],
            }
        )
        out = rd.from_arrow(table).map_batches(
            NerDetectStage,
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
            num_cpus=1,
        ).take_all()
        types0 = {e["type"] for e in out[0]["entities"]}
        assert "ID" in types0 and "EMAIL" in types0
        # regex_stub ID and regex ID overlap fully → conflict resolution keeps one
        id_entities = [e for e in out[0]["entities"] if e["type"] == "ID"]
        assert len(id_entities) == 1
        assert out[2]["entities"] == []


class TestTrainingData:
    def test_synthetic_dataset_distributed_matches_sequential(self, ray_session):
        from edge_deid_studio_ray.kernels.synthetic import generate_synthetic_span_examples
        from edge_deid_studio_ray.pipelines.training_data import synthetic_span_dataset

        rows = {r["example_id"]: r for r in synthetic_span_dataset(40, seed=3).take_all()}
        oracle = generate_synthetic_span_examples(num_examples=40, seed=3)
        for idx, ex in enumerate(oracle):
            assert rows[idx]["text"] == ex["text"]
            assert [e["type"] for e in rows[idx]["entities"]] == [
                e["type"] for e in ex["entities"]
            ]

    def test_mix_caps_and_shuffles_deterministically(self, ray_session):
        from edge_deid_studio_ray.pipelines.training_data import (
            mix_datasets,
            synthetic_span_dataset,
        )

        a = synthetic_span_dataset(30, seed=1)
        b = synthetic_span_dataset(30, seed=2, language="en")
        mixed = mix_datasets([(a, 10), (b, 20)], seed=5)
        assert mixed.count() == 30
        ids1 = [r["example_id"] for r in mix_datasets([(a, 10), (b, 20)], seed=5).take_all()]
        ids2 = [r["example_id"] for r in mix_datasets([(a, 10), (b, 20)], seed=5).take_all()]
        assert ids1 == ids2  # seeded shuffle is reproducible

    def test_placeholder_corpus_roundtrip(self, ray_session):
        from edge_deid_studio_ray.pipelines.training_data import (
            placeholder_corpus,
            synthetic_span_dataset,
        )

        rows = placeholder_corpus(synthetic_span_dataset(5, seed=0)).take_all()
        for row in rows:
            assert "<NAME>" in row["masked_text"]
            assert "<PHONE>" in row["masked_text"]
            # refill replaced every placeholder with a concrete value
            assert "<NAME>" not in row["filled_text"]
            for ent in row["entities"]:
                assert ent["text"] not in row["masked_text"]

    def test_masked_pair_recovery_dataset(self, ray_session):
        import ray.data as rd

        from edge_deid_studio_ray.pipelines.training_data import masked_pair_recovery

        table = pa.table(
            {
                "original_text": ["John called 0912345678 now"],
                "masked_text": ["<NAME> called <PHONE> now"],
            }
        )
        rows = masked_pair_recovery(rd.from_arrow(table)).take_all()
        got = [(e["type"], e["text"]) for e in rows[0]["entities"]]
        assert ("NAME", "John") in got and ("PHONE", "0912345678") in got


class TestQualityReport:
    def test_matches_reference_analyze(self, ray_session):
        import os
        import sys

        if not os.path.isdir("/root/reference/src"):
            pytest.skip("no reference")
        sys.path.insert(0, "/root/reference/src")
        from deid_pipeline.training.datasets import SpanExample
        from deid_pipeline.training.quality import analyze_span_examples

        from edge_deid_studio_ray.kernels.synthetic import generate_synthetic_span_examples
        from edge_deid_studio_ray.pipelines.training_data import synthetic_span_dataset
        from edge_deid_studio_ray.stages.quality import quality_report

        n = 60
        ref_examples = [
            SpanExample(text=ex["text"], entities=tuple(ex["entities"]))
            for ex in generate_synthetic_span_examples(num_examples=n, seed=9)
        ]
        ref_report = analyze_span_examples(ref_examples)["summary"]

        my_report = quality_report(synthetic_span_dataset(n, seed=9))["summary"]

        assert my_report["examples"] == ref_report["examples"]
        assert my_report["entities"] == ref_report["entities"]
        assert my_report["invalid_examples"] == ref_report["invalid_examples"]
        assert my_report["entity_type_counts"] == ref_report["entity_type_counts"]
        for dist in ("text_length", "entities_per_example", "entity_span_length"):
            for stat in ("min", "max", "mean", "p50", "p95"):
                assert my_report[dist][stat] == pytest.approx(ref_report[dist][stat]), (dist, stat)

    def test_eval_aggregate(self, ray_session):
        import ray.data as rd

        from edge_deid_studio_ray.stages.quality import eval_aggregate

        table = pa.table(
            {
                "example_id": ["a", "b"],
                "input_text": [
                    "id [ID]A123456789[/ID] ok",
                    "mail [EMAIL]x@y.com[/EMAIL] ok",
                ],
                "prediction_text": ["id B234567890 ok", "mail x@y.com ok"],  # b leaks
            }
        )
        agg = eval_aggregate(rd.from_arrow(table))
        assert agg["count"] == 2
        assert agg["pii_total"] == 2
        assert agg["pii_leak_count"] == 1
        assert agg["pii_leak_rate"] == 0.5


class TestMultimodal:
    def test_image_feature_stage(self, ray_session):
        import ray.data as rd

        from edge_deid_studio_ray.stages.multimodal import IMAGE_FEATURE_SCHEMA, ImageFeatureStage

        table = pa.table(
            {
                "media_id": ["m1", "m2"],
                "payload": pa.array([b"fakejpegbytes1", b"fakejpegbytes2"], pa.binary()),
            }
        )
        out = rd.from_arrow(table).map_batches(
            ImageFeatureStage, batch_format="pyarrow", batch_size=16, concurrency=1
        )
        rows = out.take_all()
        assert len(rows) == 2
        assert len(rows[0]["feature"]) == 16 * 16
        assert rows[0]["decode_backend"] in ("fake", "cv2")
        # determinism: same payload → same feature
        rows2 = rd.from_arrow(table).map_batches(
            ImageFeatureStage, batch_format="pyarrow", batch_size=16, concurrency=1
        ).take_all()
        assert rows[0]["feature"] == rows2[0]["feature"]

    def test_audio_frame_stage(self, ray_session):
        import ray.data as rd

        from edge_deid_studio_ray.stages.multimodal import AudioFrameStage

        table = pa.table(
            {"media_id": ["a1"], "payload": pa.array([b"fakewav"], pa.binary())}
        )
        rows = rd.from_arrow(table).map_batches(
            AudioFrameStage, batch_format="pyarrow", concurrency=1
        ).take_all()
        assert rows[0]["n_frames"] == 10
        assert len(rows[0]["frame_energy"]) == 10

    def test_video_frame_sample_stage(self, ray_session):
        """Frame sampling is a flat-map: one row per sampled frame, stride
        honored, timestamps monotonic, deterministic per payload."""
        import ray.data as rd

        from edge_deid_studio_ray.stages.multimodal import (
            VIDEO_FRAME_SCHEMA,
            VideoFrameSampleStage,
        )

        table = pa.table(
            {
                "media_id": ["v1", "v2"],
                "payload": pa.array([b"fakemp4-one", b"fakemp4-two"], pa.binary()),
            }
        )
        rows = (
            rd.from_arrow(table)
            .map_batches(
                VideoFrameSampleStage,
                fn_constructor_kwargs={"stride": 5},
                batch_format="pyarrow",
                batch_size=4,
                concurrency=1,
            )
            .take_all()
        )
        by_media: dict = {}
        for r in rows:
            by_media.setdefault(r["media_id"], []).append(r)
        assert set(by_media) == {"v1", "v2"}
        v1 = sorted(by_media["v1"], key=lambda r: r["frame_index"])
        assert len(v1) > 1
        assert all(r["frame_index"] % 5 == 0 for r in v1)
        ts = [r["ts_ms"] for r in v1]
        assert ts == sorted(ts)
        assert len(v1[0]["feature"]) == 8 * 8
        assert set(VIDEO_FRAME_SCHEMA.names) == set(rows[0].keys())


class TestSpanJsonlIO:
    def test_roundtrip_write_read_json(self, ray_session, tmp_path):
        """S10: span datasets persist as JSONL via write_json/read_json."""
        import ray.data as rd

        from edge_deid_studio_ray.pipelines.training_data import synthetic_span_dataset

        out = str(tmp_path / "spans")
        ds = synthetic_span_dataset(20, seed=5)
        ds.write_json(out)
        back = rd.read_json(out)
        a = sorted(ds.take_all(), key=lambda r: r["example_id"])
        b = sorted(back.take_all(), key=lambda r: r["example_id"])
        assert [r["text"] for r in a] == [r["text"] for r in b]
        assert [[e["type"] for e in r["entities"]] for r in a] == [
            [e["type"] for e in r["entities"]] for r in b
        ]


class TestImageDeid:
    def test_fill_black_boxes(self):
        """Black-box fill: exact envelope zeroed, outside untouched, boxes
        clamped to the image."""
        import numpy as np

        from edge_deid_studio_ray.stages.image_deid import FakeOcrBackend, fill_black_boxes
        from edge_deid_studio_ray.stages.multimodal import DeterministicFakeCodec

        img = DeterministicFakeCodec().decode_image(b"payload") + 1  # no natural zeros
        h, w = img.shape[:2]
        before = img.copy()
        out = fill_black_boxes(img, [(2, 3, 6, 7), (w - 2, h - 2, w + 9, h + 9)])
        assert out is img
        assert (img[3:7, 2:6] == 0).all()
        assert (img[h - 2 :, w - 2 :] == 0).all()  # clamped overflow box
        img[3:7, 2:6] = before[3:7, 2:6]
        img[h - 2 :, w - 2 :] = before[h - 2 :, w - 2 :]
        assert (img == before).all()  # nothing outside the boxes changed

    def test_attach_offset_bboxes_matches_reference(self):
        """Parity with ImageDeidProcessor._attach_bboxes on a synthetic map.

        The reference module imports cv2 at module scope, so the expected
        values are computed from the identical pure algorithm spec
        (processor.py:115-144): min/max envelope over page-0 per-char boxes.
        """
        from edge_deid_studio_ray.stages.image_deid import attach_offset_bboxes

        # chars 0-4 on page 0 at x = 10,20,30,40,50; char 3 missing; char 5 page 1
        offset_map = [
            ((0, 10, 5, 18, 20), 0),
            ((0, 20, 5, 28, 20), 1),
            ((0, 30, 4, 38, 21), 2),
            ((0, 50, 5, 58, 20), 4),
            ((1, 99, 99, 100, 100), 5),
        ]
        entities = [
            {"type": "ID", "span": (0, 5)},
            {"type": "PHONE", "span": (5, 6)},   # only page-1 chars → no bbox
            {"type": "NAME", "span": (10, 12)},  # unmapped span → untouched
        ]
        attach_offset_bboxes(entities, offset_map)
        assert entities[0]["bbox"] == (10, 4, 58, 21)
        assert entities[0]["page_index"] == 0
        assert "bbox" not in entities[1]
        assert "bbox" not in entities[2]

    def test_image_deid_stage_end_to_end(self, ray_session):
        import ray.data as rd

        from edge_deid_studio_ray.stages.image_deid import ImageDeidStage

        table = pa.table(
            {
                "media_id": ["img1", "img2"],
                "payload": pa.array([b"imagebytes-a", b"imagebytes-b"], pa.binary()),
            }
        )
        rows = rd.from_arrow(table).map_batches(
            ImageDeidStage, batch_format="pyarrow", batch_size=8, concurrency=1
        ).take_all()
        assert len(rows) == 2
        for row in rows:
            if row["n_spans"]:
                # every detected entity got a merged redaction box
                assert len(row["redaction_boxes"]) == row["n_spans"]
                assert "A123456789" not in row["clean_text"]
        # deterministic across runs
        rows2 = rd.from_arrow(table).map_batches(
            ImageDeidStage, batch_format="pyarrow", batch_size=8, concurrency=1
        ).take_all()
        assert rows == rows2


class TestBioDecode:
    def test_basic_bio_assembly(self):
        from edge_deid_studio_ray.stages.ner import decode_bio_spans

        # "John Smith lives" → B-PER I-PER O
        offsets = [(0, 0), (0, 4), (5, 10), (11, 16), (0, 0)]  # CLS ... SEP
        labels = ["O", "B-PER", "I-PER", "O", "O"]
        confs = [0.1, 0.9, 0.8, 0.2, 0.1]
        spans = decode_bio_spans(offsets, labels, confs)
        assert spans == [
            {"span": [0, 10], "type": "NAME", "score": 0.9, "source": "bert"}
        ]

    def test_type_change_breaks_entity(self):
        from edge_deid_studio_ray.stages.ner import decode_bio_spans

        offsets = [(0, 3), (4, 7), (8, 11)]
        labels = ["B-LOC", "I-ORG", "I-LOC"]  # I- of different type closes
        confs = [0.9, 0.8, 0.7]
        spans = decode_bio_spans(offsets, labels, confs)
        # B-LOC closed by I-ORG (type mismatch → current dropped per
        # reference: "else" branch appends current then resets);
        # trailing I-LOC without an open entity is ignored
        assert [s["type"] for s in spans] == ["ADDRESS"]
        assert spans[0]["span"] == [0, 3]

    def test_offset_shift_and_max_confidence(self):
        from edge_deid_studio_ray.stages.ner import decode_bio_spans

        offsets = [(0, 2), (3, 5)]
        labels = ["B-PHONE", "I-PHONE"]
        confs = [0.6, 0.95]
        spans = decode_bio_spans(offsets, labels, confs, offset=100)
        assert spans[0]["span"] == [100, 105]
        assert spans[0]["score"] == 0.95


class TestTokenLabelBackend:
    def test_full_ner_plumbing_with_model_shaped_backend(self, ray_session):
        """Windows → per-token BIO labels → decode → merge → composite with
        regex backstop: the complete path a real model backend rides."""
        import ray.data as rd

        from edge_deid_studio_ray.stages.ner import NerDetectStage, TokenLabelBackend

        table = pa.table(
            {
                "text": ["John Smith phoned 0912-345-678 from Taipei"],
                "lang": ["zh"],
            }
        )
        rows = rd.from_arrow(table).map_batches(
            NerDetectStage,
            fn_constructor_kwargs={"backend_factory": TokenLabelBackend},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=1,
        ).take_all()
        entities = {(e["type"], e["text"]): e for e in rows[0]["entities"]}
        # BIO B-PER + I-PER merged into one NAME span via ENTITY_TYPE_MAP
        assert ("NAME", "John Smith") in entities
        assert entities[("NAME", "John Smith")]["source"] == "bert"
        assert entities[("NAME", "John Smith")]["confidence"] == 0.95
        # LOC → ADDRESS normalization
        assert ("ADDRESS", "Taipei") in entities
        # regex backstop still contributes
        assert ("PHONE", "0912-345-678") in entities

    def test_window_boundary_merge_with_model_backend(self):
        from edge_deid_studio_ray.stages.ner import TokenLabelBackend, detect_with_windows

        pad = "x " * 130  # 260 chars; window 256, stride 128 → entity spans both windows
        text = pad + "John Smith" + " y" * 50
        entities = detect_with_windows(text, TokenLabelBackend(), window=256)
        names = [e for e in entities if e["type"] == "NAME"]
        assert len(names) == 1
        start, end = names[0]["span"]
        assert text[start:end] == "John Smith"


class TestOnnxBackendRealPath:
    """The ONNX backend's full inference path — overflow-window encoding,
    batched session.run, softmax, 0.85 threshold, BIO decode, overlap merge
    (reference bert_onnx_detector.py:26-174) — executed for REAL with a
    numpy matmul session (duck-typed ort.InferenceSession: one-hot embed ×
    weight matrix).  Only the ort import itself is absent."""

    VOCAB = {"john": 10, "smith": 11, "taipei": 12, "maybe": 13}
    ID2LABEL = {0: "O", 1: "B-PER", 2: "I-PER", 3: "B-LOC"}

    class _NumpySession:
        """logits = onehot(input_ids) @ W — a real (if tiny) token
        classifier, batched over [n_windows, max_len] exactly like ort."""

        def __init__(self, W):
            self.W = W

        def get_inputs(self):
            from types import SimpleNamespace

            return [SimpleNamespace(name="input_ids"), SimpleNamespace(name="attention_mask")]

        def get_outputs(self):
            from types import SimpleNamespace

            return [SimpleNamespace(name="logits")]

        def run(self, output_names, feeds):
            import numpy as np

            assert output_names == ["logits"]
            assert "input_ids" in feeds and feeds["input_ids"].ndim == 2
            onehot = np.eye(self.W.shape[0], dtype=np.float64)[feeds["input_ids"]]
            return [onehot @ self.W]

    def _backend(self, **kw):
        import numpy as np

        from edge_deid_studio_ray.stages.ner import OnnxNerBackend

        W = np.zeros((16, 4), dtype=np.float64)
        W[:, 0] = 8.0  # every id defaults to a confident O
        W[10] = [0.0, 8.0, 0.0, 0.0]  # john   → B-PER, conf ≈ 1
        W[11] = [0.0, 0.0, 8.0, 0.0]  # smith  → I-PER
        W[12] = [0.0, 0.0, 0.0, 8.0]  # taipei → B-LOC (→ ADDRESS)
        W[13] = [0.5, 1.0, 0.0, 0.0]  # maybe  → argmax B-PER but conf ≈ 0.43
        return OnnxNerBackend(
            session=self._NumpySession(W),
            vocab=self.VOCAB,
            id2label=self.ID2LABEL,
            **kw,
        )

    def test_windowed_inference_merges_and_thresholds(self):
        text = "john smith works in taipei maybe john smith"
        # max_len 6 → 4-token windows with 3-token overlap: every entity is
        # seen by several windows and the merge must collapse duplicates
        backend = self._backend(max_len=6, window_stride=0.5)
        got = [(tuple(e["span"]), e["type"], e["source"]) for e in backend.detect(text)]
        assert got == [
            ((0, 10), "NAME", "onnx"),
            ((20, 26), "ADDRESS", "onnx"),
            ((33, 43), "NAME", "onnx"),
        ]
        # sub-threshold token ("maybe", conf ≈ 0.43 < 0.85) never surfaces
        assert all(not (s <= 27 < e) for (s, e), _, _ in got)

    def test_single_window_bio_extension_keeps_max_score(self):
        backend = self._backend(max_len=512)
        ents = backend.detect("john smith")
        assert len(ents) == 1
        assert ents[0]["span"] == [0, 10] and ents[0]["type"] == "NAME"
        assert ents[0]["score"] > 0.99

    def test_unknown_tokens_are_o(self):
        backend = self._backend(max_len=512)
        assert backend.detect("nothing to see here") == []
        assert backend.detect("") == []

    def test_actor_pool_stage_with_onnx_backend(self, ray_session):
        import ray.data as rd

        from edge_deid_studio_ray.stages.ner import NerDetectStage

        # self-contained factory: capturing the test INSTANCE in the actor
        # constructor closure makes cloudpickle serialize pytest internals
        def factory():
            import numpy as np

            from edge_deid_studio_ray.stages.ner import OnnxNerBackend

            class NumpySession:
                def __init__(self, W):
                    self.W = W

                def get_inputs(self):
                    from types import SimpleNamespace

                    return [
                        SimpleNamespace(name="input_ids"),
                        SimpleNamespace(name="attention_mask"),
                    ]

                def get_outputs(self):
                    from types import SimpleNamespace

                    return [SimpleNamespace(name="logits")]

                def run(self, output_names, feeds):
                    onehot = np.eye(self.W.shape[0], dtype=np.float64)[feeds["input_ids"]]
                    return [onehot @ self.W]

            W = np.zeros((16, 4), dtype=np.float64)
            W[:, 0] = 8.0
            W[10] = [0.0, 8.0, 0.0, 0.0]
            W[11] = [0.0, 0.0, 8.0, 0.0]
            W[12] = [0.0, 0.0, 0.0, 8.0]
            W[13] = [0.5, 1.0, 0.0, 0.0]
            return OnnxNerBackend(
                session=NumpySession(W),
                vocab={"john": 10, "smith": 11, "taipei": 12, "maybe": 13},
                id2label={0: "O", 1: "B-PER", 2: "I-PER", 3: "B-LOC"},
                max_len=8,
            )

        table = pa.table(
            {
                "text": ["john smith works in taipei", "id A123456789", ""],
                "lang": ["en", "zh", "en"],
            }
        )
        out = (
            rd.from_arrow(table)
            .map_batches(
                NerDetectStage,
                fn_constructor_kwargs={"backend_factory": factory},
                batch_format="pyarrow",
                batch_size=2,
                concurrency=1,
            )
            .take_all()
        )
        by_text = {r["text"]: r["entities"] for r in out}
        kinds = [(e["type"], e["source"]) for e in by_text["john smith works in taipei"]]
        assert ("NAME", "onnx") in kinds and ("ADDRESS", "onnx") in kinds
        # the regex backstop still fires alongside the model path
        assert any(e["type"] == "ID" for e in by_text["id A123456789"])
        assert by_text[""] == []

    def test_import_gate_without_session(self):
        import pytest as _pytest

        from edge_deid_studio_ray.stages.ner import OnnxNerBackend

        with _pytest.raises(NotImplementedError, match="onnxruntime"):
            OnnxNerBackend("/nonexistent/model.onnx")


class TestNerBackendConfigWiring:
    """EngineConfig.ner_backend now reaches the fused kernel: the flagship
    composes NER + regex backstop + composite resolve (get_detector
    semantics) when the knob is set; None keeps the regex-only default."""

    def test_stub_backend_through_process_document(self):
        from edge_deid_studio_ray.config import EngineConfig
        from edge_deid_studio_ray.kernels.docpipe import process_document

        text = "id A123456789 and phone 0912-345-678"
        plain = process_document(text=text, lang="zh")
        wired = process_document(
            text=text, lang="zh", cfg=EngineConfig(ner_backend="stub")
        )
        # the stub regexes overlap the YAML rules: the composite resolve
        # keeps one entity per span either way
        assert [(e["start"], e["end"]) for e in wired["entities"]] == [
            (e["start"], e["end"]) for e in plain["entities"]
        ]
        assert wired["n_spans"] == plain["n_spans"]

    def test_matches_ner_detect_stage_composition(self, ray_session):
        import ray.data as rd

        from edge_deid_studio_ray.config import EngineConfig
        from edge_deid_studio_ray.kernels.docpipe import process_document
        from edge_deid_studio_ray.stages.ner import NerDetectStage

        text = "contact A123456789 maybe 0912-345-678 done"
        row = process_document(text=text, lang="zh", cfg=EngineConfig(ner_backend="stub"))
        out = (
            rd.from_arrow(pa.table({"text": [text], "lang": ["zh"]}))
            .map_batches(NerDetectStage, batch_format="pyarrow", batch_size=8, concurrency=1)
            .take_all()
        )
        stage_spans = [(e["start"], e["end"], e["type"]) for e in out[0]["entities"]]
        kernel_spans = [
            (e["start"], e["end"], e["type"]) for e in row["entities"]
        ]
        assert kernel_spans == stage_spans

    def test_registered_onnx_backend_in_flagship_kernel(self):
        import numpy as np

        from edge_deid_studio_ray.config import EngineConfig
        from edge_deid_studio_ray.kernels.docpipe import process_document
        from edge_deid_studio_ray.stages.ner import OnnxNerBackend, register_ner_backend

        class NumpySession:
            def __init__(self, W):
                self.W = W

            def get_inputs(self):
                from types import SimpleNamespace

                return [SimpleNamespace(name="input_ids")]

            def get_outputs(self):
                from types import SimpleNamespace

                return [SimpleNamespace(name="logits")]

            def run(self, names, feeds):
                return [np.eye(self.W.shape[0])[feeds["input_ids"]] @ self.W]

        W = np.zeros((16, 2))
        W[:, 0] = 8.0
        W[10] = [0.0, 8.0]  # "alice" → B-PER
        register_ner_backend(
            "onnx_test",
            lambda: OnnxNerBackend(
                session=NumpySession(W), vocab={"alice": 10}, id2label={0: "O", 1: "B-PER"}
            ),
        )
        row = process_document(
            text="met alice today", lang="en", cfg=EngineConfig(ner_backend="onnx_test")
        )
        got = [(e["start"], e["end"], e["type"], e["source"]) for e in row["entities"]]
        assert (4, 9, "NAME", "onnx") in got

    def test_unknown_backend_name_is_loud(self):
        import pytest as _pytest

        from edge_deid_studio_ray.stages.ner import get_ner_backend

        with _pytest.raises(ValueError, match="unknown NER backend"):
            get_ner_backend("typo")
