from .deid import DEID_OUTPUT_SCHEMA, make_deid_batch_fn, add_pid
from .ner import NerDetectStage, StubNerBackend, decode_bio_spans, detect_with_windows
from .image_deid import ImageDeidStage, attach_offset_bboxes
from .multimodal import ImageFeatureStage, AudioFrameStage
from .quality import quality_report, eval_aggregate

__all__ = [
    "DEID_OUTPUT_SCHEMA", "make_deid_batch_fn", "add_pid",
    "NerDetectStage", "StubNerBackend", "decode_bio_spans", "detect_with_windows",
    "ImageDeidStage", "attach_offset_bboxes",
    "ImageFeatureStage", "AudioFrameStage",
    "quality_report", "eval_aggregate",
]
