"""Multimodal (image/audio/video) actor-pool stages.

Opaque ``binary`` payload columns + typed metadata, processed by actor-pool
``map_batches`` stages — the Ray-side plumbing (schemas, batch sizing, actor
signature, output layout) is real and tested; the actual codec calls are
STUBBED because image/audio libraries are not installed in this environment:

- with a real backend (``cv2``/``PIL``/soundfile), the ``_decode`` hook is
  the only thing to replace (import-gated attempt happens in ``__init__``,
  once per actor — the reference loads its OCR engine the same way,
  parser/ocr.py:25-201);
- without one, ``DeterministicFakeCodec`` derives stable pseudo-features
  from the payload bytes so pipelines stay testable end-to-end.

Mirrors the reference's image path (handlers/image.py:14-43 OCR extract,
image_deid/processor.py:22-62) at the orchestration level: decode →
feature/region extraction → per-row outputs with bbox-shaped metadata.

Scale note: binary rows are large — callers should use small ``batch_size``
(16–64) and let block splitting keep blocks under target_max_block_size.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa

IMAGE_FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("feature", pa.list_(pa.float32())),
        ("decode_backend", pa.string()),
    ]
)


class DeterministicFakeCodec:
    """Payload-hash-seeded stand-in for a real image/audio decoder."""

    name = "fake"

    def decode_image(self, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
        h, w = 8 + digest[4] % 56, 8 + digest[5] % 56
        return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)

    def decode_audio(self, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
        return rng.standard_normal(1600).astype(np.float32)


def _real_image_codec():
    try:  # pragma: no cover - cv2/PIL not installed in this environment
        import cv2  # type: ignore

        class Cv2Codec:
            name = "cv2"

            def decode_image(self, payload: bytes) -> np.ndarray:
                arr = np.frombuffer(payload, dtype=np.uint8)
                img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
                if img is None:
                    raise ValueError("undecodable image payload")
                return img

        return Cv2Codec()
    except ImportError:
        return None


class ImageFeatureStage:
    """Actor-pool stage: decode → resize-normalize → mean-pool features.

    Input rows: (media_id: string, payload: binary).  Output:
    IMAGE_FEATURE_SCHEMA.  Pass via ``map_batches(ImageFeatureStage,
    batch_size=32, concurrency=N, num_cpus=1)``.
    """

    def __init__(self, target: int = 16):
        self.codec = _real_image_codec() or DeterministicFakeCodec()  # once per actor
        self.target = target

    def _resize_mean_pool(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        ys = np.linspace(0, h - 1, self.target).astype(int)
        xs = np.linspace(0, w - 1, self.target).astype(int)
        resized = img[np.ix_(ys, xs)].astype(np.float32) / 255.0
        return resized.mean(axis=2).reshape(-1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in IMAGE_FEATURE_SCHEMA.names}
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            img = self.codec.decode_image(payload or b"")
            out["media_id"].append(media_id)
            out["height"].append(img.shape[0])
            out["width"].append(img.shape[1])
            out["channels"].append(img.shape[2])
            out["feature"].append([float(x) for x in self._resize_mean_pool(img)])
            out["decode_backend"].append(self.codec.name)
        return pa.Table.from_pydict(out, schema=IMAGE_FEATURE_SCHEMA)


class AudioFrameStage:
    """Actor-pool stage: decode audio → fixed-hop frame energies.

    Input rows: (media_id, payload).  Output adds ``n_frames`` and
    ``frame_energy: list<float32>``.
    """

    def __init__(self, hop: int = 160):
        self.codec = DeterministicFakeCodec()  # real decoder import-gated as above
        self.hop = hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        energies: list[list[float]] = []
        n_frames: list[int] = []
        for payload in batch["payload"].to_pylist():
            wave = self.codec.decode_audio(payload or b"")
            frames = wave[: len(wave) - len(wave) % self.hop].reshape(-1, self.hop)
            energy = (frames**2).mean(axis=1)
            energies.append([float(x) for x in energy])
            n_frames.append(len(energy))
        return batch.append_column(
            "n_frames", pa.array(n_frames, pa.int32())
        ).append_column("frame_energy", pa.array(energies, pa.list_(pa.float32())))


def video_frame_sample_stub(*_args: Any, **_kwargs: Any):
    """Video frame sampling requires a real codec (not installed)."""
    raise NotImplementedError(
        "video decode requires pyav/ffmpeg; plumbing pattern is ImageFeatureStage"
    )
