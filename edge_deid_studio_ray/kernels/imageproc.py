"""OCR image-preprocessing kernels (pure numpy).

Reproduces the reference's preprocessing chain
(/root/reference/src/deid_pipeline/parser/ocr.py:79-93) without OpenCV, so
the day a real OCR backend is wired the extraction sees the same pixels the
reference feeds EasyOCR/tesseract:

    gray = cv2.cvtColor(img, COLOR_BGR2GRAY)            → :func:`bgr_to_gray`
    proc = cv2.adaptiveThreshold(gray, 255,
        ADAPTIVE_THRESH_GAUSSIAN_C, THRESH_BINARY, 11, 2)
                                                        → :func:`adaptive_threshold_gaussian`
    out  = cv2.medianBlur(proc, 3)                      → :func:`median_blur3`

Semantics follow the documented OpenCV algorithms (public):

- BGR→gray uses the ITU-R BT.601 weights in OpenCV's fixed-point form
  ``(R·4899 + G·9617 + B·1868 + 8192) >> 14``;
- adaptive Gaussian threshold compares each pixel against the Gaussian-
  weighted neighborhood mean minus ``C`` (strictly greater → max_value),
  kernel σ from OpenCV's ksize formula ``0.3·((ksize−1)·0.5 − 1) + 0.8``,
  replicate border, mean rounded to uint8 before the comparison;
- 3×3 median blur with replicate border.

These are *per-image* kernels: inside the OCR actor pool they run on the
decoded array right before ``backend.read`` (stages/image_deid.py), one
image per call — batch-level parallelism comes from the actor pool, not
from intra-image vectorization tricks.
"""

from __future__ import annotations

import numpy as np


def bgr_to_gray(img: np.ndarray) -> np.ndarray:
    """BGR (H, W, 3) uint8 → gray (H, W) uint8, OpenCV fixed-point BT.601."""
    if img.ndim == 2:
        return img.astype(np.uint8, copy=False)
    b = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    r = img[..., 2].astype(np.int64)
    return ((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14).astype(np.uint8)


def gaussian_kernel1d(ksize: int, sigma: float | None = None) -> np.ndarray:
    """Normalized 1-D Gaussian kernel, OpenCV's default-σ formula when
    ``sigma`` is None/non-positive."""
    if sigma is None or sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    kernel = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    return kernel / kernel.sum()


def _replicate_pad(img: np.ndarray, pad: int) -> np.ndarray:
    return np.pad(img, pad, mode="edge")


def _sep_convolve(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Separable 2-D convolution with replicate border (float64)."""
    pad = len(kernel) // 2
    padded = _replicate_pad(img.astype(np.float64), pad)
    # horizontal pass
    h = np.zeros((padded.shape[0], img.shape[1]), dtype=np.float64)
    for k, w in enumerate(kernel):
        h += w * padded[:, k : k + img.shape[1]]
    # vertical pass
    out = np.zeros(img.shape, dtype=np.float64)
    for k, w in enumerate(kernel):
        out += w * h[k : k + img.shape[0], :]
    return out


def adaptive_threshold_gaussian(
    gray: np.ndarray, max_value: int = 255, block_size: int = 11, c: float = 2.0
) -> np.ndarray:
    """``cv2.adaptiveThreshold(..., ADAPTIVE_THRESH_GAUSSIAN_C,
    THRESH_BINARY, block_size, c)`` semantics: pixel → max_value iff
    ``src > round(gaussian_mean) - ceil(c)``, else 0."""
    kernel = gaussian_kernel1d(block_size)
    mean = np.rint(_sep_convolve(gray, kernel)).astype(np.int64)
    threshold = mean - int(np.ceil(c))
    return np.where(gray.astype(np.int64) > threshold, max_value, 0).astype(np.uint8)


def median_blur3(img: np.ndarray) -> np.ndarray:
    """3×3 median filter with replicate border (``cv2.medianBlur(img, 3)``)."""
    padded = _replicate_pad(img, 1)
    h, w = img.shape
    stack = np.stack(
        [padded[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)], axis=0
    )
    return np.median(stack, axis=0).astype(img.dtype)


def ocr_preprocess(img: np.ndarray) -> np.ndarray:
    """The full reference chain (ocr.py:79-93): gray → adaptive Gaussian
    threshold (11, 2) → 3×3 median blur."""
    gray = bgr_to_gray(img)
    binary = adaptive_threshold_gaussian(gray, 255, 11, 2.0)
    return median_blur3(binary)
