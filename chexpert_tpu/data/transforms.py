"""Host-side image transforms (numpy/PIL).

Mirrors the reference transform stack (/root/reference/chexpert.py:67-72):
optional Resize(min-edge), CenterCrop(320 or resize), /255 to [0,1],
Normalize(mean 0.5330, std 0.0349), expand 1->3 channels. Plus the
data-augmentation stack used by the 'data_aug' runs (random flip + crop).

All transforms are NHWC; images stay single-channel until the final
channel-expand so decode/crop bandwidth is 1/3 of the naive path.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image

from chexpert_tpu.data.chexpert import PIXEL_MEAN, PIXEL_STD


def load_grayscale(path: str, min_edge_hint: int = 0) -> Image.Image:
    """Decode to 8-bit grayscale.

    Uses the native libjpeg path (chexpert_tpu.native) when built — identical
    bytes to PIL for unscaled decode (both are libjpeg), and with
    min_edge_hint > 0 it may decode at 1/2-1/8 scale in the DCT domain
    (never below the hint) which skips most IDCT work on large sources.
    Set CHEXPERT_TPU_NO_NATIVE=1 to force the PIL path.
    """
    if path.lower().endswith((".jpg", ".jpeg")) and not os.environ.get(
        "CHEXPERT_TPU_NO_NATIVE"
    ):
        try:
            from chexpert_tpu import native

            arr = native.decode_gray(path, min_edge_hint)
            if arr is not None:
                return Image.fromarray(arr, mode="L")
        except ValueError:
            pass  # corrupt-for-libjpeg-mem-src edge case: fall back to PIL
    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return img


def resize_min_edge(img: Image.Image, size: int) -> Image.Image:
    """torchvision T.Resize semantics: min edge -> size, keep aspect."""
    w, h = img.size
    if w <= h:
        return img.resize((size, max(1, round(h * size / w))), Image.BILINEAR)
    return img.resize((max(1, round(w * size / h)), size), Image.BILINEAR)


def center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    """torchvision T.CenterCrop semantics incl. zero-pad when smaller."""
    h, w = arr.shape[:2]
    if h < size or w < size:
        ph, pw = max(0, size - h), max(0, size - w)
        arr = np.pad(
            arr,
            ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)) + ((0, 0),) * (arr.ndim - 2),
        )
        h, w = arr.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return arr[top : top + size, left : left + size]


def random_crop(arr: np.ndarray, size: int, rng: np.random.RandomState) -> np.ndarray:
    h, w = arr.shape[:2]
    if h < size or w < size:
        return center_crop(arr, size)
    top = rng.randint(0, h - size + 1)
    left = rng.randint(0, w - size + 1)
    return arr[top : top + size, left : left + size]


def decode_transform(
    path: str,
    image_size: int = 320,
    resize: Optional[int] = None,
    augment: bool = False,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Decode one image to (H, W, 1) float32, normalized.

    Matches the reference order exactly: resize -> crop -> /255 -> whiten.
    With augment=True the crop is random and a horizontal flip is applied.
    """
    crop = resize if resize else image_size
    # DCT-scaled decode only valid when a resize follows (crop-only mode
    # must see the original resolution — reference chexpert.py:68-69)
    img = load_grayscale(path, min_edge_hint=resize or 0)
    if resize:
        img = resize_min_edge(img, resize)
    arr = np.asarray(img, dtype=np.float32)[..., None]
    if augment:
        assert rng is not None
        arr = random_crop(arr, crop, rng)
        if rng.rand() < 0.5:
            arr = arr[:, ::-1]
    else:
        arr = center_crop(arr, crop)
    arr = arr / 255.0
    arr = (arr - PIXEL_MEAN) / PIXEL_STD
    return np.ascontiguousarray(arr)


def expand_channels(batch: np.ndarray) -> np.ndarray:
    """(B, H, W, 1) -> (B, H, W, 3) (reference chexpert.py:72)."""
    return np.broadcast_to(batch, batch.shape[:-1] + (3,)).copy()


def denormalize(img: np.ndarray) -> np.ndarray:
    """Invert whitening for visualization (reference chexpert.py:320)."""
    return img * PIXEL_STD + PIXEL_MEAN
