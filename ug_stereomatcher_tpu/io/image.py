"""Image loading/saving (PIL-backed with raw NPY/PPM fallbacks)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:
    from PIL import Image as _PILImage
    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def load_image(path: str) -> np.ndarray:
    """Load an RGB image as (H, W, 3) uint8 (.npy files load verbatim)."""
    if path.endswith(".npy"):
        return np.load(path)
    if not _HAVE_PIL:  # pragma: no cover
        raise RuntimeError("PIL unavailable; use .npy inputs")
    with _PILImage.open(path) as im:
        return np.asarray(im.convert("RGB"))


def save_image(path: str, image: np.ndarray) -> None:
    """Save an (H, W, 3) uint8 or (H, W) image."""
    if path.endswith(".npy"):
        np.save(path, image)
        return
    if not _HAVE_PIL:  # pragma: no cover
        raise RuntimeError("PIL unavailable; use .npy outputs")
    _PILImage.fromarray(np.asarray(image)).save(path)


def save_float_tiff(path: str, data: np.ndarray) -> None:
    """Save a float32 single-plane TIFF — the viz nodes' dump format
    (UG_dispImgTest.cpp:106-108 writes _H.tif/_V.tif/_C.tif)."""
    if path.endswith(".npy"):
        np.save(path, np.asarray(data, dtype=np.float32))
        return
    if not _HAVE_PIL:  # pragma: no cover
        raise RuntimeError("PIL unavailable; use .npy outputs")
    _PILImage.fromarray(np.asarray(data, dtype=np.float32), mode="F").save(path)
