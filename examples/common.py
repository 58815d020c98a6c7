"""Shared helpers for the examples: tiny image writer (no cv2/PIL needed)."""

from __future__ import annotations

import numpy as np


def save_ppm(path: str, img) -> None:
    """Save an [C, H, W] or [H, W, C] float image in [0, 1] as binary PPM."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3):
        img = np.moveaxis(img, 0, -1)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    data = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    h, w = data.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(data.tobytes())
    print(f"wrote {path} ({w}x{h})")
