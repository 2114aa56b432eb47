"""Image read/write.

``write_image`` is the RenderTarget2D.SaveAsPng analog (Game1.cs:156-161);
``read_image`` replaces RayTracerTexture's GDI+ bitmap load
(RayTracerTexture.cs:24-33) returning (H, W, 3) uint8 top-down rows, the
layout Material.LookupUV indexes.
"""

from __future__ import annotations

import numpy as np


def write_image(path: str, image) -> None:
    """Write (H, W, 3) float [0,1] or uint8 image to PNG/BMP/JPEG by suffix."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def read_image(path: str) -> np.ndarray:
    """Read an image file to (H, W, 3) uint8."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))
