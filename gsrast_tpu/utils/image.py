"""Image save/load — the screenshot path.

Replaces the reference's glGetTexImage + stb PNG screenshot flow
(/root/reference/apps/gsrast/Inspector.cpp:222-267): rendered arrays go
straight to timestamped PNGs. The flip-Y the reference needs (GL origin) does
not apply — our images are already row-0-top.
"""

from __future__ import annotations

import datetime
import os
from typing import Optional

import numpy as np


def to_uint8(img) -> np.ndarray:
    arr = np.asarray(img)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(img, path: str) -> str:
    from PIL import Image

    arr = to_uint8(img)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr).save(path)
    return path


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB")).astype(np.float32) / 255.0


def screenshot(img, directory: str = ".", prefix: str = "screenshot") -> str:
    """Timestamped capture, like the Inspector's screenshot button
    (Inspector.cpp:236-248 formats a time-based filename)."""
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    return save_png(img, os.path.join(directory, f"{prefix}_{stamp}.png"))
