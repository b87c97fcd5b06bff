"""Inspector: scene/camera/GPU-state introspection and perf metrics.

Offline-report equivalent of the reference's ImGui/ImPlot Inspector overlay
(/root/reference/apps/gsrast/Inspector.cpp):
  * data-stats panel (counts + byte sizes, Inspector.cpp:95-115)
      -> scene_report()
  * camera inspect (118-140)            -> camera_report()
  * per-Gaussian GPU-state peek: 9 cudaMemcpys of one GeometryState row
    (167-211)                           -> peek_gaussian() (one device gather)
  * FPS plot + dt table (142-165)       -> FrameStats rolling window
  * screenshots (222-267)               -> utils/image.py
  * pose table (306-358)                -> utils/posedb.py
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..camera import Camera
from ..ops.preprocess import preprocess
from ..scene.gaussians import GaussianScene


def scene_report(scene: GaussianScene) -> Dict:
    """Counts and byte sizes per array (the 'Loaded data' stats panel)."""
    def size(x):
        return int(np.prod(x.shape)) * x.dtype.itemsize

    mn, mx = scene.bbox()
    return {
        "num_active": int(scene.num_active()),
        "capacity": int(scene.capacity),
        "sh_degree": scene.sh_degree,
        "bytes": {
            "means": size(scene.means),
            "log_scales": size(scene.log_scales),
            "quats": size(scene.quats),
            "opacity_logits": size(scene.opacity_logits),
            "sh": size(scene.sh),
            "total": sum(
                size(getattr(scene, f))
                for f in ["means", "log_scales", "quats", "opacity_logits", "sh"]
            ),
        },
        "bbox_min": np.asarray(mn).tolist(),
        "bbox_max": np.asarray(mx).tolist(),
        "center": np.asarray(scene.center()).tolist(),
    }


def camera_report(camera: Camera) -> Dict:
    return {
        "position": np.asarray(camera.position).tolist(),
        "front": np.asarray(camera.front).tolist(),
        "fov_deg": [
            float(jnp.rad2deg(camera.fov_x)),
            float(jnp.rad2deg(camera.fov_y)),
        ],
        "near_far": [float(camera.znear), float(camera.zfar)],
        "width": camera.width,
        "height": camera.height,
    }


def peek_gaussian(
    scene: GaussianScene,
    camera: Camera,
    index: int,
    render_cfg: cfg.RenderConfig = cfg.RenderConfig(),
) -> Dict:
    """Per-Gaussian screen-space state for one index — the analog of the
    Inspector's CUDA panel pulling one GeometryState row to host
    (Inspector.cpp:180-188): tiles touched, depth, radius, mean2d, conic,
    color, opacity."""
    prep = preprocess(scene.activated(), camera, render_cfg)
    row = jax.tree.map(lambda x: np.asarray(x[index]), prep)
    return {
        "index": index,
        "raw": {
            "mean": np.asarray(scene.means[index]).tolist(),
            "scale": np.asarray(jnp.exp(scene.log_scales[index])).tolist(),
            "opacity": float(jax.nn.sigmoid(scene.opacity_logits[index])),
        },
        "depth": float(row.depth),
        "mean2d": row.mean2d.tolist(),
        "conic": row.conic.tolist(),
        "color": row.color.tolist(),
        "radius": int(row.radius),
        "tiles_touched": int(row.tiles_touched),
        "rect": [int(row.rect.x_min), int(row.rect.y_min),
                 int(row.rect.x_max), int(row.rect.y_max)],
    }


def goto_gaussian(scene: GaussianScene, camera: Camera, index: int,
                  distance: float = 1.0) -> Camera:
    """Teleport the camera to look at gaussian `index` (the CUDA panel's
    "Goto" button, Inspector.cpp:196-209)."""
    from ..camera import look_at

    target = scene.means[index]
    eye = target - jnp.asarray([0.0, 0.0, distance])
    return camera.replace(view=look_at(eye, target))


class FrameStats:
    """Rolling frame-time window (the Performances panel: 10-s scrolling FPS
    plot + dt table, Inspector.cpp:142-165, FrameData SoA Inspector.hpp:15-19)."""

    def __init__(self, window_seconds: float = 10.0):
        self.window = window_seconds
        self._frames = deque()  # (timestamp, dt_seconds, pixels)

    def record(self, dt_seconds: float, pixels: int = 0) -> None:
        now = time.monotonic()
        self._frames.append((now, dt_seconds, pixels))
        while self._frames and now - self._frames[0][0] > self.window:
            self._frames.popleft()

    def clear(self) -> None:
        self._frames.clear()

    def report(self) -> Dict:
        if not self._frames:
            return {"frames": 0, "fps": 0.0, "mean_dt_ms": 0.0,
                    "mpixels_per_s": 0.0}
        dts = np.array([f[1] for f in self._frames])
        pixels = np.array([f[2] for f in self._frames])
        return {
            "frames": len(dts),
            "fps": float(1.0 / max(dts.mean(), 1e-9)),
            "mean_dt_ms": float(dts.mean() * 1e3),
            "p50_dt_ms": float(np.percentile(dts, 50) * 1e3),
            "p99_dt_ms": float(np.percentile(dts, 99) * 1e3),
            "mpixels_per_s": float(pixels.sum() / max(dts.sum(), 1e-9) / 1e6),
        }
