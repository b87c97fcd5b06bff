"""Multi-view training dataset: cameras.json + PNG images in a directory.

The reference is a forward-only viewer with no data pipeline at all (SURVEY.md
§2.3 "no training"); BASELINE configs 3/4 require multi-view training. Format
(COLMAP-lite — the minimal set of fields the rasterizer's camera model needs,
gsrast_tpu/camera.py):

  data_dir/
    cameras.json   {"width": W, "height": H, "frames": [
                      {"file": "00000.png", "view": [16 floats row-major],
                       "fov_x": f, "fov_y": f}, ...]}
    00000.png ...  8-bit RGB targets

`view` is the world->camera matrix, the same convention the .ply scenes use
(camera.look_at; the reference's GL->GS Z-flip bridge is applied at load in
GSGaussians.cpp:160-169 — our matrices are already in GS convention).
"""

from __future__ import annotations

import json
import os
from typing import List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..camera import Camera
from ..utils.image import load_png, save_png


class Dataset(NamedTuple):
    cameras: List[Camera]
    images: np.ndarray        # (F, H, W, 3) float32 in [0, 1]

    @property
    def num_frames(self) -> int:
        return self.images.shape[0]

    def batch_cameras(self, idx) -> Camera:
        """Stack frames `idx` into one Camera pytree with a leading batch dim
        (for the DP-sharded train step)."""
        import jax

        cams = [self.cameras[i] for i in idx]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    def batch_images(self, idx) -> jnp.ndarray:
        return jnp.asarray(self.images[np.asarray(idx)])


def save_dataset(path: str, cameras: List[Camera], images) -> str:
    """Write a dataset directory. `images`: iterable of (H, W, 3) arrays."""
    os.makedirs(path, exist_ok=True)
    frames = []
    width = int(cameras[0].width)
    height = int(cameras[0].height)
    for i, (cam, img) in enumerate(zip(cameras, images)):
        name = f"{i:05d}.png"
        save_png(img, os.path.join(path, name))
        frames.append({
            "file": name,
            "view": np.asarray(cam.view, np.float64).reshape(-1).tolist(),
            "fov_x": float(cam.fov_x),
            "fov_y": float(cam.fov_y),
        })
    meta = {"width": width, "height": height, "frames": frames}
    with open(os.path.join(path, "cameras.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_dataset(path: str) -> Dataset:
    with open(os.path.join(path, "cameras.json")) as f:
        meta = json.load(f)
    width, height = int(meta["width"]), int(meta["height"])
    cameras, images = [], []
    for fr in meta["frames"]:
        view = jnp.asarray(
            np.asarray(fr["view"], np.float32).reshape(4, 4)
        )
        cameras.append(Camera(
            view=view,
            fov_x=jnp.float32(fr["fov_x"]),
            fov_y=jnp.float32(fr["fov_y"]),
            width=width,
            height=height,
        ))
        img = load_png(os.path.join(path, fr["file"]))
        if img.shape[:2] != (height, width):
            raise ValueError(
                f"{fr['file']}: image {img.shape[:2]} != cameras.json "
                f"({height}, {width})"
            )
        images.append(np.asarray(img, np.float32)[..., :3])
    if not cameras:
        raise ValueError(f"{path}: no frames in cameras.json")
    return Dataset(cameras=cameras, images=np.stack(images))


def orbit_cameras(
    center, radius: float, width: int, height: int, n: int,
    fov_x: float = 1.2, fov_y: float = 1.0, elevation: float = 0.35,
) -> List[Camera]:
    """N cameras on an orbit around `center` — the synthetic multi-view rig
    (also used to build training datasets from a known scene)."""
    from ..camera import look_at

    center = jnp.asarray(center, jnp.float32)
    cams = []
    for i in range(n):
        ang = 2.0 * np.pi * i / n
        eye = center + radius * jnp.asarray(
            [np.cos(ang) * np.cos(elevation),
             np.sin(elevation),
             np.sin(ang) * np.cos(elevation)], jnp.float32)
        cams.append(Camera(
            view=look_at(eye, center),
            fov_x=jnp.float32(fov_x), fov_y=jnp.float32(fov_y),
            width=width, height=height,
        ))
    return cams


def render_synthetic_dataset(
    scene, path: str, n_views: int = 16, width: int = 256, height: int = 256,
    render_cfg=None, radius_scale: float = 2.2,
) -> Tuple[str, List[Camera]]:
    """Render `scene` from an orbit rig and save as a dataset — the ground
    truth generator for multi-view training tests and demos."""
    import jax

    from .. import config as cfg
    from ..render.api import render

    render_cfg = render_cfg or cfg.RenderConfig()
    mn, mx = scene.bbox()
    center = (np.asarray(mn) + np.asarray(mx)) / 2.0
    radius = float(np.linalg.norm(np.asarray(mx) - np.asarray(mn)))
    radius = max(radius * radius_scale / 2.0, 1e-3)
    cams = orbit_cameras(center, radius, width, height, n_views)
    act = scene.activated()

    view_render = jax.jit(
        lambda v: render(act, cams[0].replace(view=v), render_cfg).image
    )
    images = [np.asarray(view_render(c.view)) for c in cams]
    save_dataset(path, cams, images)
    return path, cams
