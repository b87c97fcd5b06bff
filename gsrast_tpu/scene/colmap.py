"""COLMAP dataset importer: cameras.bin / images.bin / points3D.bin.

Every real Gaussian-splatting dataset (MipNeRF-360, Tanks&Temples — BASELINE
configs 3/4) ships as a COLMAP sparse reconstruction plus an image directory;
the reference consumes scenes *trained from* such data (SplatData.cpp:114-156
loads the resulting .ply). This module reads the COLMAP binary format
directly so the training loop (train/trainer.py) runs on the format real
scenes ship in:

  scene_dir/
    sparse/0/cameras.bin   intrinsics  (camera_id -> model, W, H, params)
    sparse/0/images.bin    extrinsics  (qvec, tvec, camera_id, file name)
    sparse/0/points3D.bin  SfM points  (xyz, rgb) — the scene initializer
    images/                the photographs

Binary layout per COLMAP's src/colmap/scene/reconstruction_io.cc (stable
public format): little-endian; counts are uint64; qvec is (w, x, y, z); the
world->camera transform is X_cam = R(qvec) @ X_world + tvec, with COLMAP's
camera axes (x right, y down, z forward) matching this framework's Camera
convention exactly (camera.py:40), so the view matrix is [[R, t], [0, 1]]
with no flip (the reference needed a GL Z-flip bridge, GSGaussians.cpp:160-169;
we do not).
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, NamedTuple, Tuple

import numpy as np

# model_id -> (name, num_params). Focal/principal parameter ordering per
# COLMAP's camera_models.h. Distortion parameters beyond the pinhole set are
# accepted but ignored (the rasterizer's camera is an ideal pinhole; real GS
# pipelines undistort first).
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),   # f, cx, cy
    1: ("PINHOLE", 4),          # fx, fy, cx, cy
    2: ("SIMPLE_RADIAL", 4),    # f, cx, cy, k
    3: ("RADIAL", 5),           # f, cx, cy, k1, k2
    4: ("OPENCV", 8),           # fx, fy, cx, cy, k1, k2, p1, p2
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


class ColmapCamera(NamedTuple):
    model: str
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float


class ColmapImage(NamedTuple):
    name: str
    qvec: np.ndarray  # (4,) w, x, y, z
    tvec: np.ndarray  # (3,)
    camera_id: int


def _read(f, fmt: str):
    size = struct.calcsize(fmt)
    return struct.unpack("<" + fmt, f.read(size))


def read_cameras_bin(path: str) -> Dict[int, ColmapCamera]:
    out = {}
    with open(path, "rb") as f:
        (num,) = _read(f, "Q")
        for _ in range(num):
            cam_id, model_id = _read(f, "ii")
            width, height = _read(f, "QQ")
            name, nparams = CAMERA_MODELS[model_id]
            params = _read(f, "d" * nparams)
            if name == "PINHOLE" or name.startswith("OPENCV") or \
                    name == "FULL_OPENCV" or name == "THIN_PRISM_FISHEYE":
                fx, fy, cx, cy = params[0], params[1], params[2], params[3]
            else:  # single-focal models
                fx = fy = params[0]
                cx, cy = params[1], params[2]
            out[cam_id] = ColmapCamera(
                name, int(width), int(height), fx, fy, cx, cy)
    return out


def read_images_bin(path: str) -> List[ColmapImage]:
    out = []
    with open(path, "rb") as f:
        (num,) = _read(f, "Q")
        for _ in range(num):
            (_image_id,) = _read(f, "i")
            qvec = np.array(_read(f, "dddd"))
            tvec = np.array(_read(f, "ddd"))
            (camera_id,) = _read(f, "i")
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00" or c == b"":
                    break
                name += c
            (npts,) = _read(f, "Q")
            f.seek(npts * 24, os.SEEK_CUR)  # (x, y double) + point3D_id int64
            out.append(ColmapImage(name.decode("utf-8"), qvec, tvec,
                                   camera_id))
    out.sort(key=lambda im: im.name)
    return out


def read_points3d_bin(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (xyz (N, 3) f32, rgb (N, 3) f32 in [0, 1])."""
    xyz, rgb = [], []
    with open(path, "rb") as f:
        (num,) = _read(f, "Q")
        for _ in range(num):
            (_pid,) = _read(f, "Q")
            xyz.append(_read(f, "ddd"))
            rgb.append(_read(f, "BBB"))
            _read(f, "d")  # reprojection error
            (track_len,) = _read(f, "Q")
            f.seek(track_len * 8, os.SEEK_CUR)  # (image_id, point2D_idx) i32
    xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
    rgb = np.asarray(rgb, np.float32).reshape(-1, 3) / 255.0
    return xyz, rgb


def qvec_to_rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def is_colmap_dir(scene_dir: str) -> bool:
    try:
        _sparse_dir(scene_dir)
        return True
    except FileNotFoundError:
        return False


def _sparse_dir(scene_dir: str) -> str:
    for cand in ("sparse/0", "sparse", "."):
        p = os.path.join(scene_dir, cand)
        if os.path.exists(os.path.join(p, "cameras.bin")):
            return p
    raise FileNotFoundError(
        f"no cameras.bin under {scene_dir}/sparse[/0] — not a COLMAP scene")


def load_colmap(scene_dir: str, images_subdir: str = "images",
                downscale: int = 1):
    """Read a COLMAP scene directory into this framework's Dataset (the same
    structure `train --data` consumes) plus the SfM point cloud.

    Returns (Dataset, xyz (N,3), rgb (N,3)); xyz/rgb are None when
    points3D.bin is absent. `downscale` integer-downsamples the images (and
    intrinsics) — real captures are 4-8K, far beyond a useful training
    resolution."""
    import jax.numpy as jnp

    from ..camera import Camera
    from ..utils.image import load_png
    from .dataset import Dataset

    sp = _sparse_dir(scene_dir)
    cams = read_cameras_bin(os.path.join(sp, "cameras.bin"))
    images = read_images_bin(os.path.join(sp, "images.bin"))
    pts_path = os.path.join(sp, "points3D.bin")
    xyz = rgbp = None
    if os.path.exists(pts_path):
        xyz, rgbp = read_points3d_bin(pts_path)

    img_dir = os.path.join(scene_dir, images_subdir)
    cameras, frames = [], []
    for im in images:
        ic = cams[im.camera_id]
        w = ic.width // downscale
        h = ic.height // downscale
        fx = ic.fx / downscale
        fy = ic.fy / downscale
        rot = qvec_to_rotmat(im.qvec)
        view = np.eye(4, dtype=np.float32)
        view[:3, :3] = rot
        view[:3, 3] = im.tvec
        cameras.append(Camera(
            view=jnp.asarray(view),
            fov_x=jnp.float32(2.0 * np.arctan(w / (2.0 * fx))),
            fov_y=jnp.float32(2.0 * np.arctan(h / (2.0 * fy))),
            width=w, height=h,
        ))
        img = load_png(os.path.join(img_dir, im.name))
        if downscale > 1:
            img = img[: h * downscale, : w * downscale]
            img = img.reshape(h, downscale, w, downscale, 3).mean((1, 3))
        frames.append(np.asarray(img, np.float32))
    ds = Dataset(cameras=cameras, images=np.stack(frames))
    return ds, xyz, rgbp


def init_scene_from_points(xyz: np.ndarray, rgb: np.ndarray,
                           capacity: int | None = None, sh_degree: int = 3):
    """The standard GS initialization from SfM points: one Gaussian per
    point, isotropic log-scale from the mean 3-NN distance (Kerbl et al.
    §5.1 / the Inria simple_knn init), opacity logit for alpha=0.1, SH DC
    from the point color."""
    import jax.numpy as jnp

    from ..ops.sh import SH_C0
    from .gaussians import GaussianScene, pad_to_capacity

    n = xyz.shape[0]
    # Mean 3-NN distance per point; exact pairwise against a random anchor
    # subset for big clouds (the init only needs the right order of
    # magnitude — training refines it immediately).
    n_anchor = min(n, 4096)
    if n_anchor < n:
        sel = np.random.default_rng(0).choice(n, n_anchor, replace=False)
        anchors = xyz[sel]
    else:
        anchors = xyz
    d2 = ((xyz[:, None, :] - anchors[None, :, :]) ** 2).sum(-1)
    d2 = np.where(d2 <= 1e-12, np.inf, d2)  # drop self-distance
    k = min(3, max(1, d2.shape[1] - 1))
    nn = np.sqrt(np.sort(d2, axis=1)[:, :k]).mean(axis=1)
    nn = np.clip(nn, 1e-4, None)

    ksh = (sh_degree + 1) ** 2
    sh = np.zeros((n, ksh, 3), np.float32)
    sh[:, 0, :] = (rgb - 0.5) / SH_C0
    scene = GaussianScene(
        means=jnp.asarray(xyz),
        log_scales=jnp.asarray(np.log(nn)[:, None].repeat(3, 1)),
        quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32), (n, 1)),
        opacity_logits=jnp.full((n,), float(np.log(0.1 / 0.9)), jnp.float32),
        sh=jnp.asarray(sh),
        mask=jnp.ones((n,), bool),
    )
    if capacity is not None and capacity > n:
        scene = pad_to_capacity(scene, capacity)
    return scene


def write_colmap_bin(scene_dir: str, cams: Dict[int, ColmapCamera],
                     images: List[ColmapImage],
                     xyz: np.ndarray | None = None,
                     rgb: np.ndarray | None = None) -> str:
    """Write a minimal COLMAP sparse/0 (the inverse of the readers above —
    used to build test fixtures and to export synthetic datasets in the
    format real tools consume)."""
    sp = os.path.join(scene_dir, "sparse", "0")
    os.makedirs(sp, exist_ok=True)
    with open(os.path.join(sp, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cid, c in cams.items():
            f.write(struct.pack("<ii", cid, 1))  # PINHOLE
            f.write(struct.pack("<QQ", c.width, c.height))
            f.write(struct.pack("<dddd", c.fx, c.fy, c.cx, c.cy))
    with open(os.path.join(sp, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for i, im in enumerate(images):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *im.qvec))
            f.write(struct.pack("<ddd", *im.tvec))
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode("utf-8") + b"\x00")
            f.write(struct.pack("<Q", 0))  # no 2D points
    if xyz is not None:
        with open(os.path.join(sp, "points3D.bin"), "wb") as f:
            f.write(struct.pack("<Q", xyz.shape[0]))
            rgb8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            for i in range(xyz.shape[0]):
                f.write(struct.pack("<Q", i + 1))
                f.write(struct.pack("<ddd", *xyz[i].astype(np.float64)))
                f.write(struct.pack("<BBB", *rgb8[i]))
                f.write(struct.pack("<d", 1.0))
                f.write(struct.pack("<Q", 0))  # empty track
    return sp
