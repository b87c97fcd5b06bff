"""COLMAP ingestion: binary readers/writers, camera-convention parity, and
the e2e `train --data <colmap_dir>` loop on the format real GS datasets ship
in (BASELINE config 4; reference anchor SplatData.cpp:114-156 consumes
scenes trained FROM this format)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gsrast_tpu import cli
from gsrast_tpu.camera import Camera, look_at
from gsrast_tpu.render.api import render
from gsrast_tpu.scene import colmap
from gsrast_tpu.scene.gaussians import random_scene
from gsrast_tpu.utils.image import save_png
from gsrast_tpu import config as cfg


def _orbit_pose(theta, radius=2.5):
    eye = np.array([radius * np.sin(theta), 0.3, -radius * np.cos(theta)])
    view = np.asarray(look_at(jnp.asarray(eye), jnp.zeros(3)))
    rot = view[:3, :3]
    t = view[:3, 3]
    # view -> COLMAP qvec (w, x, y, z) of R
    w = np.sqrt(max(0.0, 1 + rot[0, 0] + rot[1, 1] + rot[2, 2])) / 2
    if w > 1e-6:
        q = np.array([
            w,
            (rot[2, 1] - rot[1, 2]) / (4 * w),
            (rot[0, 2] - rot[2, 0]) / (4 * w),
            (rot[1, 0] - rot[0, 1]) / (4 * w),
        ])
    else:  # fall back through the generic branch (not hit by these poses)
        q = np.array([1.0, 0.0, 0.0, 0.0])
    return q, t, view


def _make_fixture(tmp_path, n_views=3, wh=(96, 64)):
    """Synthetic COLMAP scene: render a tiny random scene from an orbit and
    write sparse/0 + images/."""
    w, h = wh
    scene = random_scene(jax.random.PRNGKey(7), 400, sh_degree=1)
    fx = fy = 80.0
    cam_model = colmap.ColmapCamera("PINHOLE", w, h, fx, fy, w / 2, h / 2)
    rcfg = cfg.RenderConfig(backend="xla")
    images, views = [], []
    import os

    img_dir = tmp_path / "images"
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n_views):
        q, t, view = _orbit_pose(0.5 * i)
        cam = Camera(
            view=jnp.asarray(view),
            fov_x=jnp.float32(2 * np.arctan(w / (2 * fx))),
            fov_y=jnp.float32(2 * np.arctan(h / (2 * fy))),
            width=w, height=h,
        )
        img = render(scene.activated(), cam, rcfg).image
        save_png(img, str(img_dir / f"v{i:02d}.png"))
        images.append(colmap.ColmapImage(f"v{i:02d}.png", q, t, 1))
        views.append(view)
    pts = np.asarray(scene.means)[:200]
    rgb = np.full((200, 3), 0.6, np.float32)
    colmap.write_colmap_bin(str(tmp_path), {1: cam_model}, images,
                            xyz=pts, rgb=rgb)
    return scene, views


class TestColmapReaders:
    def test_roundtrip(self, tmp_path):
        scene, views = _make_fixture(tmp_path)
        sp = str(tmp_path / "sparse" / "0")
        cams = colmap.read_cameras_bin(sp + "/cameras.bin")
        assert cams[1].model == "PINHOLE"
        assert (cams[1].width, cams[1].height) == (96, 64)
        ims = colmap.read_images_bin(sp + "/images.bin")
        assert len(ims) == 3
        assert ims[0].name == "v00.png"
        xyz, rgb = colmap.read_points3d_bin(sp + "/points3D.bin")
        np.testing.assert_allclose(xyz, np.asarray(scene.means)[:200],
                                   atol=1e-6)
        assert rgb.shape == (200, 3)
        assert np.all((rgb >= 0) & (rgb <= 1))

    def test_camera_convention_matches(self, tmp_path):
        """A COLMAP-loaded camera reproduces the original render: the qvec ->
        view reconstruction and FOV math agree with camera.look_at."""
        scene, views = _make_fixture(tmp_path, n_views=2)
        ds, xyz, rgb = colmap.load_colmap(str(tmp_path))
        assert ds.num_frames == 2
        rcfg = cfg.RenderConfig(backend="xla")
        for i in range(2):
            got = render(scene.activated(), ds.cameras[i], rcfg).image
            # ds.images[i] is the PNG of the original render (8-bit).
            np.testing.assert_allclose(
                np.asarray(got), ds.images[i], atol=2.5 / 255,
                err_msg=f"view {i} mismatch: camera convention broken")

    def test_init_scene_from_points(self, tmp_path):
        xyz = np.random.default_rng(0).normal(size=(300, 3)).astype(np.float32)
        rgb = np.random.default_rng(1).uniform(size=(300, 3)).astype(np.float32)
        scene = colmap.init_scene_from_points(xyz, rgb, capacity=512)
        assert scene.capacity == 512
        assert int(np.asarray(scene.mask).sum()) == 300
        act = scene.activated()
        # alpha init 0.1; scales positive and data-scaled.
        np.testing.assert_allclose(
            np.asarray(act.opacities)[:300], 0.1, atol=1e-5)
        s = np.asarray(act.scales)[:300]
        assert np.all(s > 0)
        # SH DC inverts to the point color through the renderer's SH eval.
        from gsrast_tpu.ops.sh import SH_C0

        np.testing.assert_allclose(
            np.asarray(scene.sh)[:300, 0, :] * SH_C0 + 0.5, rgb, atol=1e-5)

    def test_downscale(self, tmp_path):
        _make_fixture(tmp_path, n_views=1)
        ds, _, _ = colmap.load_colmap(str(tmp_path), downscale=2)
        assert ds.images.shape[1:3] == (32, 48)
        assert ds.cameras[0].width == 48
        # FOV is preserved under downscale (fx and W halve together).
        ds1, _, _ = colmap.load_colmap(str(tmp_path))
        np.testing.assert_allclose(float(ds.cameras[0].fov_x),
                                   float(ds1.cameras[0].fov_x), rtol=1e-6)


class TestColmapTrainE2E:
    @pytest.mark.slow
    def test_train_on_colmap_dir(self, tmp_path, capsys):
        """Full `train --data <colmap_dir> --scene colmap`: SfM-point init +
        COLMAP cameras + photographs, a few steps, loss finite."""
        _make_fixture(tmp_path, n_views=2, wh=(64, 64))
        cli.cmd_train([
            "--scene", "colmap", "--data", str(tmp_path),
            "--steps", "3", "--backend", "xla",
            "--ckpt-dir", str(tmp_path / "ck"), "--ckpt-every", "1000",
        ])
        out = capsys.readouterr().out
        assert "initialized 200 gaussians from COLMAP SfM points" in out
        assert "loss=" in out and "nan" not in out
