"""End-to-end renderer tests: dense oracle vs tiled pipeline, autodiff
gradients, and reference-semantics checks (SURVEY.md §4 test pyramid, tiers
2-3; BASELINE config 1: 1k isotropic Gaussians at 256^2, SH0, on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrast_tpu import Camera, RenderConfig, random_scene, render
from gsrast_tpu.camera import look_at
from gsrast_tpu.render.dense import render_dense
from gsrast_tpu.render.tiled import render_tiled_xla


def make_camera(w=128, h=128):
    return Camera(
        view=look_at(jnp.array([0.0, 0.0, -4.0]), jnp.zeros(3)),
        fov_x=jnp.float32(1.0),
        fov_y=jnp.float32(1.0),
        width=w,
        height=h,
    )


def small_cfg(**kw):
    base = dict(
        tile_h=8,
        tile_w=16,
        max_per_tile=512,
        tile_chunk=8,
        intersect_capacity_factor=16.0,
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def scene_small():
    return random_scene(jax.random.PRNGKey(3), 200, sh_degree=0, isotropic=True,
                        scale_range=(0.02, 0.08))


class TestDenseOracle:
    def test_background_only(self):
        scene = random_scene(jax.random.PRNGKey(0), 4, sh_degree=0)
        # move everything behind the camera
        scene = scene.replace(means=scene.means + jnp.array([0.0, 0.0, -100.0]))
        cam = make_camera(32, 32)
        cfg = small_cfg(background=(0.2, 0.4, 0.6))
        out = render_dense(scene.activated(), cam, cfg)
        np.testing.assert_allclose(
            out.image, np.broadcast_to([0.2, 0.4, 0.6], (32, 32, 3)), atol=1e-6
        )
        np.testing.assert_allclose(out.final_t, 1.0, atol=1e-6)

    def test_single_gaussian_peak_alpha(self):
        """One opaque isotropic gaussian at center: peak pixel alpha ~= opacity."""
        scene = random_scene(jax.random.PRNGKey(0), 1, sh_degree=0)
        # scale 0.35 at depth 4 -> sigma ~ 15 px, so the <=0.5 px offset
        # between the projected center and the nearest pixel center changes
        # alpha by < 0.2% (at sigma ~ 1 px that offset alone costs ~10%).
        scene = scene.replace(
            means=jnp.array([[0.0, 0.0, 0.0]]),
            log_scales=jnp.log(jnp.full((1, 3), 0.35)),
            quats=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
            opacity_logits=jnp.array([2.0]),  # sigmoid -> 0.8808
        )
        cam = make_camera(64, 64)
        out = render_dense(scene.activated(), cam, small_cfg())
        opacity = float(jax.nn.sigmoid(2.0))
        peak = float(jnp.max(1.0 - out.final_t))
        assert abs(peak - opacity) < 0.02

    def test_front_to_back_ordering(self):
        """A red gaussian in front of a blue one: result dominated by red."""
        means = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]])
        sh = jnp.zeros((2, 1, 3))
        # DC color: red for near, blue for far (sh color = 0.5 + C0*dc)
        sh = sh.at[0, 0].set(jnp.array([1.8, -1.7, -1.7]))
        sh = sh.at[1, 0].set(jnp.array([-1.7, -1.7, 1.8]))
        scene = random_scene(jax.random.PRNGKey(0), 2, sh_degree=0)
        scene = scene.replace(
            means=means,
            log_scales=jnp.log(jnp.full((2, 3), 0.2)),
            quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 1)),
            opacity_logits=jnp.array([1.5, 1.5]),
            sh=sh,
        )
        out = render_dense(scene.activated(), make_camera(64, 64), small_cfg())
        center = out.image[32, 32]
        assert float(center[0]) > 2.0 * float(center[2])


class TestTiledMatchesDense:
    def test_images_close(self, scene_small):
        cam = make_camera(128, 128)
        cfg = small_cfg()
        dense = render_dense(scene_small.activated(), cam, cfg,
                             match_tiled_rects=True)
        tiled = render_tiled_xla(scene_small.activated(), cam, cfg)
        assert int(tiled.stats["overflow_capacity"]) == 0
        assert int(tiled.stats["overflow_tile_cap"]) == 0
        assert int(tiled.stats["overflow_per_tile"]) == 0
        np.testing.assert_allclose(tiled.image, dense.image, atol=2e-5)
        np.testing.assert_allclose(tiled.final_t, dense.final_t, atol=2e-5)

    def test_rect_culling_close_to_pure_dense(self, scene_small):
        """3-sigma rect culling loses only sub-alpha-threshold contributions."""
        cam = make_camera(128, 128)
        cfg = small_cfg()
        dense = render_dense(scene_small.activated(), cam, cfg,
                             match_tiled_rects=False)
        tiled = render_tiled_xla(scene_small.activated(), cam, cfg)
        np.testing.assert_allclose(tiled.image, dense.image, atol=5e-3)

    def test_anisotropic_sh3(self):
        scene = random_scene(jax.random.PRNGKey(9), 300, sh_degree=3,
                             isotropic=False, scale_range=(0.02, 0.1))
        cam = make_camera(128, 128)
        cfg = small_cfg(sh_degree=3)
        dense = render_dense(scene.activated(), cam, cfg, match_tiled_rects=True)
        tiled = render_tiled_xla(scene.activated(), cam, cfg)
        np.testing.assert_allclose(tiled.image, dense.image, atol=2e-5)

    def test_nonsquare_image_pads_and_crops(self, scene_small):
        cam = make_camera(100, 52)  # not tile-aligned
        cfg = small_cfg()
        dense = render_dense(scene_small.activated(), cam, cfg,
                             match_tiled_rects=True)
        tiled = render_tiled_xla(scene_small.activated(), cam, cfg)
        assert tiled.image.shape == (52, 100, 3)
        np.testing.assert_allclose(tiled.image, dense.image, atol=2e-5)


class TestGradients:
    def test_grad_matches_dense(self):
        """jax.grad through the tiled pipeline == grad through the oracle.

        Anisotropic scene: with isotropic gaussians the quats gradient is
        exactly zero (rotation of a sphere is unobservable), which would make
        the nonzero-gradient assertion below vacuous-impossible."""
        from gsrast_tpu.scene.gaussians import merge_params, split_params

        scene_small = random_scene(jax.random.PRNGKey(3), 200, sh_degree=0,
                                   isotropic=False, scale_range=(0.02, 0.08))
        cam = make_camera(64, 64)
        cfg = small_cfg()
        target = jnp.zeros((64, 64, 3))
        params, mask = split_params(scene_small)

        def loss_tiled(params):
            scene = merge_params(params, mask)
            return jnp.mean(
                (render_tiled_xla(scene.activated(), cam, cfg).image - target) ** 2
            )

        def loss_dense(params):
            scene = merge_params(params, mask)
            return jnp.mean(
                (render_dense(scene.activated(), cam, cfg,
                              match_tiled_rects=True).image - target) ** 2
            )

        g_t = jax.grad(loss_tiled)(params)
        g_d = jax.grad(loss_dense)(params)
        for name in params:
            gt, gd = g_t[name], g_d[name]
            np.testing.assert_allclose(gt, gd, atol=5e-5, rtol=5e-3,
                                       err_msg=f"grad mismatch: {name}")
            assert float(jnp.max(jnp.abs(gt))) > 0.0, f"zero grad: {name}"

    def test_finite_difference_opacity(self):
        """Directional finite-difference check through the full tiled path."""
        scene = random_scene(jax.random.PRNGKey(5), 20, sh_degree=0,
                             isotropic=True, scale_range=(0.05, 0.15))
        cam = make_camera(32, 32)
        cfg = small_cfg()

        def loss(logits):
            s = scene.replace(opacity_logits=logits)
            return jnp.sum(render_tiled_xla(s.activated(), cam, cfg).image)

        g = jax.grad(loss)(scene.opacity_logits)
        v = jnp.ones_like(scene.opacity_logits) / jnp.sqrt(20.0)
        eps = 1e-3
        fd = (loss(scene.opacity_logits + eps * v)
              - loss(scene.opacity_logits - eps * v)) / (2 * eps)
        np.testing.assert_allclose(jnp.vdot(g, v), fd, rtol=2e-2)


class TestRenderAPI:
    def test_backends_dispatch(self, scene_small):
        cam = make_camera(64, 64)
        out_xla = render(scene_small, cam, small_cfg(backend="xla"))
        out_dense = render(scene_small, cam, small_cfg(backend="dense"))
        assert out_xla.image.shape == out_dense.image.shape == (64, 64, 3)

    def test_jit_and_mask(self, scene_small):
        """Dead capacity slots do not contribute."""
        from gsrast_tpu.scene.gaussians import pad_to_capacity
        cam = make_camera(64, 64)
        cfg = small_cfg()
        padded = pad_to_capacity(scene_small, 256)
        out1 = render_tiled_xla(scene_small.activated(), cam, cfg)
        out2 = render_tiled_xla(padded.activated(), cam, cfg)
        np.testing.assert_allclose(out1.image, out2.image, atol=1e-6)
