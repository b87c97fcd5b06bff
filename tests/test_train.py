"""Training-loop tests: loss decreases, densify/prune/opacity-reset
mechanics, checkpoint save/restore determinism (SURVEY.md §4 tier for
BASELINE config 4 — capabilities beyond the forward-only reference)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrast_tpu import Camera, RenderConfig, random_scene
from gsrast_tpu.camera import look_at
from gsrast_tpu.render.api import render
from gsrast_tpu.scene.gaussians import split_params
from gsrast_tpu.train import checkpoint as ckpt
from gsrast_tpu.train import densify as densify_mod
from gsrast_tpu.train.loss import psnr, rgb_loss, ssim
from gsrast_tpu.train.trainer import (TrainConfig, init_train_state,
                                      make_optimizer, make_train_step,
                                      maybe_densify)


def make_camera(w=64, h=64):
    return Camera(
        view=look_at(jnp.array([0.0, 0.0, -3.0]), jnp.zeros(3)),
        fov_x=jnp.float32(1.0), fov_y=jnp.float32(1.0), width=w, height=h,
    )


CFG = RenderConfig(tile_h=8, tile_w=16, max_per_tile=256, tile_chunk=8,
                   intersect_capacity_factor=16.0)


@pytest.fixture(scope="module")
def setup():
    target_scene = random_scene(jax.random.PRNGKey(1), 48, sh_degree=0,
                                scale_range=(0.05, 0.15))
    camera = make_camera()
    target = render(target_scene.activated(), camera, CFG).image
    # start from a perturbed copy of the target scene
    init = target_scene.replace(
        means=target_scene.means
        + 0.03 * jax.random.normal(jax.random.PRNGKey(2),
                                   target_scene.means.shape),
        opacity_logits=target_scene.opacity_logits - 0.5,
    )
    return init, camera, target


class TestLosses:
    def test_ssim_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-4)

    def test_ssim_decreases_with_noise(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        noisy = img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
        assert float(ssim(img, noisy)) < 0.9

    def test_psnr(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=0.1)

    def test_rgb_loss_zero_at_match(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
        assert float(rgb_loss(img, img, 0.2)) == pytest.approx(0.0, abs=1e-5)


class TestTrainStep:
    def test_loss_decreases(self, setup):
        scene, camera, target = setup
        tc = TrainConfig()
        opt = make_optimizer(tc, scene_extent=1.0)
        state = init_train_state(scene, opt)
        step = jax.jit(make_train_step(CFG, tc, opt))
        state, m0 = step(state, camera, target)
        for _ in range(20):
            state, m = step(state, camera, target)
        assert float(m["loss"]) < float(m0["loss"])
        assert int(state.step) == 21
        assert bool(jnp.isfinite(m["psnr"]))

    def test_dead_slots_stay_frozen(self, setup):
        scene, camera, target = setup
        scene = scene.replace(mask=scene.mask.at[40:].set(False))
        tc = TrainConfig()
        opt = make_optimizer(tc, scene_extent=1.0)
        state = init_train_state(scene, opt)
        step = jax.jit(make_train_step(CFG, tc, opt))
        before = np.asarray(scene.means[40:])
        state, _ = step(state, camera, target)
        np.testing.assert_array_equal(np.asarray(state.scene.means[40:]),
                                      before)


class TestDensify:
    def test_densify_adds_and_opacity_reset(self, setup):
        scene, camera, target = setup
        tc = TrainConfig(densify_from=1, densify_every=1,
                         grad_threshold=1e-12, opacity_reset_every=10**9)
        opt = make_optimizer(tc, scene_extent=1.0)
        state = init_train_state(scene, opt)
        step = jax.jit(make_train_step(CFG, tc, opt))
        state, _ = step(state, camera, target)
        n0 = int(state.scene.num_active())
        state2, info = maybe_densify(state, tc, jax.random.PRNGKey(0), 1.0,
                                     opt)
        assert int(state2.scene.num_active()) >= n0  # clones/splits >= prunes

    def test_opacity_reset_caps(self, setup):
        scene, _, _ = setup
        out = densify_mod.reset_opacity(scene, max_opacity=0.01)
        ops = jax.nn.sigmoid(out.opacity_logits)
        assert float(jnp.max(jnp.where(out.mask, ops, 0.0))) <= 0.011


class TestCheckpoint:
    def test_save_restore_roundtrip(self, setup, tmp_path):
        scene, camera, target = setup
        tc = TrainConfig()
        opt = make_optimizer(tc, scene_extent=1.0)
        state = init_train_state(scene, opt)
        step = jax.jit(make_train_step(CFG, tc, opt))
        state, _ = step(state, camera, target)
        state, _ = step(state, camera, target)

        path = ckpt.save(str(tmp_path), state)
        assert os.path.isdir(path)
        assert ckpt.latest_step(str(tmp_path)) == 2

        template = init_train_state(scene, opt)
        restored = ckpt.restore(str(tmp_path), template)
        assert int(restored.step) == 2
        np.testing.assert_allclose(np.asarray(restored.scene.means),
                                   np.asarray(state.scene.means), atol=0)

        # deterministic resume: one more step from restored == from original
        s1, m1 = step(state, camera, target)
        s2, m2 = step(restored, camera, target)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.scene.means),
                                   np.asarray(s2.scene.means), atol=1e-7)

    def test_restore_missing_returns_none(self, setup, tmp_path):
        scene, _, _ = setup
        opt = make_optimizer(TrainConfig(), scene_extent=1.0)
        template = init_train_state(scene, opt)
        assert ckpt.restore(str(tmp_path / "nope"), template) is None
