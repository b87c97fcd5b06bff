"""Unit tests for the per-Gaussian math core against closed-form cases
(SURVEY.md §4: quat->mat, cov3D/cov2D, SH eval, key packing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrast_tpu.ops import covariance as cov
from gsrast_tpu.ops import projection as proj
from gsrast_tpu.ops import sh as sh_ops
from gsrast_tpu import camera as cam


class TestQuatToRotmat:
    def test_identity(self):
        r = cov.quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_90deg_about_z(self):
        s = np.sin(np.pi / 4)
        r = cov.quat_to_rotmat(jnp.array([np.cos(np.pi / 4), 0.0, 0.0, s]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(r, expected, atol=1e-6)

    def test_orthonormal_batch(self, rng):
        q = jax.random.normal(rng, (32, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        r = np.asarray(cov.quat_to_rotmat(q))  # products in numpy: the
        # platform's default matmul is bf16-pass and would mask real errors
        eye = np.broadcast_to(np.eye(3), (32, 3, 3))
        np.testing.assert_allclose(r @ np.swapaxes(r, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), np.ones(32), atol=1e-5)


class TestCov3D:
    def test_axis_aligned(self):
        c6 = cov.compute_cov3d(jnp.array([1.0, 2.0, 3.0]),
                               jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(c6, [1.0, 0.0, 0.0, 4.0, 0.0, 9.0], atol=1e-5)

    def test_rotation_invariant_trace(self, rng):
        scale = jnp.array([0.5, 1.5, 2.5])
        q = jax.random.normal(rng, (4,))
        q = q / jnp.linalg.norm(q)
        c6 = cov.compute_cov3d(scale, q)
        trace = c6[0] + c6[3] + c6[5]
        np.testing.assert_allclose(trace, jnp.sum(scale**2), rtol=1e-5)

    def test_matches_dense_formula(self, rng):
        k1, k2 = jax.random.split(rng)
        scale = jnp.exp(jax.random.normal(k1, (8, 3)) * 0.3)
        q = jax.random.normal(k2, (8, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        c6 = cov.compute_cov3d(scale, q)
        sigma = cov.cov3d_to_matrix(c6)
        r = np.asarray(cov.quat_to_rotmat(q))  # numpy matmul: platform default
        m = r * np.asarray(scale)[:, None, :]  # jnp matmul is bf16-pass
        np.testing.assert_allclose(sigma, m @ np.swapaxes(m, -1, -2), atol=1e-5)


class TestCov2D:
    def test_isotropic_on_axis(self):
        """Isotropic gaussian on the optical axis: cov2d = (f*s/z)^2 I + 0.3 I."""
        s, z, f = 0.1, 5.0, 500.0
        c6 = cov.compute_cov3d(jnp.full(3, s), jnp.array([1.0, 0, 0, 0]))
        c2 = cov.compute_cov2d(
            jnp.array([0.0, 0.0, z]), c6, jnp.eye(3),
            jnp.float32(f), jnp.float32(f), jnp.float32(1.0), jnp.float32(1.0),
        )
        expected = (f * s / z) ** 2
        np.testing.assert_allclose(c2[0], expected + 0.3, rtol=1e-4)
        np.testing.assert_allclose(c2[2], expected + 0.3, rtol=1e-4)
        np.testing.assert_allclose(c2[1], 0.0, atol=1e-4)

    def test_conic_inverse(self):
        cov2d = jnp.array([4.0, 1.0, 2.0])
        conic, radius, valid = cov.conic_and_radius(cov2d)
        m = jnp.array([[4.0, 1.0], [1.0, 2.0]])
        inv = jnp.linalg.inv(m)
        np.testing.assert_allclose(conic, [inv[0, 0], inv[0, 1], inv[1, 1]], rtol=1e-5)
        assert bool(valid)
        lam_max = np.max(np.linalg.eigvalsh(np.asarray(m)))
        assert float(radius) == np.ceil(3.0 * np.sqrt(lam_max))

    def test_degenerate_rejected(self):
        _, radius, valid = cov.conic_and_radius(jnp.array([1.0, 2.0, 1.0]))
        assert not bool(valid)
        assert float(radius) == 0.0


class TestSH:
    def test_degree0_constant(self):
        shc = jnp.zeros((16, 3)).at[0].set(1.0)
        for d in [jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0])]:
            c = sh_ops.eval_sh(shc, d, 3)
            np.testing.assert_allclose(c, sh_ops.SH_C0 * 1.0 + 0.5, rtol=1e-6)

    def test_degree1_linearity(self):
        shc = jnp.zeros((4, 3)).at[2].set(1.0)  # the +z band (index 2)
        cz = sh_ops.eval_sh(shc, jnp.array([0.0, 0.0, 1.0]), 1)
        cmz = sh_ops.eval_sh(shc, jnp.array([0.0, 0.0, -1.0]), 1)
        np.testing.assert_allclose(cz, 0.5 + sh_ops.SH_C1, rtol=1e-6)
        # negative lobe clamps at zero
        np.testing.assert_allclose(cmz, np.maximum(0.5 - sh_ops.SH_C1, 0.0), atol=1e-7)

    def test_clamp_nonnegative(self, rng):
        shc = jax.random.normal(rng, (5, 16, 3)) * 2.0
        dirs = jax.random.normal(rng, (5, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        c = sh_ops.eval_sh(shc, dirs, 3)
        assert float(jnp.min(c)) >= 0.0

    def test_orthogonality_integration(self):
        """Band means over the sphere vanish for degree >= 1."""
        key = jax.random.PRNGKey(1)
        dirs = jax.random.normal(key, (200000, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        shc = jnp.zeros((16, 3)).at[9].set(1.0)  # a degree-3 band
        c = sh_ops.eval_sh(shc[None], dirs, 3) - 0.5  # un-offset, pre-clamp?
        # clamping breaks symmetry only when |value| > 0.5; band value max ~0.6
        # use small coefficient instead
        shc = jnp.zeros((16, 3)).at[9].set(0.3)
        c = sh_ops.eval_sh(shc[None], dirs, 3) - 0.5
        assert abs(float(jnp.mean(c[:, 0]))) < 2e-3


class TestProjection:
    def test_center_projects_to_image_center(self):
        c = cam.Camera(
            view=jnp.eye(4), fov_x=jnp.float32(1.0), fov_y=jnp.float32(1.0),
            width=640, height=480,
        )
        xy, ndc = proj.project(jnp.array([[0.0, 0.0, 5.0]]),
                               c.full_projection(), 640, 480)
        np.testing.assert_allclose(ndc[0, :2], [0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(xy[0], [(640 - 1) / 2, (480 - 1) / 2], atol=1e-3)

    def test_depth_and_cull(self):
        c = cam.Camera(view=jnp.eye(4), fov_x=jnp.float32(1.0),
                       fov_y=jnp.float32(1.0), width=64, height=64)
        pts = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, -5.0], [100.0, 0.0, 5.0]])
        pc = proj.to_camera(pts, c.view)
        _, ndc = proj.project(pts, c.full_projection(), 64, 64)
        vis = proj.in_frustum(pc[:, 2], ndc)
        assert bool(vis[0]) and not bool(vis[1]) and not bool(vis[2])

    def test_lookat_roundtrip(self):
        eye = jnp.array([1.0, 2.0, 3.0])
        target = jnp.array([0.0, 0.0, 0.0])
        view = cam.look_at(eye, target)
        # eye maps to origin, target to (0, 0, |eye-target|)
        pc = proj.to_camera(jnp.stack([eye, target]), view)
        np.testing.assert_allclose(pc[0], jnp.zeros(3), atol=1e-5)
        np.testing.assert_allclose(pc[1, :2], jnp.zeros(2), atol=1e-5)
        np.testing.assert_allclose(pc[1, 2], jnp.linalg.norm(eye - target), rtol=1e-5)

    def test_depth_key_monotone(self):
        depths = jnp.array([0.3, 1.0, 2.5, 2.5000002, 100.0])
        keys = proj.depth_order_key(depths)
        assert bool(jnp.all(keys[1:] >= keys[:-1]))
        # strictly increasing where depths strictly increase
        assert bool(jnp.all(keys[1:] > keys[:-1]))

    def test_tile_rect(self):
        r = proj.tile_rect(jnp.array([100.0, 40.0]), jnp.float32(10.0),
                           grid_h=10, grid_w=10, tile_h=16, tile_w=16)
        assert int(r.x_min) == 5 and int(r.x_max) == 7
        assert int(r.y_min) == 1 and int(r.y_max) == 4
        assert int(r.area()) == 6


class TestCameraPose:
    def test_pose_roundtrip(self):
        c = cam.auto_frame([-1, -1, -1], [1, 1, 1], 320, 240)
        d = cam.pose_to_dict(c)
        c2 = cam.pose_from_dict(d)
        np.testing.assert_allclose(c.view, c2.view, atol=1e-6)
        assert c2.width == 320 and c2.height == 240
