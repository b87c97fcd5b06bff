"""Fused multi-tier binning on the tile-sharded path (r4, VERDICT r3 #2):
sharded preprocess + all_gather, device-scaled tiers, per-device sort volume
~S/D. Checks image + gradient agreement with the single-device fused render
and with the legacy sharded path's semantics on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrast_tpu import Camera, RenderConfig, random_scene, render
from gsrast_tpu.camera import look_at
from gsrast_tpu.ops.binning import shard_tiers, tier_dims
from gsrast_tpu.parallel.mesh import make_mesh
from gsrast_tpu.parallel.sharded import (make_sharded_train_step,
                                         pad_gaussians,
                                         render_primitive_sharded,
                                         render_tile_sharded)
from gsrast_tpu.scene.gaussians import split_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

TIERS = ((2, 1.0), (4, 1.0), (8, 0.5), (32, 0.25))
CFG = RenderConfig(max_per_tile=512, tile_chunk=2,
                   intersect_capacity_factor=16.0,
                   background=(0.05, 0.1, 0.15), tiers=TIERS,
                   backend="pallas")


def make_camera(w=256, h=64):
    return Camera(
        view=look_at(jnp.array([0.0, 0.0, -3.0]), jnp.zeros(3)),
        fov_x=jnp.float32(1.2), fov_y=jnp.float32(1.0), width=w, height=h,
    )


@pytest.fixture(scope="module")
def scene():
    return random_scene(jax.random.PRNGKey(11), 512, sh_degree=1,
                        scale_range=(0.02, 0.1))


class TestShardTiers:
    def test_widths_shrink_budgets_survive(self):
        td = shard_tiers(TIERS, 8)
        ks = [k for k, _ in td]
        assert ks == sorted(ks)
        assert ks[-1] < TIERS[-1][0]  # widths shrink with D
        # tier 0 keeps its FULL budget (nearly every visible gaussian owns
        # >= 1 tile on every device under interleaved rows; trimming it
        # dropped real work at dryrun scale) — the shrink comes from widths.
        assert td[0][1] >= 1.0
        dims_1, s1 = tier_dims(10_000, TIERS)
        dims_8, s8 = tier_dims(10_000, td)
        assert s8 < s1 / 2  # per-device slot volume actually shrinks

    def test_single_device_identity(self):
        assert shard_tiers(TIERS, 1) == TIERS


class TestFusedTileSharded:
    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    @pytest.mark.parametrize("interleave", [True, False])
    def test_matches_single_device(self, scene, backend, interleave):
        camera = make_camera()
        mesh = make_mesh((1, 4), jax.devices()[:4])
        ref = render(scene.activated(), camera, CFG)
        assert int(ref.stats["overflow_tile_cap"]) == 0
        out = jax.jit(
            lambda a: render_tile_sharded(
                a, camera, CFG, mesh, interleave=interleave, backend=backend
            )
        )(scene.activated())
        assert int(out.stats["overflow_tile_cap"]) == 0
        # Device-scaled tiers shift which slots the (exactness-preserving)
        # ellipse cull sees, so counts are close but not equal; the IMAGE
        # must match exactly either way.
        ref_n = int(ref.stats["num_intersections"])
        assert abs(int(out.stats["num_intersections"]) - ref_n) < (
            0.06 * ref_n + 64)
        np.testing.assert_allclose(
            np.asarray(out.image), np.asarray(ref.image), atol=2e-5)

    def test_gradients_match_single_device(self, scene):
        camera = make_camera()
        mesh = make_mesh((1, 4), jax.devices()[:4])
        act = scene.activated()

        def loss_sharded(means):
            a = act.replace(means=means)
            return jnp.sum(render_tile_sharded(
                a, camera, CFG, mesh, backend="pallas").image)

        def loss_ref(means):
            a = act.replace(means=means)
            return jnp.sum(render(a, camera, CFG).image)

        g_sh = jax.jit(jax.grad(loss_sharded))(act.means)
        g_ref = jax.jit(jax.grad(loss_ref))(act.means)
        np.testing.assert_allclose(
            np.asarray(g_sh), np.asarray(g_ref), atol=2e-4, rtol=1e-4)

    def test_eight_device_skew(self, scene):
        """Corner-concentrated scene on the full 8-device tile mesh:
        interleaved ownership + device-scaled tiers stay exact (zero counted
        drops) and match single-device."""
        s = scene.replace(means=scene.means * 0.12
                          + jnp.array([-0.9, -0.35, 0.0]))
        camera = make_camera()
        mesh = make_mesh((1, 8), jax.devices())
        ref = render(s.activated(), camera, CFG)
        out = jax.jit(
            lambda a: render_tile_sharded(
                a, camera, CFG, mesh, interleave=True, backend="pallas")
        )(s.activated())
        assert int(out.stats["overflow_tile_cap"]) == 0
        np.testing.assert_allclose(
            np.asarray(out.image), np.asarray(ref.image), atol=2e-5)

class TestFusedPrimitiveSharded:
    """r5 (VERDICT r4 #5): the primitive-sharded exchange binned by the
    multi-tier route grid (dest-prefixed keys, ONE 2-key sort) instead of
    the searchsorted expansion."""

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_matches_single_device(self, scene, backend):
        camera = make_camera()
        mesh = make_mesh((1, 4), jax.devices()[:4])
        act = pad_gaussians(scene.activated(), 4)
        ref = render(scene.activated(), camera, CFG)
        out = jax.jit(
            lambda a: render_primitive_sharded(
                a, camera, CFG, mesh, backend=backend, send_capacity=4096)
        )(act)
        assert int(out.stats["overflow_send"]) == 0
        assert int(out.stats["overflow_capacity"]) == 0  # k_last-cap drops
        np.testing.assert_allclose(
            np.asarray(out.image), np.asarray(ref.image), atol=2e-5)

    def test_gradients_match_single_device(self, scene):
        camera = make_camera()
        mesh = make_mesh((1, 4), jax.devices()[:4])
        act = pad_gaussians(scene.activated(), 4)

        def loss_sharded(means):
            a = act.replace(means=means)
            return jnp.sum(render_primitive_sharded(
                a, camera, CFG, mesh, backend="pallas",
                send_capacity=4096).image)

        def loss_ref(means):
            a = act.replace(means=means)
            return jnp.sum(render(a, camera, CFG).image)

        g_sh = jax.jit(jax.grad(loss_sharded))(act.means)
        g_ref = jax.jit(jax.grad(loss_ref))(act.means)
        np.testing.assert_allclose(
            np.asarray(g_sh), np.asarray(g_ref), atol=2e-4, rtol=1e-4)

    def test_skewed_send_overflow_counted(self, scene):
        """Corner-concentrated scene: with headroom the tier-grid exchange
        is exact; with a tight send buffer it counts drops, never silent."""
        s = scene.replace(means=scene.means * 0.12
                          + jnp.array([-0.9, -0.35, 0.0]))
        camera = make_camera()
        mesh = make_mesh((1, 4), jax.devices()[:4])
        act = pad_gaussians(s.activated(), 4)
        ref = render(s.activated(), camera, CFG)
        out = jax.jit(
            lambda a: render_primitive_sharded(
                a, camera, CFG, mesh, backend="pallas", send_capacity=8192)
        )(act)
        assert int(out.stats["overflow_send"]) == 0
        np.testing.assert_allclose(
            np.asarray(out.image), np.asarray(ref.image), atol=2e-5)
        tight = jax.jit(
            lambda a: render_primitive_sharded(
                a, camera, CFG, mesh, backend="pallas", send_capacity=128)
        )(act)
        assert int(tight.stats["overflow_send"]) > 0


class TestTrainStepFused:
    def test_train_step_fused(self, scene):
        """DP x tile mesh with the fused local path: one step runs, loss
        finite, params move."""
        import optax

        camera = make_camera()
        mesh = make_mesh((2, 4), jax.devices())
        params, mask = split_params(scene)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step = make_sharded_train_step(
            CFG, mesh, camera.height, camera.width, optimizer=opt,
            backend="pallas")
        n_data = 2
        cams = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_data,) + x.shape), camera)
        tgts = jnp.zeros((n_data, camera.height, camera.width, 3),
                         jnp.float32)
        new_params, opt_state, loss, grads = jax.jit(step)(
            params, mask, opt_state, cams, tgts)
        assert np.isfinite(float(loss))
        moved = any(
            float(jnp.abs(a - b).max()) > 0
            for a, b in zip(jax.tree.leaves(new_params),
                            jax.tree.leaves(params)))
        assert moved
