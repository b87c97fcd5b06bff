"""Scene representation and .ply round-trip tests (the SplatData-parity tier:
reference SplatData.cpp:28-156 loader semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from gsrast_tpu.scene import gaussians as G
from gsrast_tpu.scene import ply


class TestActivations:
    def test_activation_semantics(self, rng):
        """scale=exp, rot=normalize, opacity=sigmoid — the transforms the
        reference bakes in at load (SplatData.cpp:50-54)."""
        scene = G.random_scene(rng, 16, sh_degree=1)
        act = scene.activated()
        np.testing.assert_allclose(act.scales, np.exp(scene.log_scales), rtol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(act.quats, axis=-1), np.ones(16), atol=1e-5
        )
        np.testing.assert_allclose(
            act.opacities, jax.nn.sigmoid(scene.opacity_logits), rtol=1e-5
        )

    def test_bbox_and_center(self, rng):
        scene = G.random_scene(rng, 64, sh_degree=0, extent=2.0)
        mn, mx = scene.bbox()
        assert bool(jnp.all(mn <= mx))
        assert bool(jnp.all(mn >= -2.0)) and bool(jnp.all(mx <= 2.0))
        c = scene.center()
        np.testing.assert_allclose(c, jnp.mean(scene.means, axis=0), atol=1e-5)

    def test_padding_masks_dead_slots(self, rng):
        scene = G.random_scene(rng, 10, sh_degree=0)
        padded = G.pad_to_capacity(scene, 32)
        assert padded.capacity == 32
        assert int(padded.num_active()) == 10
        act = padded.activated()
        np.testing.assert_allclose(act.opacities[10:], 0.0, atol=1e-6)
        mn0, mx0 = scene.bbox()
        mn1, mx1 = padded.bbox()
        np.testing.assert_allclose(mn0, mn1)
        np.testing.assert_allclose(mx0, mx1)


class TestPlyRoundtrip:
    def test_roundtrip_sh3(self, rng, tmp_path):
        scene = G.random_scene(rng, 37, sh_degree=3)
        path = str(tmp_path / "scene.ply")
        ply.save_ply(scene, path)
        loaded = ply.load_ply(path)
        np.testing.assert_allclose(loaded.means, scene.means, atol=1e-6)
        np.testing.assert_allclose(loaded.log_scales, scene.log_scales, atol=1e-6)
        np.testing.assert_allclose(loaded.quats, scene.quats, atol=1e-6)
        np.testing.assert_allclose(
            loaded.opacity_logits, scene.opacity_logits, atol=1e-6
        )
        np.testing.assert_allclose(loaded.sh, scene.sh, atol=1e-6)

    def test_roundtrip_sh0(self, rng, tmp_path):
        scene = G.random_scene(rng, 5, sh_degree=0)
        path = str(tmp_path / "s0.ply")
        ply.save_ply(scene, path)
        loaded = ply.load_ply(path)
        assert loaded.sh.shape == (5, 1, 3)
        np.testing.assert_allclose(loaded.sh, scene.sh, atol=1e-6)

    def test_richpoint_binary_layout(self, tmp_path):
        """Hand-built RichPoint record (62 floats: pos 3 + normal 3 + 48 SH +
        opacity + scale 3 + rot 4 — reference SplatData.hpp:15-25) parses into
        the right fields, including the channel-major f_rest transpose."""
        n_rest = 45
        names = (
            ["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(n_rest)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        assert len(names) == 62
        header = ["ply", "format binary_little_endian 1.0", "element vertex 1"]
        header += [f"property float {nm}" for nm in names]
        header += ["end_header", ""]
        vals = np.arange(62, dtype="<f4")
        data = "\n".join(header).encode() + vals.tobytes()
        scene = ply.load_ply(data)
        np.testing.assert_allclose(scene.means[0], [0, 1, 2])
        np.testing.assert_allclose(scene.sh[0, 0], [6, 7, 8])  # DC
        # f_rest index 0 = R-channel coeff 1 -> sh[1, 0]
        np.testing.assert_allclose(scene.sh[0, 1, 0], 9)
        np.testing.assert_allclose(scene.sh[0, 1, 1], 9 + 15)  # G coeff 1
        np.testing.assert_allclose(scene.opacity_logits[0], 54)
        np.testing.assert_allclose(scene.log_scales[0], [55, 56, 57])
        np.testing.assert_allclose(scene.quats[0], [58, 59, 60, 61])

    def test_capacity_padding_on_load(self, rng, tmp_path):
        scene = G.random_scene(rng, 7, sh_degree=1)
        path = str(tmp_path / "cap.ply")
        ply.save_ply(scene, path)
        loaded = ply.load_ply(path, capacity=16)
        assert loaded.capacity == 16
        assert int(loaded.num_active()) == 7
