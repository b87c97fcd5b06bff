"""On-TPU numerics: pallas kernels vs XLA path, forward + gradients."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax, jax.numpy as jnp
from gsrast_tpu import Camera, RenderConfig, random_scene
from gsrast_tpu.camera import look_at
from gsrast_tpu.render.tiled import render_tiled_xla
from gsrast_tpu.render.pallas_pipeline import render_tiled_pallas
from gsrast_tpu.scene.gaussians import merge_params, split_params

print("backend:", jax.default_backend())
scene = random_scene(jax.random.PRNGKey(7), 2000, sh_degree=3, isotropic=False,
                     scale_range=(0.01, 0.06))
cam = Camera(view=look_at(jnp.array([0.0, 0.0, -3.0]), jnp.zeros(3)),
             fov_x=jnp.float32(1.2), fov_y=jnp.float32(1.0),
             width=256, height=64)
cfg = RenderConfig(intersect_capacity_factor=16.0, max_per_tile=1024, tile_chunk=8,
                   background=(0.1, 0.2, 0.3))
xla = jax.jit(lambda s: render_tiled_xla(s, cam, cfg))(scene.activated())
pal = jax.jit(lambda s: render_tiled_pallas(s, cam, cfg))(scene.activated())
import time; print("t_fwd", time.time()); print("img maxdiff ", float(jnp.abs(pal.image - xla.image).max()))
print("ft  maxdiff ", float(jnp.abs(pal.final_t - xla.final_t).max()))
print("nc  mismatches", int(jnp.sum(pal.n_contrib != xla.n_contrib)))

params, mask = split_params(scene)
target = jnp.full((64, 256, 3), 0.4)

def loss(p, renderer):
    out = renderer(merge_params(p, mask).activated(), cam, cfg)
    return jnp.mean((out.image - target) ** 2) + 0.05 * jnp.mean(out.final_t)

gp = jax.jit(jax.grad(lambda p: loss(p, render_tiled_pallas)))(params)
gx = jax.jit(jax.grad(lambda p: loss(p, render_tiled_xla)))(params)
for name in params:
    a, b = gp[name], gx[name]
    scale = max(float(jnp.abs(b).max()), 1e-12)
    print(f"grad {name}: relmaxdiff {float(jnp.abs(a-b).max())/scale:.3e} (mag {scale:.3e})")
print("TPU_NUMERICS_OK")
