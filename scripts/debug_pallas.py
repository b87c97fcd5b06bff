"""Quick interpret-mode check of the Pallas blend pipeline vs the XLA path."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
os.environ["JAX_PLATFORMS"] = "cpu"  # interpret-mode check runs on CPU

import jax

# the axon sitecustomize overrides the env var; force cpu explicitly
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gsrast_tpu import Camera, RenderConfig, random_scene
from gsrast_tpu.camera import look_at
from gsrast_tpu.render.tiled import render_tiled_xla
from gsrast_tpu.render.pallas_pipeline import render_tiled_pallas

cam = Camera(
    view=look_at(jnp.array([0.0, 0.0, -4.0]), jnp.zeros(3)),
    fov_x=jnp.float32(1.2), fov_y=jnp.float32(1.0),
    width=256, height=32,
)
cfg = RenderConfig(max_per_tile=512, tile_chunk=4, intersect_capacity_factor=32.0)
scene = random_scene(jax.random.PRNGKey(3), 50, sh_degree=0, isotropic=True,
                     scale_range=(0.05, 0.3))

xla = render_tiled_xla(scene.activated(), cam, cfg)
print("xla ok; mean img", float(xla.image.mean()), "ft", float(xla.final_t.mean()),
      "ints", int(xla.stats["num_intersections"]))
pal = render_tiled_pallas(scene.activated(), cam, cfg)
print("pallas fwd ok; mean img", float(pal.image.mean()))
print("img maxdiff", float(jnp.abs(pal.image - xla.image).max()))
print("ft  maxdiff", float(jnp.abs(pal.final_t - xla.final_t).max()))
print("nc  maxdiff", int(jnp.abs(pal.n_contrib - xla.n_contrib).max()))

from gsrast_tpu.scene.gaussians import merge_params, split_params
params, mask = split_params(scene)

def loss_p(p):
    o = render_tiled_pallas(merge_params(p, mask).activated(), cam, cfg)
    return jnp.sum(o.image * o.image) + jnp.sum(o.final_t * 0.3)

def loss_x(p):
    o = render_tiled_xla(merge_params(p, mask).activated(), cam, cfg)
    return jnp.sum(o.image * o.image) + jnp.sum(o.final_t * 0.3)

gp = jax.grad(loss_p)(params)
gx = jax.grad(loss_x)(params)
for name in params:
    a, b = gp[name], gx[name]
    d = float(jnp.abs(a - b).max())
    m = float(jnp.abs(b).max())
    print(f"grad {name}: maxdiff {d:.3e} (ref magnitude {m:.3e})")
print("DONE")
