"""Backward-pass decomposition timing: where do the grad milliseconds go?

Times vjp of each differentiable stage separately at bench scale so the
backward's unaccounted time (fwd+bwd - fwd - blend_bwd) can be attributed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gsrast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tile-h", type=int, default=8)
    ap.add_argument("--tile-w", type=int, default=128)
    ap.add_argument("--max-tiles", type=int, default=16)
    ap.add_argument("--cap-factor", type=float, default=8.0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from gsrast_tpu import Camera, RenderConfig, random_scene
    from gsrast_tpu.camera import look_at
    from gsrast_tpu.ops import binning as binning_ops
    from gsrast_tpu.ops.preprocess import preprocess
    from gsrast_tpu.render import pallas_pipeline as pp
    from gsrast_tpu.render.api import render

    cfg = RenderConfig(backend="pallas",
                       intersect_capacity_factor=args.cap_factor,
                       tile_h=args.tile_h, tile_w=args.tile_w,
                       max_tiles_per_gaussian=args.max_tiles)
    scene = random_scene(jax.random.PRNGKey(0), args.n, sh_degree=3,
                         isotropic=False, scale_range=(0.002, 0.008))
    act = scene.activated()
    camera = Camera(
        view=look_at(jnp.array([0.0, 0.0, -2.5]), jnp.zeros(3)),
        fov_x=jnp.float32(1.2), fov_y=jnp.float32(1.0),
        width=args.width, height=args.height,
    )
    grid_h, grid_w = cfg.grid_shape(camera.height, camera.width)
    capacity = cfg.capacity(args.n)

    prep = jax.jit(lambda a: preprocess(a, camera, cfg))(act)
    binning = jax.jit(lambda p: binning_ops.build_binning(
        p, grid_h, grid_w, cfg, capacity))(prep)

    # grad of preprocess alone (cotangent = ones on the used outputs)
    afloats = {k: getattr(act, k)
               for k in ("means", "scales", "quats", "opacities", "sh")}

    def prep_loss(floats):
        p = preprocess(act.replace(**floats), camera, cfg)
        return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.color)
                + jnp.sum(p.opacity))
    f = jax.jit(jax.grad(prep_loss))
    print(f"prep fwd+bwd:        {timeit(f, afloats, iters=args.iters):9.2f} ms")

    # grad of pack alone wrt prep float fields
    def pack_loss(pfloats, b):
        p2 = prep._replace(**pfloats)
        return jnp.sum(pp.pack_features(p2, b, args.max_tiles))
    pfloats = {k: getattr(prep, k)
               for k in ("mean2d", "conic", "color", "opacity")}
    f = jax.jit(jax.grad(pack_loss), static_argnames=())
    print(f"pack fwd+bwd:        {timeit(f, pfloats, binning, iters=args.iters):9.2f} ms")

    # grad of pack+blend wrt prep float fields
    def blend_loss(pfloats, b):
        p2 = prep._replace(**pfloats)
        feat = pp.pack_features(p2, b, args.max_tiles)
        rgb, ft, nc = pp._blend(feat, b.tile_starts,
                                jnp.array([0, 1], jnp.int32), grid_h, grid_w,
                                args.tile_h, args.tile_w, False,
                                grid_h * grid_w)
        return jnp.sum(rgb) + jnp.sum(ft)
    f = jax.jit(jax.grad(blend_loss))
    print(f"pack+blend fwd+bwd:  {timeit(f, pfloats, binning, iters=args.iters):9.2f} ms")

    # full render grad
    def loss(floats):
        a = act.replace(**floats)
        return jnp.sum(render(a, camera, cfg).image)
    floats = {k: getattr(act, k)
              for k in ("means", "scales", "quats", "opacities", "sh")}
    f_grad = jax.jit(jax.grad(loss))
    t = timeit(f_grad, floats, iters=args.iters)
    print(f"full fwd+bwd:        {t:9.2f} ms")
    print(f"=> {args.width*args.height/t/1e3:.2f} Mpixels/s fwd+bwd")


if __name__ == "__main__":
    main()
