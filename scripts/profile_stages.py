"""Stage-by-stage timing of the tile-sorted pipeline on the current backend.

Times preprocess / binning / pad+pack / blend fwd / blend bwd / full fwd /
fwd+bwd separately so optimization effort goes where the milliseconds are.
Use --tile-h/--tile-w to measure tile-shape economics (VERDICT r1 item 3).
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


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tile-h", type=int, default=16)
    ap.add_argument("--tile-w", type=int, default=16)
    ap.add_argument("--cap-factor", type=float, default=8.0)
    args = ap.parse_args()

    from gsrast_tpu import Camera, RenderConfig, random_scene
    from gsrast_tpu.camera import look_at
    from gsrast_tpu.ops import binning as binning_ops
    from gsrast_tpu.ops.preprocess import preprocess
    from gsrast_tpu.render import pallas_pipeline as pp
    from gsrast_tpu.render import pallas_blend as pb
    from gsrast_tpu.render.api import render

    on_tpu = jax.default_backend() == "tpu"
    backend = args.backend or ("pallas" if on_tpu else "xla")
    cfg = RenderConfig(backend=backend,
                       intersect_capacity_factor=args.cap_factor,
                       max_per_tile=4096, tile_chunk=8,
                       tile_h=args.tile_h, tile_w=args.tile_w)

    scene = random_scene(jax.random.PRNGKey(0), args.n, sh_degree=3,
                         isotropic=False, scale_range=(0.005, 0.02))
    act = scene.activated()
    camera = Camera(
        view=look_at(jnp.array([0.0, 0.0, -2.5]), jnp.zeros(3)),
        fov_x=jnp.float32(1.2), fov_y=jnp.float32(1.0),
        width=args.width, height=args.height,
    )

    grid_h, grid_w = cfg.grid_shape(camera.height, camera.width)
    num_tiles = grid_h * grid_w
    capacity = cfg.capacity(args.n)
    print(f"tile {args.tile_h}x{args.tile_w}, grid {grid_h}x{grid_w} "
          f"({num_tiles} tiles), cap={capacity}")

    f_prep = jax.jit(lambda a: preprocess(a, camera, cfg))
    prep = f_prep(act)
    print(f"prep:        {timeit(f_prep, act, iters=args.iters)*1e3:9.2f} ms")

    f_bin = jax.jit(lambda p: binning_ops.build_binning(
        p, grid_h, grid_w, cfg, capacity))
    binning = f_bin(prep)
    print(f"binning:     {timeit(f_bin, prep, iters=args.iters)*1e3:9.2f} ms"
          f"   (n_isect={int(binning.num_intersections)},"
          f" ovf={int(binning.overflow_capacity)},"
          f" ovf_k={int(binning.overflow_tile_cap)})")

    f_pack = jax.jit(lambda p, b: pp.pack_features(p, b, cfg))
    feat = f_pack(prep, binning)
    print(f"pack:        "
          f"{timeit(f_pack, prep, binning, iters=args.iters)*1e3:9.2f} ms")
    pstarts = binning.tile_starts

    if backend == "pallas":
        f_blend = jax.jit(lambda f, s: pb.blend_forward(
            f, s, grid_h, grid_w, args.tile_h, args.tile_w))
        out = f_blend(feat, pstarts)
        print(f"blend_fwd:   {timeit(f_blend, feat, pstarts, iters=args.iters)*1e3:9.2f} ms")

        ft = out[:, pb.OC_FT, :]
        nc = out[:, pb.OC_NC, :]
        aux = jnp.concatenate(
            [jnp.ones_like(out[:, :3, :]),          # d_rgb rows
             jnp.zeros_like(ft)[:, None, :],        # d_ft
             ft[:, None, :], nc[:, None, :],
             jnp.zeros((ft.shape[0], 2, ft.shape[1]), jnp.float32)], axis=1)
        f_bwd = jax.jit(lambda f, s, a: pb.blend_backward(
            f, s, a, grid_h, grid_w, args.tile_h, args.tile_w))
        _ = f_bwd(feat, pstarts, aux)
        print(f"blend_bwd:   {timeit(f_bwd, feat, pstarts, aux, iters=args.iters)*1e3:9.2f} ms")

    f_full = jax.jit(lambda a: render(a, camera, cfg).image)
    _ = f_full(act)
    print(f"full fwd:    {timeit(f_full, act, iters=args.iters)*1e3:9.2f} ms")

    def loss(floats):
        a = act.replace(**floats)
        return jnp.sum(render(a, camera, cfg).image)

    floats = {k: getattr(act, k)
              for k in ("means", "scales", "quats", "opacities", "sh")}
    f_grad = jax.jit(jax.grad(loss))
    _ = f_grad(floats)
    t = timeit(f_grad, floats, iters=args.iters)
    print(f"fwd+bwd:     {t*1e3:9.2f} ms")
    mpix = args.width * args.height / t / 1e6
    print(f"=> {mpix:.2f} Mpixels/s fwd+bwd")


if __name__ == "__main__":
    main()
