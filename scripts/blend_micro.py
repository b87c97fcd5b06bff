"""Isolated blend-kernel timings at bench scale (1M/1080p).

Times blend FORWARD alone and blend BACKWARD alone (via the custom VJP,
with the pack held constant) so kernel edits can be judged in ~1 min
round-trips instead of through the full step. Usage:

    python scripts/blend_micro.py [--n 1000000] [--width 1920] [--height 1080]
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


def _sync(out):
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(leaf[(0,) * getattr(leaf, "ndim", 0)])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from gsrast_tpu import benchmark
    from gsrast_tpu.ops import binning as binning_ops
    from gsrast_tpu.ops.preprocess import preprocess
    from gsrast_tpu.render import pallas_pipeline as pp
    from gsrast_tpu.render.api import auto_render_config

    scene, camera = benchmark.bench_scene_camera(args.n, args.width,
                                                 args.height)
    rcfg = auto_render_config(
        scene, camera, "pallas", base=benchmark.bench_config("pallas"))
    print(f"# tile {rcfg.tile_h}x{rcfg.tile_w} tiers {rcfg.tiers}")
    act = scene.activated()
    grid_h, grid_w = rcfg.grid_shape(camera.height, camera.width)
    num_tiles = grid_h * grid_w
    n = args.n

    prep = jax.jit(lambda a: preprocess(a, camera, rcfg))(act)
    plan = jax.jit(lambda p: binning_ops.plan_tiers(
        p, grid_h, grid_w, rcfg))(prep)
    feat, ts = jax.jit(lambda p, pl: pp.fused_pack(
        pp.feature_rows(p), pl.tile_key, pl.depth_key, pl.slot, pl.gauss,
        pl.order, rcfg.tiers, n, num_tiles))(prep, plan)
    jax.block_until_ready((feat, ts))
    tmap = jnp.array([0, 1], jnp.int32)

    fwd = jax.jit(lambda f, t: pp._blend(
        f, t, tmap, grid_h, grid_w, rcfg.tile_h, rcfg.tile_w, False,
        num_tiles))
    ms_f = timeit(fwd, feat, ts, iters=args.iters)

    def loss(f, t):
        rgb, ft, nc = pp._blend(f, t, tmap, grid_h, grid_w, rcfg.tile_h,
                                rcfg.tile_w, False, num_tiles)
        return jnp.sum(rgb) + jnp.sum(ft)

    both = jax.jit(jax.grad(loss))
    ms_fb = timeit(both, feat, ts, iters=args.iters)

    # ~55 ms of each number is the axon tunnel's dispatch+RTT floor
    # (BASELINE.md); the deltas below are floor-free.
    print(f"blend fwd        : {ms_f:8.2f} ms (incl. dispatch floor)")
    print(f"blend fwd+bwd    : {ms_fb:8.2f} ms (incl. dispatch floor)")
    print(f"bwd-only delta   : {ms_fb - ms_f:8.2f} ms")


if __name__ == "__main__":
    main()
