"""One-off config experiments on the north-star step (foreground TPU).

Times the exact run_bench step with overridden RenderConfig knobs, e.g.:
  python scripts/exp_bench.py --tile-w 32 --cap-factor 7
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tile-h", type=int, default=None)
    ap.add_argument("--tile-w", type=int, default=None)
    ap.add_argument("--cap-factor", type=float, default=None)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsrast_tpu import benchmark
    from gsrast_tpu.render.api import render
    from gsrast_tpu.scene.gaussians import merge_params, split_params

    benchmark.enable_compile_cache()
    rcfg = benchmark.bench_config("pallas")
    over = {}
    if args.tile_h:
        over["tile_h"] = args.tile_h
    if args.tile_w:
        over["tile_w"] = args.tile_w
    if args.cap_factor:
        over["intersect_capacity_factor"] = args.cap_factor
    if args.k:
        over["max_tiles_per_gaussian"] = args.k
    rcfg = rcfg.replace(**over)
    scene, camera = benchmark.bench_scene_camera(
        args.n, args.width, args.height)
    params, mask = split_params(scene)

    if args.fwd_only:
        @jax.jit
        def step(params, mask):
            s = merge_params(params, mask)
            return render(s.activated(), camera, rcfg).image
    else:
        @jax.jit
        def step(params, mask):
            def loss(p):
                s = merge_params(p, mask)
                img = render(s.activated(), camera, rcfg).image
                return jnp.mean(img * img)

            return jax.grad(loss)(params)

    best = benchmark.timeit(step, params, mask, iters=args.iters)
    mpix = args.width * args.height / best / 1e3

    # overflow audit at this config
    out = jax.jit(
        lambda p, m: render(
            merge_params(p, m).activated(), camera, rcfg
        ).stats
    )(params, mask)
    print(f"cfg tile={rcfg.tile_h}x{rcfg.tile_w} K="
          f"{rcfg.max_tiles_per_gaussian} capf="
          f"{rcfg.intersect_capacity_factor}: best={best:.1f} ms "
          f"{mpix:.2f} Mpix/s "
          f"(isect={int(out['num_intersections'])}, "
          f"ovf_cap={int(out['overflow_capacity'])}, "
          f"ovf_k={int(out['overflow_tile_cap'])})", flush=True)


if __name__ == "__main__":
    main()
