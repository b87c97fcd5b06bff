"""Tile-shape sweep of the FUSED pipeline at bench scale.

The 8x64 sweet spot was measured in r3 under the legacy two-tier binning
(scripts/exp_bench.py); the fused multi-tier path changed the sort economics
(rows scale with tiles/gaussian) and the blend's per-chunk work scales with
P = tile_h*tile_w, so the optimum may have moved. Each shape gets its own
auto-derived tier spec from the scene's measured count distribution.

    python scripts/tile_sweep.py [--n 1000000] [--shapes 8x64,8x32,16x32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--shapes", default="8x64,8x32,16x32,16x16,4x32")
    args = ap.parse_args()

    from gsrast_tpu import benchmark

    benchmark.enable_compile_cache()
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    scene, camera = benchmark.bench_scene_camera(
        args.n, args.width, args.height)

    for shape in args.shapes.split(","):
        th, tw = (int(x) for x in shape.split("x"))
        if (th * tw) % 128 != 0:
            print(f"{shape}: skipped (P % 128 != 0)")
            continue
        try:
            ms, mpix = benchmark.run_bench(
                args.n, args.width, args.height, backend,
                fwd_only=args.fwd_only, iters=args.iters, scene=scene,
                camera=camera, chain=1, tile_h=th, tile_w=tw,
            )
            print(f"{shape:>6}: {ms:8.2f} ms  {mpix:6.2f} Mpix/s "
                  f"(per-dispatch)", flush=True)
        except Exception as e:  # OOM / assert — report and continue
            print(f"{shape:>6}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
