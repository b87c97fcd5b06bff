"""Scaling-efficiency harness: pixels/s vs device count on the virtual mesh.

BASELINE.json's north star demands >=70% pixels/s scaling efficiency from
1 chip to N. Only ONE real TPU chip is reachable in this environment, so this
harness measures the SHAPE of the scaling curve on the 8-virtual-device CPU
mesh (the same XLA_FLAGS mechanism the tests use): it exercises the real
sharded code paths (tile-sharded and primitive-sharded, forward+backward) and
exposes the overheads that would gate real scaling — per-device binning
redundancy, collective volume, tile-load imbalance. Absolute CPU numbers are
meaningless; the per-device efficiency ratio is the artifact.

Writes SCALING_r{N}.json: {device_counts, mpix_s, efficiency, mode, notes}.

Usage: python scripts/scaling_bench.py [--out SCALING_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force the virtual CPU mesh BEFORE jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/gsrast_scaling_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from gsrast_tpu import Camera, RenderConfig, random_scene
    from gsrast_tpu.camera import look_at
    from gsrast_tpu.parallel.mesh import make_mesh
    from gsrast_tpu.parallel.sharded import (pad_gaussians,
                                             render_primitive_sharded,
                                             render_tile_sharded)

    cfg = RenderConfig(backend="xla", max_per_tile=2048, tile_chunk=4,
                       intersect_capacity_factor=8.0)
    scene = random_scene(jax.random.PRNGKey(0), args.n, sh_degree=1,
                         isotropic=False, scale_range=(0.004, 0.015))
    act = scene.activated()
    camera = Camera(
        view=look_at(jnp.array([0.0, 0.0, -2.5]), jnp.zeros(3)),
        fov_x=jnp.float32(1.2), fov_y=jnp.float32(1.0),
        width=args.width, height=args.height,
    )
    pixels = args.width * args.height
    counts = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    result = {"device_counts": counts, "pixels": pixels,
              "n_gaussians": args.n, "modes": {}}

    for mode in ("tile", "primitive"):
        mpix = []
        for d in counts:
            mesh = make_mesh((1, d), jax.devices()[:d])
            if mode == "tile":
                def loss(means, act=act, mesh=mesh):
                    out = render_tile_sharded(
                        act.replace(means=means), camera, cfg, mesh)
                    return jnp.mean(out.image)
                g = jax.jit(jax.grad(loss))
                dt = timeit(g, act.means, iters=args.iters)
            else:
                pact = pad_gaussians(act, d)
                def loss(means, pact=pact, mesh=mesh):
                    out = render_primitive_sharded(
                        pact.replace(means=means), camera, cfg, mesh)
                    return jnp.mean(out.image)
                g = jax.jit(jax.grad(loss))
                dt = timeit(g, pact.means, iters=args.iters)
            mpix.append(pixels / dt / 1e6)
            print(f"{mode:9s} D={d}: {dt*1e3:8.1f} ms  "
                  f"{mpix[-1]:6.2f} Mpix/s", flush=True)
        eff = [m / (mpix[0] * d) for m, d in zip(mpix, counts)]
        result["modes"][mode] = {
            "mpix_s": [round(m, 3) for m in mpix],
            "efficiency_vs_1dev": [round(e, 3) for e in eff],
        }

    result["notes"] = (
        "virtual 8-device CPU mesh (one real TPU chip available); ratios "
        "exercise the real sharded paths fwd+bwd; absolute values are CPU. "
        "Virtual devices SHARE host cores, so ideal scaling here is flat "
        "Mpix/s (efficiency ~ 1/D); efficiency_vs_1dev ABOVE 1/D means the "
        "sharded path does less total work than D single-device renders."
    )
    out_path = args.out or "SCALING_r03.json"
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
