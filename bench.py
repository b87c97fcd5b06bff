"""Benchmark: Mpixels/s/chip forward+backward at 1080p, 1M Gaussians.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
driver (BASELINE.json north-star metric). The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against the driver-set target
rather than a reference measurement.

Usage: python bench.py [--small] [--fwd-only] [--backend pallas|xla]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: 1080p/1M jits take minutes to compile; cache
# across runs so the driver's bench invocation measures steps, not XLA.
jax.config.update("jax_compilation_cache_dir", "/tmp/gsrast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="100k gaussians at 800x800 (BASELINE config 2)")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--backend", default=None, choices=["pallas", "xla"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from gsrast_tpu import Camera, RenderConfig, random_scene
    from gsrast_tpu.camera import look_at
    from gsrast_tpu.render.api import render
    from gsrast_tpu.scene.gaussians import merge_params, split_params

    on_tpu = jax.default_backend() == "tpu"
    backend = args.backend or ("pallas" if on_tpu else "xla")

    if args.small:
        n, width, height, sh = 100_000, 800, 800, 3
    else:
        n, width, height, sh = 1_000_000, 1920, 1080, 3

    cfg = RenderConfig(
        backend=backend,
        intersect_capacity_factor=8.0,
        max_per_tile=4096,
        tile_chunk=8,
    )
    scene = random_scene(
        jax.random.PRNGKey(0), n, sh_degree=sh, isotropic=False,
        scale_range=(0.002, 0.008),
    )
    camera = Camera(
        view=look_at(jnp.array([0.0, 0.0, -2.5]), jnp.zeros(3)),
        fov_x=jnp.float32(1.2), fov_y=jnp.float32(1.0),
        width=width, height=height,
    )
    params, mask = split_params(scene)

    # mask/camera enter as ARGUMENTS, not closure constants: lowering a
    # closed-over device array into the HLO as a constant forces a
    # device->host fetch, which stalls over the axon TPU tunnel.
    if args.fwd_only:
        @jax.jit
        def step(params, mask):
            scene = merge_params(params, mask)
            return render(scene.activated(), camera, cfg).image
    else:
        @jax.jit
        def step(params, mask):
            def loss(p):
                s = merge_params(p, mask)
                img = render(s.activated(), camera, cfg).image
                return jnp.mean(img * img)

            return jax.grad(loss)(params)

    # Warmup/compile.
    out = step(params, mask)
    jax.block_until_ready(out)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = step(params, mask)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mpix_s = width * height / dt / 1e6

    if args.verbose:
        print(
            f"# backend={backend} n={n} {width}x{height} "
            f"fwd{'_only' if args.fwd_only else '+bwd'} "
            f"best={dt*1e3:.2f}ms mean={sum(times)/len(times)*1e3:.2f}ms",
            file=sys.stderr,
        )

    # No published reference numbers exist (BASELINE.md); compare against the
    # driver target of real-time-class training throughput: we normalize to
    # 60 Mpixels/s (≈30 fwd+bwd steps/s at 1080p) as baseline 1.0.
    target = 60.0
    print(json.dumps({
        "metric": "mpixels_per_s_per_chip_fwd_bwd_1080p_1m",
        "value": round(mpix_s, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(mpix_s / target, 4),
    }))


if __name__ == "__main__":
    main()
