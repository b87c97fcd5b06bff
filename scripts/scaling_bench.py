"""Scaling-efficiency harness: pixels/s vs device count on the virtual mesh.

BASELINE.json's north star demands >=70% pixels/s scaling efficiency from
1 chip to N. Only ONE real TPU chip is reachable in this environment, so this
harness measures the SHAPE of the scaling curve on the 8-virtual-device CPU
mesh (the same XLA_FLAGS mechanism the tests use): it exercises the real
sharded code paths (tile-sharded and primitive-sharded, forward+backward) and
exposes the overheads that would gate real scaling — per-device binning
redundancy, collective volume, tile-load imbalance. Absolute CPU numbers are
meaningless; the per-device efficiency ratio is the artifact.

r4 (VERDICT r3 #2/#3): representative scale (200k gaussians, 1024x512), the
PALLAS kernels in the sharded step (interpret mode on CPU), the fused
multi-tier binning with device-scaled tiers, and a per-stage decomposition
(prep / binning / pack+route / blend, per D) so the curve's shape is
explained, not just recorded.

Writes SCALING_r{N}.json.

Usage: python scripts/scaling_bench.py [--out SCALING_r04.json] [--quick]
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


def _exchange_setup(cfg, d, n_pad, interleave=True):
    """Mirror render_tile_sharded's r5 tiers-branch statics: device-scaled
    tier spec + relevance-exchange send budget."""
    from gsrast_tpu.ops import binning as binning_ops

    tiers_d = binning_ops.shard_tiers(cfg.tiers, d if interleave else 1)
    if d > 1:
        nl = n_pad // d
        c_send = max(128, -(-min(nl, -(-6 * nl // d)) // 128) * 128)
        tiers_d = tuple(
            (k, min(1.0, f * n_pad / (d * c_send))) for k, f in tiers_d)
    else:
        c_send = None
    return cfg.replace(tiers=tiers_d), c_send


def stage_decomposition(act, camera, cfg, mesh, d, iters):
    """Per-stage fwd ms on the tile-sharded fused path at D devices: prep
    (sharded preprocess + relevance exchange at d>1), binning (plan_tiers
    over the received set), pack+blend. Stages are timed as growing
    prefixes of the shard_fn under shard_map, so each includes its
    predecessors; the table reports the diffs."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from gsrast_tpu.ops import binning as binning_ops
    from gsrast_tpu.parallel.mesh import TILE_AXIS
    from gsrast_tpu.parallel.sharded import (_local_tiles_fused,
                                             _relevance_exchange,
                                             _sharded_prep,
                                             _rows_per_device)

    grid_h, grid_w = cfg.grid_shape(camera.height, camera.width)
    rpd = _rows_per_device(grid_h, d)
    cfg_d, c_send = _exchange_setup(cfg, d, act.means.shape[0])

    def make(stage):
        def shard_fn(g):
            dd = jax.lax.axis_index(TILE_AXIS)
            row0 = dd
            if d > 1:
                prep, _ovf = _relevance_exchange(
                    g, camera, cfg, d, TILE_AXIS, rpd, True, c_send)
            else:
                prep = _sharded_prep(g, camera, cfg, d, TILE_AXIS)
            if stage == "prep":
                return jnp.sum(prep.mean2d)[None]
            plan = binning_ops.plan_tiers(
                jax.lax.stop_gradient(prep), grid_h, grid_w, cfg_d,
                num_local_rows=rpd, row0=row0, row_stride=d)
            if stage == "binning":
                return (jnp.sum(plan.tile_key) + jnp.sum(plan.total))[
                    None].astype(jnp.float32)
            tiles_rgb, ft, nc, stats = _local_tiles_fused(
                prep, cfg, cfg_d, grid_h, grid_w, rpd, row0, d, cfg.backend)
            return jnp.sum(tiles_rgb)[None]

        return jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(), act),),
            out_specs=P(TILE_AXIS), check_rep=False))

    out = {}
    prev = 0.0
    for stage in ("prep", "binning", "blend"):
        t = timeit(make(stage), act, iters=iters) * 1e3
        out[stage] = round(t - prev, 1)
        prev = t
    return out


def share_control(act, camera, cfg, d, iters):
    """The de-confounded per-device IDEAL (VERDICT r4 #8): ONE device doing
    exactly one device's share of the work with zero communication — prep of
    N/D gaussians (fwd+bwd) + plan/pack/blend of device-0's interleaved row
    share over the full gaussian set (fwd+bwd). Perfect D-way scaling would
    hit this time per step, so efficiency = control / measured <= 1 by
    construction (no more interpret-mode-threading free lunch)."""
    import jax

    from gsrast_tpu.ops import binning as binning_ops
    from gsrast_tpu.ops.preprocess import preprocess
    from gsrast_tpu.render import pallas_pipeline as pp
    from gsrast_tpu.parallel.sharded import _rows_per_device

    grid_h, grid_w = cfg.grid_shape(camera.height, camera.width)
    rpd = _rows_per_device(grid_h, d)
    tpd = rpd * grid_w
    cfg_d, _ = _exchange_setup(cfg, d, act.means.shape[0])
    n = act.means.shape[0]
    nl = n // d
    act_slice = jax.tree.map(lambda x: x[:nl], act)
    afloats = {k: getattr(act_slice, k)
               for k in ("means", "scales", "quats", "opacities", "sh")}

    def prep_loss(floats):
        p = preprocess(act_slice.replace(**floats), camera, cfg)
        return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.color)
                + jnp.sum(p.opacity))

    t_prep = timeit(jax.jit(jax.grad(prep_loss)), afloats, iters=iters)

    prep_full = jax.jit(lambda a: preprocess(a, camera, cfg))(act)
    jax.block_until_ready(prep_full)
    pfloats = {k: getattr(prep_full, k)
               for k in ("mean2d", "conic", "color", "opacity")}

    def rest_loss(pfl, prep):
        p2 = prep._replace(**pfl)
        plan = binning_ops.plan_tiers(
            jax.lax.stop_gradient(p2), grid_h, grid_w, cfg_d,
            num_local_rows=rpd, row0=0, row_stride=d)
        feat, ts = pp.fused_pack(
            pp.feature_rows(p2), plan.tile_key, plan.depth_key, plan.slot,
            plan.gauss, plan.order, cfg_d.tiers, n, tpd)
        if cfg.backend == "pallas":
            rgb, ft, nc = pp._blend(
                feat, ts, jnp.array([0, d], jnp.int32), grid_h, grid_w,
                cfg.tile_h, cfg.tile_w, pp._use_interpret(), tpd)
            return jnp.sum(rgb) + jnp.sum(ft)
        return jnp.sum(feat)

    t_rest = timeit(jax.jit(jax.grad(rest_loss)), pfloats, prep_full,
                    iters=iters)
    return t_prep + t_rest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r04.json")
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="20k/512x256 (the r3 scale) for fast checks")
    args = ap.parse_args()
    if args.quick:
        args.n, args.width, args.height = 20_000, 512, 256

    from gsrast_tpu import Camera, RenderConfig, random_scene
    from gsrast_tpu.camera import look_at
    from gsrast_tpu.parallel.mesh import make_mesh
    from gsrast_tpu.parallel.sharded import (pad_gaussians,
                                             render_primitive_sharded,
                                             render_tile_sharded)

    from gsrast_tpu.render.api import auto_render_config

    scene = random_scene(jax.random.PRNGKey(0), args.n, sh_degree=1,
                         isotropic=False, scale_range=(0.004, 0.015))
    act = scene.activated()
    camera = Camera(
        view=look_at(jnp.array([0.0, 0.0, -2.5]), jnp.zeros(3)),
        fov_x=jnp.float32(1.2), fov_y=jnp.float32(1.0),
        width=args.width, height=args.height,
    )
    # Pallas kernels (interpret on CPU) + fused multi-tier binning derived
    # by the product auto-config (r5): the exact hot path the real chip
    # runs, at representative scale. The r5 primitive path bins by the same
    # tier grid (dest-prefixed route keys), so both modes use cfg.tiers.
    cfg = auto_render_config(scene, camera, "pallas").replace(
        max_per_tile=4096, tile_chunk=4, intersect_capacity_factor=8.0)
    cfg_prim = cfg
    pixels = args.width * args.height
    counts = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    import os as _os

    result = {"device_counts": counts, "pixels": pixels,
              "n_gaussians": args.n, "backend": "pallas(interpret)+fused",
              "host_cores": _os.cpu_count(),
              "modes": {}, "stages_tile_fwd_ms": {},
              "share_control_ms": {}}

    # De-confounded per-device ideal (VERDICT r4 #8): one device doing one
    # device's exact share (prep N/D + its interleaved rows) with zero comm.
    controls = {}
    for d in counts:
        controls[d] = share_control(act, camera, cfg, d, args.iters) * 1e3
        result["share_control_ms"][str(d)] = round(controls[d], 1)
        print(f"control   D={d}: {controls[d]:8.1f} ms (per-device share)",
              flush=True)

    for mode in ("tile", "primitive"):
        mpix, times = [], []
        for d in counts:
            mesh = make_mesh((1, d), jax.devices()[:d])
            if mode == "tile":
                def loss(means, act=act, mesh=mesh):
                    out = render_tile_sharded(
                        act.replace(means=means), camera, cfg, mesh)
                    return jnp.mean(out.image)
                g = jax.jit(jax.grad(loss))
                dt = timeit(g, act.means, iters=args.iters)
                result["stages_tile_fwd_ms"][str(d)] = stage_decomposition(
                    act, camera, cfg, mesh, d, args.iters)
            else:
                pact = pad_gaussians(act, d)
                def loss(means, pact=pact, mesh=mesh):
                    out = render_primitive_sharded(
                        pact.replace(means=means), camera, cfg_prim, mesh)
                    return jnp.mean(out.image)
                g = jax.jit(jax.grad(loss))
                dt = timeit(g, pact.means, iters=args.iters)
            times.append(dt * 1e3)
            mpix.append(pixels / dt / 1e6)
            print(f"{mode:9s} D={d}: {dt*1e3:8.1f} ms  "
                  f"{mpix[-1]:6.2f} Mpix/s", flush=True)
        eff = [m / (mpix[0] * d) for m, d in zip(mpix, counts)]
        rel = [e * d for e, d in zip(eff, counts)]  # vs ideal-flat 1/D
        # Defensible efficiency: share-control / measured, <= ~1 by
        # construction (the control is the same compute with zero comm).
        eff_ctl = [controls[d] / t for d, t in zip(counts, times)]
        result["modes"][mode] = {
            "step_ms": [round(t, 1) for t in times],
            "mpix_s": [round(m, 3) for m in mpix],
            "efficiency_vs_1dev": [round(e, 3) for e in eff],
            "vs_ideal_flat": [round(r, 3) for r in rel],
            "efficiency_vs_share_control": [round(e, 3) for e in eff_ctl],
        }

    result["notes"] = (
        "virtual 8-device CPU mesh (one real TPU chip available); ratios "
        "exercise the real sharded paths fwd+bwd with the PALLAS kernels "
        "(interpret mode), the fused multi-tier binning, and (r5) the "
        "relevance exchange + tier-grid primitive routing. "
        "efficiency_vs_share_control is the defensible number (VERDICT r4 "
        "#8): measured step time vs the SAME per-device share computed on "
        "one device with zero communication — it cannot exceed ~1.0 by "
        "interpret-mode threading artifacts the way vs_ideal_flat could "
        "(both are still reported for comparability with r3/r4). "
        "stages_tile_fwd_ms decomposes the tile-mode forward per D "
        "(prefix-timed; entries are stage deltas)."
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
