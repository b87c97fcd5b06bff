"""Tile binning: duplicate-with-keys, global sort, tile range extraction.

TPU-native replacement for the reference's binning pipeline
(/root/reference/apps/gsrast/gscuda/GSCuda.cu:422-538, 771-801):

  reference (CUDA)                        this module (XLA on TPU)
  --------------------------------        --------------------------------
  cub InclusiveSum(tilesTouched)          jnp.cumsum
  numRendered readback sizes buffer       static capacity + overflow counters
  duplicateWithKeys (scatter at offset)   fori over per-Gaussian tile slots,
                                          vector scatter with drop semantics
  cub RadixSort of tile<<32|depthbits     lax.sort on (tile, depth_bits) with
                                          num_keys=2 (exact same ordering:
                                          positive-float bits are monotone)
  identifyTileRanges                      searchsorted over the sorted tiles

The reference sizes its binning buffer with a device->host readback of the
scanned total (GSCuda.cu:771-784) — a dynamic shape XLA cannot express; we
use a static capacity with *counted* overflow instead (no silent caps).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import config as cfg
from . import projection
from .preprocess import Preprocessed


class Binning(NamedTuple):
    sorted_tile: jax.Array    # (C,) int32; sentinel = num_tiles for unused slots
    sorted_gauss: jax.Array   # (C,) int32 payload; -1 for unused slots
    tile_starts: jax.Array    # (T+1,) int32 half-open ranges per tile
    num_intersections: jax.Array  # scalar int32 (actually written, <= C)
    overflow_capacity: jax.Array  # scalar int32: intersections dropped (C full)
    overflow_tile_cap: jax.Array  # scalar int32: dropped by max_tiles_per_gaussian


def build_binning(
    prep: Preprocessed,
    grid_h: int,
    grid_w: int,
    render_cfg: cfg.RenderConfig,
    capacity: int,
    num_local_tiles: int | None = None,
    tile_lo=None,
) -> Binning:
    """Bin Gaussians into (tile | depth)-sorted intersection lists.

    When `num_local_tiles`/`tile_lo` are given, only tiles in
    [tile_lo, tile_lo + num_local_tiles) are binned and tile ids in the
    result are LOCAL (tile - tile_lo) — this is the tile-sharded multi-chip
    path (SURVEY.md §2.5: each device owns a contiguous tile range).
    """
    num_tiles = grid_h * grid_w
    if num_local_tiles is None:
        num_local_tiles = num_tiles
        tile_lo = jnp.int32(0)
    tile_lo = jnp.asarray(tile_lo, jnp.int32)
    k_max = render_cfg.max_tiles_per_gaussian
    n = prep.depth.shape[0]

    tiles = prep.tiles_touched
    tiles_capped = jnp.minimum(tiles, k_max)
    offsets = jnp.cumsum(tiles_capped) - tiles_capped  # exclusive scan

    depth_key_all = projection.depth_order_key(prep.depth)
    rect = prep.rect
    rw = jnp.maximum(rect.x_max - rect.x_min, 1)

    sentinel = jnp.int32(num_local_tiles)
    tile_key = jnp.full((capacity,), sentinel, jnp.int32)
    depth_key = jnp.full((capacity,), jnp.iinfo(jnp.int32).max, jnp.int32)
    gauss = jnp.full((capacity,), -1, jnp.int32)

    # When sharded, each device only materializes its own tiles' keys; slots
    # for other devices' tiles are compacted away *before* the scatter so the
    # local capacity can be ~1/D of the global one. We do that by giving every
    # (gaussian, k) pair a local destination computed from a per-gaussian
    # local-count scan.
    def local_tile_of(k):
        ry = k // rw
        rx = k - ry * rw
        tile = (rect.y_min + ry) * grid_w + (rect.x_min + rx)
        local = tile - tile_lo
        in_range = (local >= 0) & (local < num_local_tiles)
        return jnp.where(in_range, local, sentinel)

    # Count local intersections per gaussian for compact offsets.
    def count_body(k, acc):
        lt = local_tile_of(k)
        return acc + ((k < tiles_capped) & (lt < sentinel)).astype(jnp.int32)

    local_counts = jax.lax.fori_loop(
        0, k_max, count_body, jnp.zeros((n,), jnp.int32)
    )
    local_offsets = jnp.cumsum(local_counts) - local_counts
    total = local_offsets[-1] + local_counts[-1]

    def body(k, carry):
        tile_key, depth_key, gauss, cursor = carry
        lt = local_tile_of(k)
        valid = (k < tiles_capped) & (lt < sentinel)  # (N,)
        dest = jnp.where(valid, local_offsets + cursor, capacity)
        tile_key = tile_key.at[dest].set(lt, mode="drop")
        depth_key = depth_key.at[dest].set(depth_key_all, mode="drop")
        gauss = gauss.at[dest].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )
        return tile_key, depth_key, gauss, cursor + valid.astype(jnp.int32)

    tile_key, depth_key, gauss, _ = jax.lax.fori_loop(
        0, k_max, body,
        (tile_key, depth_key, gauss, jnp.zeros((n,), jnp.int32)),
    )

    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile_key, depth_key, gauss), dimension=0, num_keys=2, is_stable=True
    )
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(num_local_tiles + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    written = jnp.minimum(total, capacity)
    return Binning(
        sorted_tile=sorted_tile,
        sorted_gauss=sorted_gauss,
        tile_starts=tile_starts,
        num_intersections=written.astype(jnp.int32),
        overflow_capacity=jnp.maximum(total - capacity, 0).astype(jnp.int32),
        overflow_tile_cap=jnp.sum(tiles - tiles_capped).astype(jnp.int32),
    )
