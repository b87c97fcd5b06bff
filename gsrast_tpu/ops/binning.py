"""Tile binning: duplicate-with-keys, global sort, tile range extraction.

TPU-native replacement for the reference's binning pipeline
(/root/reference/apps/gsrast/gscuda/GSCuda.cu:422-538, 771-801):

  reference (CUDA)                        this module (XLA on TPU)
  --------------------------------        --------------------------------
  cub InclusiveSum(tilesTouched)          (folded into the sort below)
  numRendered readback sizes buffer       static capacity + overflow counters
  duplicateWithKeys (scatter at offset)   full (N, K) slot grid; invalid
                                          slots get sentinel keys (TPU
                                          scatters serialize ~50M updates/s;
                                          sorts are ~1000x faster/element,
                                          so ONE sort compacts AND orders)
  cub RadixSort of tile<<32|depthbits     the same lax.sort, keys
                                          (tile, depth_bits), num_keys=2
                                          (exact same ordering: positive-
                                          float bits are monotone)
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

    depth_key_all = projection.depth_order_key(prep.depth)
    rect = prep.rect
    rw = jnp.maximum(rect.x_max - rect.x_min, 1)

    sentinel = jnp.int32(num_local_tiles)

    # TPU scatter ops serialize (~50M updates/s measured); sorts are ~3 orders
    # of magnitude faster per element (lax.sort of 800k 2-key keys: 0.35 ms).
    # So instead of CUDA-style scatter-at-offset compaction, the full (N, K)
    # slot grid is materialized and ONE sort both compacts (invalid slots
    # carry sentinel keys that sink to the end and fall off the truncation)
    # and orders by (tile | depth). Memory: 3 int32 (N, K) arrays — keep
    # max_tiles_per_gaussian modest at large N (16 at N=1M is 192 MB).
    ks = jnp.arange(k_max, dtype=jnp.int32)[None, :]  # (1, K)
    ry = ks // rw[:, None]
    rx = ks - ry * rw[:, None]
    tile = (rect.y_min[:, None] + ry) * grid_w + (rect.x_min[:, None] + rx)
    local = tile - tile_lo
    in_range = (local >= 0) & (local < num_local_tiles)
    valid = (ks < tiles_capped[:, None]) & in_range  # (N, K)

    tile_key = jnp.where(valid, local, sentinel).reshape(-1)
    depth_key = jnp.where(
        valid, depth_key_all[:, None], jnp.iinfo(jnp.int32).max
    ).reshape(-1)
    gauss = jnp.where(
        valid, jnp.arange(n, dtype=jnp.int32)[:, None], -1
    ).reshape(-1)
    total = jnp.sum(valid, dtype=jnp.int32)

    if tile_key.shape[0] < capacity:  # static: pad so truncation is a no-op
        pad = capacity - tile_key.shape[0]
        tile_key = jnp.concatenate(
            [tile_key, jnp.full((pad,), sentinel, jnp.int32)])
        depth_key = jnp.concatenate(
            [depth_key, jnp.full((pad,), jnp.iinfo(jnp.int32).max, jnp.int32)])
        gauss = jnp.concatenate([gauss, jnp.full((pad,), -1, jnp.int32)])

    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile_key, depth_key, gauss), dimension=0, num_keys=2, is_stable=True
    )
    sorted_tile = sorted_tile[:capacity]
    sorted_gauss = sorted_gauss[:capacity]
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
