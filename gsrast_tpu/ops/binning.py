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
  cub RadixSort of tile<<32|depthbits     ONE lax.sort of a single packed
                                          int32 key `tile << depth_bits |
                                          depth_top_bits` with the flat slot
                                          index as payload (the reference
                                          packs tile|depth into 64 bits the
                                          same way, GSCuda.cu:461-474; we
                                          budget 31 bits: full-precision
                                          depth ordering within ~2^-16
                                          relative, ties broken by slot)
  identifyTileRanges                      searchsorted over the sorted tiles
  (no backward pass in reference)         a SECOND structure sort inverts
                                          the permutation so the feature
                                          pack's VJP is a pure gather -- no
                                          TPU scatter anywhere in the
                                          training step

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
    inv_pos: jax.Array        # (N*K,) int32: sorted position of slot (n, k);
                              # >= C means the slot was dropped by capacity
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
    tile_stride: int = 1,
) -> Binning:
    """Bin Gaussians into (tile | depth)-sorted intersection lists.

    When `num_local_tiles`/`tile_lo` are given, only tiles
    {tile_lo + j * tile_stride : 0 <= j < num_local_tiles} are binned and
    tile ids in the result are LOCAL (j) — this is the tile-sharded
    multi-chip path (SURVEY.md §2.5). `tile_stride > 1` interleaves tile
    ownership round-robin across devices (device d of D owns tiles
    {d, d+D, d+2D, ...}) so screen-space load concentrations spread evenly.
    """
    num_tiles = grid_h * grid_w
    if num_local_tiles is None:
        num_local_tiles = num_tiles
        tile_lo = jnp.int32(0)
    tile_lo = jnp.asarray(tile_lo, jnp.int32)
    k_max = render_cfg.max_tiles_per_gaussian
    n = prep.depth.shape[0]
    nk = n * k_max
    imax = jnp.iinfo(jnp.int32).max

    # Key layout: local_tile in the high bits, quantized depth order in the
    # low bits, 31 bits total (positive int32). +1 keeps the all-ones
    # sentinel pattern (imax >> depth_bits) strictly above every real tile id.
    tile_bits = (num_local_tiles + 1).bit_length()
    depth_bits = 31 - tile_bits
    assert depth_bits >= 12, (
        f"{num_local_tiles} tiles leaves only {depth_bits} depth bits; "
        "use a larger tile shape or shard the tile grid"
    )

    tiles = prep.tiles_touched
    tiles_capped = jnp.minimum(tiles, k_max)

    # Positive-float bitcast is order-preserving (GSCuda.cu:465-471); keep
    # the top `depth_bits` bits. Ordering of depths within ~2^-(depth_bits-9)
    # relative falls back to slot order — invisible in the blend, and both
    # backends consume the same binning so they stay bit-identical.
    dshift = 31 - depth_bits
    depth_q = projection.depth_order_key(prep.depth) >> dshift  # (N,)
    rect = prep.rect
    rw = jnp.maximum(rect.x_max - rect.x_min, 1)

    # TPU scatter ops serialize (~50M updates/s measured); sorts are ~3 orders
    # of magnitude faster per element. So instead of CUDA-style
    # scatter-at-offset compaction, the full (N, K) slot grid is materialized
    # and ONE sort both compacts (invalid slots carry sentinel keys that sink
    # to the end and fall off the truncation) and orders by (tile | depth).
    ks = jnp.arange(k_max, dtype=jnp.int32)[None, :]  # (1, K)
    ry = ks // rw[:, None]
    rx = ks - ry * rw[:, None]
    tile = (rect.y_min[:, None] + ry) * grid_w + (rect.x_min[:, None] + rx)
    if tile_stride == 1:
        local = tile - tile_lo
        owned = True
    else:
        off = tile - tile_lo
        local = off // tile_stride
        owned = off == local * tile_stride  # off >= 0 and divisible
    in_range = owned & (local >= 0) & (local < num_local_tiles)
    valid = (ks < tiles_capped[:, None]) & in_range  # (N, K)

    key = jnp.where(
        valid, (local << depth_bits) | depth_q[:, None], imax
    ).reshape(-1)
    slot = jnp.arange(nk, dtype=jnp.int32)
    total = jnp.sum(valid, dtype=jnp.int32)

    if nk < capacity:  # static: pad so truncation is a no-op
        pad = capacity - nk
        key = jnp.concatenate([key, jnp.full((pad,), imax, jnp.int32)])
        slot = jnp.concatenate([slot, jnp.full((pad,), nk, jnp.int32)])

    # Stable single-key sort: payload (slot) ascending breaks ties, so the
    # result is fully deterministic.
    sorted_key, sorted_slot = jax.lax.sort(
        (key, slot), dimension=0, num_keys=1, is_stable=True
    )

    # Invert the permutation with a second structure sort: position of every
    # slot in the sorted order. This is what lets the backward pass route
    # per-intersection gradients back to (n, k) with a GATHER instead of a
    # scatter-add (VERDICT r1: the scatter was ~half the backward wall time).
    pos = jnp.arange(sorted_slot.shape[0], dtype=jnp.int32)
    _, inv_pos = jax.lax.sort(
        (sorted_slot, pos), dimension=0, num_keys=1, is_stable=True
    )
    inv_pos = inv_pos[:nk]

    sorted_key = sorted_key[:capacity]
    sorted_slot = sorted_slot[:capacity]
    is_real = sorted_key != imax
    sorted_gauss = jnp.where(is_real, sorted_slot // k_max, -1)
    sorted_tile = jnp.minimum(
        sorted_key >> depth_bits, jnp.int32(num_local_tiles)
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
        inv_pos=inv_pos,
        num_intersections=written.astype(jnp.int32),
        overflow_capacity=jnp.maximum(total - capacity, 0).astype(jnp.int32),
        overflow_tile_cap=jnp.sum(tiles - tiles_capped).astype(jnp.int32),
    )
