"""Tile binning: duplicate-with-keys, global sort, tile range extraction.

TPU-native replacement for the reference's binning pipeline
(/root/reference/apps/gsrast/gscuda/GSCuda.cu:422-538, 771-801):

  reference (CUDA)                        this module (XLA on TPU)
  --------------------------------        --------------------------------
  cub InclusiveSum(tilesTouched)          (folded into the sort below)
  numRendered readback sizes buffer       static capacity + overflow counters
  duplicateWithKeys (scatter at offset)   full (N, K) slot grid built
                                          ELEMENTWISE (zero gathers); invalid
                                          slots get sentinel keys
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
  (no backward pass in reference)         the feature-pack VJP inverts the
                                          sort permutation (second structure
                                          sort, run lazily ONLY when
                                          differentiating) so cotangents
                                          route back to (n, k) slots with a
                                          GATHER + K-sum — no TPU scatter
                                          anywhere in the training step

Why a static (N, K) grid and not a compacted variable-length expansion
(measured on TPU v5e, r3): TPU scatters serialize (~50M updates/s), random
gathers run at ~100M rows/s, `jnp.searchsorted` at large query counts runs at
~5M queries/s, while `lax.sort` moves ~350M operand-elements/s. The grid
builds every key ELEMENTWISE from per-Gaussian arrays (no gathers at all) and
lets one sort both compact (sentinels sink past the capacity truncation) and
order. A searchsorted-based expansion sized by the true intersection count
was tried and was 10x slower at the binning stage (1.75s vs ~150ms at
1M/1080p) — the binary search alone dominates. K is a *counted* forward cap
(overflow_tile_cap, no silent drops); callers size it per scene
(RenderConfig.max_tiles_per_gaussian; the bench scene's true max is 16).

Tile ownership across devices is BY TILE ROW: a device owns tile rows
{row0 + r * row_stride}. Row ownership keeps the owned-tile count of a
clipped rect a closed-form product (rows_owned * rect_width), so the sharded
path enumerates *only its own* intersections — enumerate-then-filter would
waste a D-fold slice of the grid on foreign tiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import config as cfg
from . import projection
from .preprocess import Preprocessed


class Binning(NamedTuple):
    sorted_tile: jax.Array    # (C,) int32; sentinel = num_local_tiles
    sorted_gauss: jax.Array   # (C,) int32 gaussian index; -1 for dead slots
    sorted_slot: jax.Array    # (max(N*K, C),) int32 full sort payload: flat
                              # (n, k) slot per sorted position. The feature
                              # pack's VJP inverts it lazily; positions >= C
                              # were dropped by the capacity truncation.
    tile_starts: jax.Array    # (T+1,) int32 half-open ranges per local tile
    num_intersections: jax.Array  # scalar int32 (actually written, <= C)
    overflow_capacity: jax.Array  # scalar int32: intersections dropped (C full)
    overflow_tile_cap: jax.Array  # scalar int32: owned tiles beyond K dropped
                                  # (counted, never silent)


def owned_row_range(y_min, y_max, row0, row_stride: int, num_rows: int):
    """Rows {row0 + r*row_stride : 0 <= r < num_rows} ∩ [y_min, y_max) as
    (first owned row y0, count). Closed-form — this is why ownership is by
    row: the owned-tile count of a rect stays `rows * rect_width`."""
    y_lo = jnp.maximum(y_min, row0)
    y_hi = jnp.minimum(y_max, row0 + num_rows * row_stride)
    y0 = y_lo + (row0 - y_lo) % row_stride
    nrows = jnp.maximum(0, (y_hi - y0 + row_stride - 1) // row_stride)
    return y0, nrows


def expand_intersections(counts: jax.Array, capacity: int):
    """Variable-length expansion: slot j of [0, capacity) -> (gaussian i,
    within-gaussian ordinal k) via one vectorized binary search — the
    duplicateWithKeys analog (GSCuda.cu:422-475) without a scatter.

    Exact (no per-Gaussian cap), but `searchsorted` throughput on TPU
    (~5M queries/s measured) makes it CPU/small-scale only: the sharded
    paths' routing (tests, virtual meshes) use it; the single-chip hot path
    uses the elementwise (N, K) grid in build_binning instead.

    Returns (i (C,), k (C,), offsets (N,), total scalar)."""
    offsets = jnp.cumsum(counts) - counts  # exclusive scan, (N,)
    total = offsets[-1] + counts[-1]
    j = jnp.arange(capacity, dtype=jnp.int32)
    i = (
        jnp.searchsorted(offsets, j, side="right", method="scan_unrolled")
        .astype(jnp.int32)
        - 1
    )
    i = jnp.maximum(i, 0)
    k = j - offsets[i]
    return i, k, offsets.astype(jnp.int32), total.astype(jnp.int32)


def build_binning(
    prep: Preprocessed,
    grid_h: int,
    grid_w: int,
    render_cfg: cfg.RenderConfig,
    capacity: int,
    num_local_rows: int | None = None,
    row0=0,
    row_stride: int = 1,
) -> Binning:
    """Bin Gaussians into (tile | depth)-sorted intersection lists.

    When `num_local_rows`/`row0` are given, only tile rows
    {row0 + r * row_stride : 0 <= r < num_local_rows} are binned and tile ids
    in the result are LOCAL (r * grid_w + x) — this is the tile-sharded
    multi-chip path (SURVEY.md §2.5). `row_stride > 1` interleaves row
    ownership round-robin across devices (device d of D owns rows
    {d, d+D, ...}) so screen-space load concentrations spread evenly.
    """
    if num_local_rows is None:
        num_local_rows = grid_h
        row0 = jnp.int32(0)
    row0 = jnp.asarray(row0, jnp.int32)
    num_local_tiles = num_local_rows * grid_w
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

    rect = prep.rect
    rw = rect.x_max - rect.x_min
    rw_safe = jnp.maximum(rw, 1)
    y0, nrows = owned_row_range(
        rect.y_min, rect.y_max, row0, row_stride, num_local_rows
    )
    rho0 = (y0 - row0) // row_stride  # first owned LOCAL row
    counts_full = jnp.where(prep.radius > 0, nrows * rw, 0).astype(jnp.int32)
    counts = jnp.minimum(counts_full, k_max)

    # Positive-float bitcast is order-preserving (GSCuda.cu:465-471); keep
    # the top `depth_bits` bits. Ordering of depths within ~2^-(depth_bits-9)
    # relative falls back to slot order — invisible in the blend, and both
    # backends consume the same binning so they stay bit-identical.
    dshift = 31 - depth_bits
    depth_q = projection.depth_order_key(prep.depth) >> dshift  # (N,)

    # The (N, K) slot grid, built elementwise (no gathers): slot (i, k) is
    # the k-th owned tile of gaussian i, walking its owned rows row-major.
    ks = jnp.arange(k_max, dtype=jnp.int32)[None, :]  # (1, K)
    ry = ks // rw_safe[:, None]
    rx = ks - ry * rw_safe[:, None]
    local = (rho0[:, None] + ry) * grid_w + rect.x_min[:, None] + rx
    valid = ks < counts[:, None]  # (N, K)

    key = jnp.where(
        valid, (local << depth_bits) | depth_q[:, None], imax
    ).reshape(-1)
    slot = jnp.arange(nk, dtype=jnp.int32)
    total = jnp.sum(counts, dtype=jnp.int32)

    if nk < capacity:  # static: pad so truncation is a no-op
        pad = capacity - nk
        key = jnp.concatenate([key, jnp.full((pad,), imax, jnp.int32)])
        slot = jnp.concatenate([slot, jnp.full((pad,), nk, jnp.int32)])

    # Stable single-key sort: payload (slot) ascending breaks ties, so the
    # result is fully deterministic. Sentinel keys sink to the end, so the
    # truncation to capacity keeps every real intersection (when it doesn't,
    # the drop is counted in overflow_capacity).
    sorted_key, sorted_slot = jax.lax.sort(
        (key, slot), dimension=0, num_keys=1, is_stable=True
    )

    sorted_key_c = sorted_key[:capacity]
    is_real = sorted_key_c != imax
    sorted_gauss = jnp.where(is_real, sorted_slot[:capacity] // k_max, -1)
    sorted_tile = jnp.minimum(
        sorted_key_c >> depth_bits, jnp.int32(num_local_tiles)
    )
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(num_local_tiles + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    written = jnp.minimum(total, capacity)
    return Binning(
        sorted_tile=sorted_tile,
        sorted_gauss=sorted_gauss,
        sorted_slot=sorted_slot,
        tile_starts=tile_starts,
        num_intersections=written.astype(jnp.int32),
        overflow_capacity=jnp.maximum(total - capacity, 0).astype(jnp.int32),
        overflow_tile_cap=jnp.sum(counts_full - counts).astype(jnp.int32),
    )
