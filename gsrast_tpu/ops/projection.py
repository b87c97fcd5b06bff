"""Point projection, frustum culling, and tile-rect computation.

Re-derives the geometry stages of the reference preprocess kernel
(/root/reference/apps/gsrast/gscuda/GSCuda.cu:261-375) as batched pure
functions: world -> camera -> NDC -> pixel, the near/NDC frustum cull
(GSCuda.cu:302-309), and the covered-tile rectangle over the tile grid
(GSCuda.cu:237-259, 343-355).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import config as cfg


_HI = jax.lax.Precision.HIGHEST  # platform default is bf16-pass matmul


def to_camera(means: jax.Array, view: jax.Array) -> jax.Array:
    """(N, 3) world points -> (N, 3) camera space (z = depth)."""
    return jnp.matmul(means, view[:3, :3].T, precision=_HI) + view[:3, 3]


def project(means: jax.Array, full_proj: jax.Array,
            width: int, height: int) -> Tuple[jax.Array, jax.Array]:
    """World points -> (pixel xy (N,2), ndc (N,3)).

    Pixel mapping ((ndc + 1) * size - 1) / 2 matches the reference's
    ndc2Pix (GSCuda.cu:318-327 via auxiliary helpers).
    """
    ones = jnp.ones_like(means[..., :1])
    hom = jnp.matmul(
        jnp.concatenate([means, ones], axis=-1), full_proj.T, precision=_HI
    )  # (N, 4)
    w = 1.0 / (hom[..., 3:4] + 1e-7)
    ndc = hom[..., :3] * w
    px = ((ndc[..., 0] + 1.0) * width - 1.0) * 0.5
    py = ((ndc[..., 1] + 1.0) * height - 1.0) * 0.5
    return jnp.stack([px, py], axis=-1), ndc


def in_frustum(depth: jax.Array, ndc: jax.Array) -> jax.Array:
    """Near-plane + margin-expanded NDC cull (reference GSCuda.cu:302-309:
    NDC within +-1.3 and z in [0, 1]; near cut at 0.2)."""
    m = cfg.NDC_CULL_MARGIN
    return (
        (depth > cfg.NEAR_CULL_DEPTH)
        & (ndc[..., 0] > -m) & (ndc[..., 0] < m)
        & (ndc[..., 1] > -m) & (ndc[..., 1] < m)
    )


class TileRect(NamedTuple):
    x_min: jax.Array  # inclusive, int32
    y_min: jax.Array
    x_max: jax.Array  # exclusive
    y_max: jax.Array

    def area(self) -> jax.Array:
        return jnp.maximum(self.x_max - self.x_min, 0) * jnp.maximum(
            self.y_max - self.y_min, 0
        )


def tile_rect(
    mean2d: jax.Array,
    radius: jax.Array,
    grid_h: int,
    grid_w: int,
    tile_h: int,
    tile_w: int,
    radius_y: jax.Array | None = None,
) -> TileRect:
    """Covered tile rectangle for a splat extending `radius` pixels in x and
    `radius_y` (default: `radius`) in y, centered at mean2d (reference
    getRect, GSCuda.cu:237-259; the reference also has an asymmetric
    per-axis rect path at GSCuda.cu:352-354 — per-axis extents are the tight
    axis-aligned bound of the support ellipse, a large cut for the elongated
    splats trained scenes are full of)."""
    if radius_y is None:
        radius_y = radius
    px, py = mean2d[..., 0], mean2d[..., 1]
    x_min = jnp.clip(((px - radius) / tile_w).astype(jnp.int32), 0, grid_w)
    y_min = jnp.clip(((py - radius_y) / tile_h).astype(jnp.int32), 0, grid_h)
    x_max = jnp.clip(jnp.ceil((px + radius + 1.0) / tile_w).astype(jnp.int32), 0, grid_w)
    y_max = jnp.clip(jnp.ceil((py + radius_y + 1.0) / tile_h).astype(jnp.int32), 0, grid_h)
    return TileRect(x_min, y_min, x_max, y_max)


def depth_order_key(depth: jax.Array) -> jax.Array:
    """Positive float32 depth -> int32 with the same ordering.

    The reference sorts on raw float bits inside a 64-bit (tile | depth) key
    (GSCuda.cu:461-474); for positive IEEE floats the bit pattern is
    monotone, so an int32 bitcast preserves order exactly.
    """
    return jax.lax.bitcast_convert_type(depth, jnp.int32)
