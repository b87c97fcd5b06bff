"""Tile-sorted renderer, Pallas fast path.

Same pipeline as render/tiled.py (the XLA oracle) but the per-tile blend runs
as hand-written Pallas TPU kernels with a custom VJP, exactly as the
reference's CUDA design pairs its forward `renderCUDA` with a (never-written)
backward (/root/reference/apps/gsrast/gscuda/GSCuda.cu:543-677; SURVEY.md
§2.3). The forward saves per-pixel final transmittance and last-contributor
index — the same residuals the reference stores (GSCuda.cu:669-676) — and the
backward replays the blend in reverse from them.

Differentiability layout:
  preprocess (XLA, autodiff)  ->  feature gather by sorted index (XLA gather;
  its VJP is the per-Gaussian scatter-add)  ->  blend (Pallas custom_vjp over
  per-intersection features)  ->  image assembly (XLA).
Binning is integer structure (stop_gradient), as in the reference where
gradients do not flow through the sort.

TPU alignment: every tile's intersection segment is padded to a multiple of
128 entries (see pad_segments) so kernel DMA slices are tiling-aligned; the
padding entries carry opacity 0 and are numerically inert.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..camera import Camera
from ..ops import binning as binning_ops
from ..ops.preprocess import preprocess
from ..scene.gaussians import ActivatedGaussians
from .dense import RenderOutput
from . import pallas_blend as pb
from .tiled import untile


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def pad_segments(
    binning: binning_ops.Binning, num_tiles: int, padded_capacity: int
) -> Tuple[jax.Array, jax.Array]:
    """Re-pack the sorted intersection list so every tile's segment starts at
    a multiple of CHUNK (=128). Returns (sorted_gauss_padded (C_pp,),
    tile_starts_padded (T+1,)). Padding slots hold gaussian -1.

    Scatter-free: a TPU scatter of C elements costs ~ms; instead, CHUNK
    filler entries per tile are appended (the j-th filler of tile t live iff
    j < pad_needed[t], dead fillers keyed past every real tile) and ONE merge
    sort of (C + T*CHUNK) = padded_capacity entries lands every filler at its
    tile's segment end. Position within the already-(tile|depth)-sorted input
    is the tiebreak key, so real entries keep their depth order."""
    starts = binning.tile_starts
    counts = starts[1:] - starts[:-1]
    pcounts = ((counts + pb.CHUNK - 1) // pb.CHUNK) * pb.CHUNK
    pstarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pcounts).astype(jnp.int32)]
    )
    c = binning.sorted_gauss.shape[0]
    imax = jnp.iinfo(jnp.int32).max

    fill_live = (
        jnp.arange(pb.CHUNK, dtype=jnp.int32)[None, :]
        < (pcounts - counts)[:, None]
    )  # (T, CHUNK)
    fill_tile = jnp.where(
        fill_live, jnp.arange(num_tiles, dtype=jnp.int32)[:, None], num_tiles
    ).reshape(-1)

    key_tile = jnp.concatenate([binning.sorted_tile, fill_tile])
    key_pos = jnp.concatenate(
        [jnp.arange(c, dtype=jnp.int32), jnp.full((num_tiles * pb.CHUNK,), imax)]
    )
    payload = jnp.concatenate(
        [binning.sorted_gauss, jnp.full((num_tiles * pb.CHUNK,), -1, jnp.int32)]
    )
    _, _, sg_padded = jax.lax.sort(
        (key_tile, key_pos, payload), dimension=0, num_keys=2, is_stable=False
    )
    assert sg_padded.shape[0] == padded_capacity, (
        sg_padded.shape, padded_capacity)
    return sg_padded, pstarts


def pack_features(prep, sorted_gauss: jax.Array) -> jax.Array:
    """Gather per-Gaussian screen state into depth-sorted per-intersection
    rows, packed 8 gaussians per 128-lane row: (C_pp // 8, 128).
    Differentiable: the VJP of the gather is the per-Gaussian scatter-add."""
    c = sorted_gauss.shape[0]
    n = prep.mean2d.shape[0]
    # Assemble (N, 16) once, then ONE row gather (a single contiguous-row
    # gather is several times faster than four separate column gathers on
    # TPU); dead slots (gauss -1) are zeroed wholesale, which makes them
    # numerically inert (opacity 0 -> alpha 0).
    feat_n = jnp.concatenate(
        [
            prep.mean2d,                             # 0:2
            prep.conic,                              # 2:5
            prep.opacity[:, None],                   # 5
            prep.color,                              # 6:9
            jnp.zeros((n, pb.NFEAT - 9), jnp.float32),
        ],
        axis=1,
    )
    gidx = jnp.maximum(sorted_gauss, 0)
    live = (sorted_gauss >= 0).astype(jnp.float32)[:, None]
    feat = feat_n[gidx] * live
    return feat.reshape(c // pb.GPR, pb.GPR * pb.NFEAT)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _blend(feat_packed, tile_starts, grid_h, grid_w, interpret):
    return pb.blend_forward(feat_packed, tile_starts, grid_h, grid_w, interpret)


def _blend_fwd(feat_packed, tile_starts, grid_h, grid_w, interpret):
    rgb, ft, nc = pb.blend_forward(
        feat_packed, tile_starts, grid_h, grid_w, interpret
    )
    return (rgb, ft, nc), (feat_packed, tile_starts, ft, nc)


def _blend_bwd(grid_h, grid_w, interpret, res, cots):
    feat_packed, tile_starts, ft, nc = res
    d_rgb, d_ft, _d_nc = cots  # n_contrib is integer output: no gradient
    dfeat = pb.blend_backward(
        feat_packed, tile_starts, ft, nc, d_rgb, d_ft, grid_h, grid_w,
        interpret,
    )
    # Rows past the last real segment are never written by any tile
    # (uninitialized output memory): zero them.
    row = jnp.arange(dfeat.shape[0], dtype=jnp.int32)
    dfeat = jnp.where((row < tile_starts[-1] // pb.GPR)[:, None], dfeat, 0.0)
    d_starts = np.zeros(tile_starts.shape, jax.dtypes.float0)
    return dfeat, d_starts


_blend.defvjp(_blend_fwd, _blend_bwd)


def render_tiled_pallas(
    gaussians: ActivatedGaussians,
    camera: Camera,
    render_cfg: cfg.RenderConfig = cfg.RenderConfig(),
    mean2d_delta=None,
) -> RenderOutput:
    if render_cfg.tile_h != pb.TILE_H or render_cfg.tile_w != pb.TILE_W:
        raise ValueError(
            f"pallas backend requires tile {pb.TILE_H}x{pb.TILE_W}, got "
            f"{render_cfg.tile_h}x{render_cfg.tile_w}"
        )
    grid_h, grid_w = render_cfg.grid_shape(camera.height, camera.width)
    num_tiles = grid_h * grid_w
    capacity = render_cfg.capacity(gaussians.means.shape[0])
    padded_capacity = capacity + pb.CHUNK * num_tiles
    interpret = _use_interpret()

    prep = preprocess(gaussians, camera, render_cfg, mean2d_delta)
    binning = binning_ops.build_binning(
        jax.lax.stop_gradient(prep), grid_h, grid_w, render_cfg, capacity
    )
    sg_padded, pstarts = pad_segments(binning, num_tiles, padded_capacity)
    feat_packed = pack_features(prep, sg_padded)
    rgb_tiles, ft_tiles, nc_tiles = _blend(
        feat_packed, pstarts, grid_h, grid_w, interpret
    )

    background = jnp.asarray(render_cfg.background, jnp.float32)
    tiles_pix = jnp.moveaxis(rgb_tiles, 1, -1).reshape(
        num_tiles, pb.TILE_H * pb.TILE_W, 3
    )
    ft_pix = ft_tiles.reshape(num_tiles, pb.TILE_H * pb.TILE_W)
    nc_pix = nc_tiles.reshape(num_tiles, pb.TILE_H * pb.TILE_W)

    image = untile(tiles_pix, grid_h, grid_w, render_cfg,
                   camera.height, camera.width)
    final_t = untile(ft_pix, grid_h, grid_w, render_cfg,
                     camera.height, camera.width)
    n_contrib = untile(nc_pix, grid_h, grid_w, render_cfg,
                       camera.height, camera.width)
    image = image + final_t[..., None] * background

    stats = {
        "num_visible": jnp.sum(prep.radius > 0),
        "num_intersections": binning.num_intersections,
        "overflow_capacity": binning.overflow_capacity,
        "overflow_tile_cap": binning.overflow_tile_cap,
        "overflow_per_tile": jnp.int32(0),  # pallas path walks true ranges
        "radii": prep.radius,
    }
    return RenderOutput(
        image=image, final_t=final_t, n_contrib=n_contrib, stats=stats
    )
