"""Pallas TPU kernels: per-tile front-to-back alpha blend, forward + backward.

TPU-native re-creation of the reference's hottest kernel pair — the tile blend
(/root/reference/apps/gsrast/gscuda/GSCuda.cu:543-677) plus the hand-derived
backward the reference never implemented (SURVEY.md §2.3 "no backward pass").

Mapping CUDA -> TPU:
  * one 16x16-thread block per tile, each thread = 1 pixel
      -> one sequential grid step per 8x128-pixel tile; the whole tile's
         pixels live in a single f32 (sublane, lane) vector register, so each
         per-Gaussian blend update is a handful of full-tile VPU ops.
  * cooperative shared-memory staging of 256 Gaussians per round
      (GSCuda.cu:576-614)
      -> double-buffered async DMA of 128-Gaussian feature chunks from HBM
         into VMEM, overlapped with compute.
  * per-pixel early termination when T (1-alpha) < 1e-4 (GSCuda.cu:652-658)
      -> per-tile chunk skip once every pixel has saturated (vector test);
         in-flight DMAs still drain so semaphores stay balanced.
  * atomic-free gradient accumulation: the backward walks each tile's
    intersection list in reverse (the standard diff-gaussian-rasterization
    recurrence), writing per-INTERSECTION gradients; the per-Gaussian
    reduction is a segment-sum outside the kernel (each intersection belongs
    to exactly one tile, so there are no write races by construction).

Feature packing (TPU alignment rules force this layout): intersections arrive
depth-sorted per tile with every tile's segment padded to a multiple of 128
entries. Features are packed 8 Gaussians per 128-lane row:
    packed[(seg + g) // 8, (g % 8) * 16 + f]  ==  feature f of gaussian g,
f in [mean_x, mean_y, conic_a, conic_b, conic_c, opacity, r, g, b, 0...].
A 128-gaussian chunk is a (16, 128) slice — sublane-offset-aligned because
segment starts are 128-multiples — and scalar reads use a dynamic SUBLANE
index with STATIC lane offsets (the unrolled g%8), which Mosaic supports;
dynamic-lane reads and non-128 lane slices do not exist on this hardware.

Blend math (identical semantics to GSCuda.cu:634-676):
  power = -1/2 (A dx^2 + C dy^2) - B dx dy        [dx = mean - pixel]
  alpha = min(0.99, opacity * exp(power)); skip power > 0 or alpha < 1/255
  P_i = T_i (1 - alpha_i);  include_i = P_i >= 1e-4 (monotone done flag)
  C += c_i alpha_i T_i; final_T = last included P_i; n_contrib = last index.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config as cfg

TILE_H = 8
TILE_W = 128
CHUNK = 128  # gaussians per DMA chunk (a (16, 128) packed block)
NFEAT = 16  # feature stride within a row (9 used)
GPR = 8  # gaussians per packed row
ROWS = CHUNK // GPR  # 16 rows per chunk

# feature indices
F_MX, F_MY, F_CA, F_CB, F_CC, F_OP, F_R, F_G, F_B = range(9)


def _pixel_grids(t, grid_w):
    ty = t // grid_w
    tx = t - ty * grid_w
    # Mosaic requires integer iota; cast afterwards.
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    px = (tx * TILE_W + ix).astype(jnp.float32)
    py = (ty * TILE_H + iy).astype(jnp.float32)
    return px, py


def _forward_kernel(
    starts_ref,  # scalar prefetch: (T+1,) i32, all multiples of CHUNK
    feat_ref,  # (R, 128) f32 packed features in HBM
    rgb_ref,  # out block (1, 3, TILE_H, TILE_W)
    ft_ref,  # out block (1, TILE_H, TILE_W)
    nc_ref,  # out block (1, TILE_H, TILE_W) i32
    buf,  # VMEM (2, ROWS, 128)
    sems,  # DMA sems (2,)
    *,
    grid_w: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    nchunks = (end - start) // CHUNK  # segments are chunk-aligned
    row0 = start // GPR
    px, py = _pixel_grids(t, grid_w)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            feat_ref.at[pl.ds(row0 + k * ROWS, ROWS), :],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def row_body(r, carry, k, slot):
        t_run, acc_r, acc_g, acc_b, ft, nc = carry
        for j in range(GPR):  # static unroll: lane offsets are constants
            base = j * NFEAT
            mx = buf[slot, r, base + F_MX]
            my = buf[slot, r, base + F_MY]
            ca = buf[slot, r, base + F_CA]
            cb = buf[slot, r, base + F_CB]
            cc = buf[slot, r, base + F_CC]
            op = buf[slot, r, base + F_OP]
            cred = buf[slot, r, base + F_R]
            cgrn = buf[slot, r, base + F_G]
            cblu = buf[slot, r, base + F_B]

            dx = mx - px
            dy = my - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            gv = jnp.exp(power)
            alpha = jnp.minimum(cfg.ALPHA_MAX, op * gv)
            ok = (power <= 0.0) & (alpha >= cfg.ALPHA_MIN)
            a_eff = jnp.where(ok, alpha, 0.0)
            test_t = t_run * (1.0 - a_eff)
            include = test_t >= cfg.TRANSMITTANCE_MIN
            w = jnp.where(include, a_eff * t_run, 0.0)
            acc_r = acc_r + w * cred
            acc_g = acc_g + w * cgrn
            acc_b = acc_b + w * cblu
            ft = jnp.where(include, test_t, ft)
            idx = k * CHUNK + r * GPR + j  # 0-based index within the segment
            nc = jnp.where(w > 0.0, idx + 1, nc)
            t_run = test_t
        return t_run, acc_r, acc_g, acc_b, ft, nc

    def chunk_body(k, carry):
        # Keep the DMA pipeline moving even for saturated tiles so the
        # semaphores stay balanced.
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma(jax.lax.rem(k + 1, 2), k + 1).start()

        get_dma(slot, k).wait()

        t_run = carry[0]
        done = jnp.max(t_run) < cfg.TRANSMITTANCE_MIN
        return jax.lax.cond(
            done,
            lambda c: c,
            lambda c: jax.lax.fori_loop(
                0, ROWS, functools.partial(row_body, k=k, slot=slot), c
            ),
            carry,
        )

    shape = (TILE_H, TILE_W)
    init = (
        jnp.ones(shape, jnp.float32),  # running T
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.ones(shape, jnp.float32),  # final_T (frozen at last include)
        jnp.zeros(shape, jnp.int32),  # n_contrib
    )
    _, acc_r, acc_g, acc_b, ft, nc = jax.lax.fori_loop(
        0, nchunks, chunk_body, init
    )
    rgb_ref[0, 0] = acc_r
    rgb_ref[0, 1] = acc_g
    rgb_ref[0, 2] = acc_b
    ft_ref[0] = ft
    nc_ref[0] = nc


def blend_forward(
    feat_packed: jax.Array,  # (R, 128) f32, chunk-aligned segments
    tile_starts: jax.Array,  # (T+1,) i32, multiples of CHUNK
    grid_h: int,
    grid_w: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    num_tiles = grid_h * grid_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[
            pl.BlockSpec((1, 3, TILE_H, TILE_W), lambda t, s: (t, 0, 0, 0)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, s: (t, 0, 0)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, s: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_forward_kernel, grid_w=grid_w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, TILE_H, TILE_W), jnp.int32),
        ],
        interpret=interpret,
    )(tile_starts, feat_packed)


def _backward_kernel(
    starts_ref,  # scalar prefetch (T+1,) i32, multiples of CHUNK
    feat_ref,  # (R, 128) packed features in HBM
    ft_ref,  # (1, TILE_H, TILE_W) saved final transmittance
    nc_ref,  # (1, TILE_H, TILE_W) i32 saved last contributor
    drgb_ref,  # (1, 3, TILE_H, TILE_W) incoming image cotangent
    dft_ref,  # (1, TILE_H, TILE_W) incoming final_T cotangent
    dfeat_ref,  # (R, 128) packed per-intersection grads out (HBM)
    buf,  # VMEM (2, ROWS, 128) read buffer
    obuf,  # VMEM (2, ROWS, 128) write buffer
    sems,  # DMA sems (2,) reads
    osems,  # DMA sems (2,) writes
    *,
    grid_w: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    nchunks = (end - start) // CHUNK
    row0 = start // GPR
    px, py = _pixel_grids(t, grid_w)

    final_t = ft_ref[0]
    nc = nc_ref[0]
    dc_r = drgb_ref[0, 0]
    dc_g = drgb_ref[0, 1]
    dc_b = drgb_ref[0, 2]
    dft = dft_ref[0]

    # Chunks entirely past the tile's last contributor have zero gradient
    # everywhere (forward saturation stopped before them): their output is a
    # straight zero-fill with no feature read and no blend replay. This is
    # the backward mirror of the forward early-termination skip.
    nc_max = jnp.max(nc)
    nchunks_live = jnp.minimum(nchunks, (nc_max + CHUNK - 1) // CHUNK)

    def get_read(slot, k):
        return pltpu.make_async_copy(
            feat_ref.at[pl.ds(row0 + k * ROWS, ROWS), :],
            buf.at[slot],
            sems.at[slot],
        )

    def get_write(slot, k):
        return pltpu.make_async_copy(
            obuf.at[slot],
            dfeat_ref.at[pl.ds(row0 + k * ROWS, ROWS), :],
            osems.at[slot],
        )

    def zero_body(k, _):
        wdma = get_write(0, k)
        wdma.start()
        wdma.wait()
        return 0

    @pl.when(nchunks_live < nchunks)
    def _():
        obuf[0] = jnp.zeros((ROWS, 128), jnp.float32)
        jax.lax.fori_loop(nchunks_live, nchunks, zero_body, 0)

    @pl.when(nchunks_live > 0)
    def _():
        # First processed chunk is nchunks_live-1; its buffer slot is parity-
        # based, NOT 0 (slot/semaphore mismatch deadlocks or double-signals).
        get_read(jax.lax.rem(nchunks_live - 1, 2), nchunks_live - 1).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def row_body(i, carry, k, slot):
        t_run, acc_r, acc_g, acc_b = carry
        r = ROWS - 1 - i  # reverse row order within the chunk
        # Mosaic cannot store scalars to VMEM: compose the row's 9-grads-per-
        # gaussian into one (1, 128) vector via static lane masks, store once.
        row_acc = jnp.zeros((1, 128), jnp.float32)
        for jj in range(GPR):  # static unroll, reverse gaussian order
            j = GPR - 1 - jj
            base = j * NFEAT
            mx = buf[slot, r, base + F_MX]
            my = buf[slot, r, base + F_MY]
            ca = buf[slot, r, base + F_CA]
            cb = buf[slot, r, base + F_CB]
            cc = buf[slot, r, base + F_CC]
            op = buf[slot, r, base + F_OP]
            cred = buf[slot, r, base + F_R]
            cgrn = buf[slot, r, base + F_G]
            cblu = buf[slot, r, base + F_B]

            dx = mx - px
            dy = my - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            gv = jnp.exp(power)
            og = op * gv
            alpha = jnp.minimum(cfg.ALPHA_MAX, og)
            ok = (power <= 0.0) & (alpha >= cfg.ALPHA_MIN)
            idx = k * CHUNK + r * GPR + j
            applied = ok & (idx < nc)  # n_contrib gates the stopped tail

            alpha_m = jnp.where(applied, alpha, 0.0)
            # Recover T before this gaussian (reverse of T *= (1 - alpha)).
            t_run = t_run / (1.0 - alpha_m)
            w = alpha_m * t_run

            # d color
            dcol_r = jnp.sum(w * dc_r)
            dcol_g = jnp.sum(w * dc_g)
            dcol_b = jnp.sum(w * dc_b)

            # d alpha: dC/dalpha_i = T_i (c_i - R_i); R_i is the suffix
            # recurrence acc = alpha c + (1-alpha) acc (the Inria backward
            # recurrence), plus the final-transmittance path
            # dT_final/dalpha_i = -T_final/(1 - alpha_i).
            dalpha = t_run * (
                dc_r * (cred - acc_r)
                + dc_g * (cgrn - acc_g)
                + dc_b * (cblu - acc_b)
            )
            dalpha = dalpha - dft * final_t / (1.0 - alpha_m)
            dalpha = jnp.where(applied, dalpha, 0.0)

            acc_r = jnp.where(applied, alpha * cred + (1.0 - alpha) * acc_r, acc_r)
            acc_g = jnp.where(applied, alpha * cgrn + (1.0 - alpha) * acc_g, acc_g)
            acc_b = jnp.where(applied, alpha * cblu + (1.0 - alpha) * acc_b, acc_b)

            # alpha = min(0.99, o G): clamped branch has zero gradient.
            gate = og < cfg.ALPHA_MAX
            da_g = jnp.where(gate, dalpha, 0.0)
            dop = jnp.sum(da_g * gv)
            dpower = da_g * og  # dalpha * o * dG/dpower, dG/dpower = G
            d_ca = jnp.sum(dpower * (-0.5 * dx * dx))
            d_cb = jnp.sum(dpower * (-dx * dy))
            d_cc = jnp.sum(dpower * (-0.5 * dy * dy))
            d_mx = jnp.sum(dpower * (-(ca * dx + cb * dy)))
            d_my = jnp.sum(dpower * (-(cc * dy + cb * dx)))

            for off, val in (
                (F_MX, d_mx), (F_MY, d_my), (F_CA, d_ca), (F_CB, d_cb),
                (F_CC, d_cc), (F_OP, dop), (F_R, dcol_r), (F_G, dcol_g),
                (F_B, dcol_b),
            ):
                row_acc = jnp.where(lane == base + off, val, row_acc)
        obuf[slot, pl.ds(r, 1), :] = row_acc
        return t_run, acc_r, acc_g, acc_b

    def chunk_body(i, carry):
        k = nchunks_live - 1 - i  # reverse chunk order
        slot = jax.lax.rem(k, 2)

        @pl.when(i + 1 < nchunks_live)
        def _():
            get_read(jax.lax.rem(k - 1, 2), k - 1).start()

        get_read(slot, k).wait()

        carry = jax.lax.fori_loop(
            0, ROWS, functools.partial(row_body, k=k, slot=slot), carry
        )
        wdma = get_write(slot, k)
        wdma.start()
        wdma.wait()
        return carry

    shape = (TILE_H, TILE_W)
    init = (
        final_t,  # running T, reconstructed back-to-front
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    jax.lax.fori_loop(0, nchunks_live, chunk_body, init)


def blend_backward(
    feat_packed: jax.Array,  # (R, 128)
    tile_starts: jax.Array,  # (T+1,) i32, multiples of CHUNK
    final_t_tiles: jax.Array,  # (T, TILE_H, TILE_W)
    n_contrib_tiles: jax.Array,  # (T, TILE_H, TILE_W) i32
    d_rgb_tiles: jax.Array,  # (T, 3, TILE_H, TILE_W)
    d_ft_tiles: jax.Array,  # (T, TILE_H, TILE_W)
    grid_h: int,
    grid_w: int,
    interpret: bool = False,
) -> jax.Array:
    num_tiles = grid_h * grid_w
    rows = feat_packed.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, s: (t, 0, 0)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, s: (t, 0, 0)),
            pl.BlockSpec((1, 3, TILE_H, TILE_W), lambda t, s: (t, 0, 0, 0)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t, s: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, 128), jnp.float32),
            pltpu.VMEM((2, ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_backward_kernel, grid_w=grid_w),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        tile_starts,
        feat_packed,
        final_t_tiles,
        n_contrib_tiles,
        d_rgb_tiles,
        d_ft_tiles,
    )[0]
