"""Bisect the TPU backward-kernel fault with progressively fuller toy kernels."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 16, 128
gh, gw = 2, 2
T = gh * gw
counts = [2 * 128, 128, 0, 128]
starts = jnp.asarray(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
C = int(starts[-1])
R = C // 8
feat = jnp.arange(R * LANES, dtype=jnp.float32).reshape(R, LANES)

def run(name, kernel):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, LANES), jnp.float32),
            pltpu.VMEM((2, ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    try:
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((R, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(starts, feat)[0]
        jax.block_until_ready(out)
        print(f"{name}: OK", float(out.sum()))
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:120]}")
        return False

# A: read chunks + write them back, reverse chunk order, sync write
def kernel_a(starts_ref, feat_ref, out_ref, buf, obuf, sems, osems):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    nchunks = (end - start) // 128
    row0 = start // 8

    def chunk_body(i, carry):
        k = nchunks - 1 - i
        slot = jax.lax.rem(k, 2)
        rd = pltpu.make_async_copy(
            feat_ref.at[pl.ds(row0 + k * ROWS, ROWS), :], buf.at[slot],
            sems.at[slot])
        rd.start(); rd.wait()
        obuf[slot] = buf[slot] * 2.0
        wr = pltpu.make_async_copy(
            obuf.at[slot], out_ref.at[pl.ds(row0 + k * ROWS, ROWS), :],
            osems.at[slot])
        wr.start(); wr.wait()
        return carry
    jax.lax.fori_loop(0, nchunks, chunk_body, 0)

# B: + scalar reads with dynamic sublane + row store via pl.ds
def kernel_b(starts_ref, feat_ref, out_ref, buf, obuf, sems, osems):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    nchunks = (end - start) // 128
    row0 = start // 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def row_body(i, carry, slot):
        r = ROWS - 1 - i
        row_acc = jnp.zeros((1, LANES), jnp.float32)
        for j in range(8):
            v = buf[slot, r, j * 16]
            row_acc = jnp.where(lane == j * 16, v * 3.0, row_acc)
        obuf[slot, pl.ds(r, 1), :] = row_acc
        return carry

    def chunk_body(i, carry):
        k = nchunks - 1 - i
        slot = jax.lax.rem(k, 2)
        rd = pltpu.make_async_copy(
            feat_ref.at[pl.ds(row0 + k * ROWS, ROWS), :], buf.at[slot],
            sems.at[slot])
        rd.start(); rd.wait()
        carry = jax.lax.fori_loop(0, ROWS,
                                  functools.partial(row_body, slot=slot), carry)
        wr = pltpu.make_async_copy(
            obuf.at[slot], out_ref.at[pl.ds(row0 + k * ROWS, ROWS), :],
            osems.at[slot])
        wr.start(); wr.wait()
        return carry
    jax.lax.fori_loop(0, nchunks, chunk_body, 0)

# C: + (8,128) vector carries and reductions like the real bwd
def kernel_c(starts_ref, feat_ref, out_ref, buf, obuf, sems, osems):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    nchunks = (end - start) // 128
    row0 = start // 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def row_body(i, carry, slot):
        t_run = carry
        r = ROWS - 1 - i
        row_acc = jnp.zeros((1, LANES), jnp.float32)
        for j in range(8):
            v = buf[slot, r, j * 16]
            t_run = t_run / (1.0 + 0.001 * v)
            s = jnp.sum(t_run * v)
            row_acc = jnp.where(lane == j * 16, s, row_acc)
        obuf[slot, pl.ds(r, 1), :] = row_acc
        return t_run

    def chunk_body(i, carry):
        k = nchunks - 1 - i
        slot = jax.lax.rem(k, 2)
        rd = pltpu.make_async_copy(
            feat_ref.at[pl.ds(row0 + k * ROWS, ROWS), :], buf.at[slot],
            sems.at[slot])
        rd.start(); rd.wait()
        carry = jax.lax.fori_loop(0, ROWS,
                                  functools.partial(row_body, slot=slot), carry)
        wr = pltpu.make_async_copy(
            obuf.at[slot], out_ref.at[pl.ds(row0 + k * ROWS, ROWS), :],
            osems.at[slot])
        wr.start(); wr.wait()
        return carry
    jax.lax.fori_loop(0, nchunks, chunk_body, jnp.ones((8, 128), jnp.float32))

print("backend:", jax.default_backend())
run("A-readwrite", kernel_a)
run("B-scalars", kernel_b)
run("C-carries", kernel_c)

# D: + blocked VMEM inputs (like ft/nc/drgb blocks in the real bwd)
def run_d():
    ft_tiles = jnp.ones((T, 8, 128), jnp.float32)
    nc_tiles = jnp.ones((T, 8, 128), jnp.int32)
    drgb = jnp.ones((T, 3, 8, 128), jnp.float32)

    def kernel(starts_ref, feat_ref, ft_ref, nc_ref, drgb_ref, out_ref,
               buf, obuf, sems, osems):
        t = pl.program_id(0)
        start = starts_ref[t]
        end = starts_ref[t + 1]
        nchunks = (end - start) // 128
        row0 = start // 8
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        ftv = ft_ref[0]
        ncv = nc_ref[0]
        dc = drgb_ref[0, 0]

        def row_body(i, carry, slot, k):
            t_run = carry
            r = ROWS - 1 - i
            row_acc = jnp.zeros((1, LANES), jnp.float32)
            for j in range(8):
                v = buf[slot, r, j * 16]
                idx = k * 128 + r * 8 + j
                applied = (idx < ncv) & (v > 0.1)
                a = jnp.where(applied, 0.001 * v, 0.0)
                t_run = t_run / (1.0 + a)
                s = jnp.sum(t_run * dc * ftv)
                row_acc = jnp.where(lane == j * 16, s, row_acc)
            obuf[slot, pl.ds(r, 1), :] = row_acc
            return t_run

        def chunk_body(i, carry):
            k = nchunks - 1 - i
            slot = jax.lax.rem(k, 2)
            rd = pltpu.make_async_copy(
                feat_ref.at[pl.ds(row0 + k * ROWS, ROWS), :], buf.at[slot],
                sems.at[slot])
            rd.start(); rd.wait()
            carry = jax.lax.fori_loop(
                0, ROWS, functools.partial(row_body, slot=slot, k=k), carry)
            wr = pltpu.make_async_copy(
                obuf.at[slot], out_ref.at[pl.ds(row0 + k * ROWS, ROWS), :],
                osems.at[slot])
            wr.start(); wr.wait()
            return carry
        jax.lax.fori_loop(0, nchunks, chunk_body,
                          jnp.ones((8, 128), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, 8, 128), lambda t, s: (t, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda t, s: (t, 0, 0)),
            pl.BlockSpec((1, 3, 8, 128), lambda t, s: (t, 0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, LANES), jnp.float32),
            pltpu.VMEM((2, ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    try:
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((R, LANES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(starts, feat, ft_tiles, nc_tiles, drgb)[0]
        jax.block_until_ready(out)
        print("D-blocked-ins: OK", float(out.sum()))
    except Exception as e:
        print("D-blocked-ins: FAIL", type(e).__name__, str(e)[:200])

run_d()
