"""Foreground TPU microbenchmarks, part 2 (run groups separately: the axon
tunnel compiles are ~60s/jit uncached and runs must stay under the 600s tool
cap). Usage: python scripts/micro_tpu2.py <group>  with group in
{gather, search, sort, scan}."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gsrast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

C = 8_388_608
N = 1_048_576


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    group = sys.argv[1]
    key = jax.random.PRNGKey(0)

    if group == "gather":
        tablef9 = jax.random.normal(key, (N, 9))
        idx = jax.random.randint(key, (C,), 0, N)
        print(f"row gather (N,9) rnd idx C: "
              f"{timeit(jax.jit(lambda i: tablef9[i]), idx):8.2f} ms",
              flush=True)
        sidx = jnp.sort(idx)
        print(f"row gather (N,9) sorted idx: "
              f"{timeit(jax.jit(lambda i: tablef9[i]), sidx):8.2f} ms",
              flush=True)
        idx2 = jax.random.randint(key, (N, 16), 0, C)
        tab2 = jax.random.normal(key, (C, 9))
        print(f"row gather (C,9) at (N,16) rnd: "
              f"{timeit(jax.jit(lambda t, i: t[i]), tab2, idx2):8.2f} ms",
              flush=True)
    elif group == "search":
        counts = jnp.maximum(
            jax.random.randint(key, (N,), 0, 6), 0).astype(jnp.int32)
        offsets = jnp.cumsum(counts) - counts
        j = jnp.arange(C, dtype=jnp.int32)
        for m in ("scan", "scan_unrolled"):
            f = jax.jit(lambda o, q, m=m: jnp.searchsorted(
                o, q, side="right", method=m))
            print(f"searchsorted[{m:13s}] asc queries: "
                  f"{timeit(f, offsets, j):8.2f} ms", flush=True)
    elif group == "sort":
        vals = jax.random.randint(key, (C,), 0, 1 << 30)
        pay = jnp.arange(C, dtype=jnp.int32)
        f9 = jax.random.normal(key, (C,))
        ops4 = (vals, pay, f9, f9 + 1, f9 + 2)
        print(f"sort C 1k+4p: "
              f"{timeit(jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=True)), *ops4):8.2f} ms",
              flush=True)
        ops10 = (vals, pay) + tuple(f9 + i for i in range(9))
        print(f"sort C 1k+10p: "
              f"{timeit(jax.jit(lambda *o: jax.lax.sort(o, num_keys=1, is_stable=True)), *ops10):8.2f} ms",
              flush=True)
        vals2 = jax.random.randint(key, (2 * C,), 0, 1 << 30)
        pay2 = jnp.arange(2 * C, dtype=jnp.int32)
        print(f"sort 2C 1k+1p: "
              f"{timeit(jax.jit(lambda v, p: jax.lax.sort((v, p), num_keys=1, is_stable=True)), vals2, pay2):8.2f} ms",
              flush=True)
    elif group == "scan":
        f9 = jax.random.normal(key, (C, 9))
        print(f"cumsum (C,9) axis0: "
              f"{timeit(jax.jit(lambda x: jnp.cumsum(x, axis=0)), f9):8.2f} ms",
              flush=True)
        x1 = jax.random.normal(key, (C,))
        print(f"cumsum (C,) f32: "
              f"{timeit(jax.jit(lambda x: jnp.cumsum(x)), x1):8.2f} ms",
              flush=True)
        i1 = jnp.ones((N,), jnp.int32)
        print(f"cumsum (N,) i32: "
              f"{timeit(jax.jit(lambda x: jnp.cumsum(x)), i1):8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
