"""Microbenchmarks of the TPU primitives the binning pipeline is built from:
gather, lax.sort (1-3 operands), searchsorted variants, cumsum, int division.

Grounds the binning design + the BASELINE.md roofline in measured numbers
instead of folklore (r3: the searchsorted expansion regressed binning 3x —
this tells us which primitive is at fault).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gsrast_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=8_388_608)   # 8M
    ap.add_argument("--n", type=int, default=1_000_000)
    args = ap.parse_args()
    c, n = args.c, args.n
    key = jax.random.PRNGKey(0)

    idx = jax.random.randint(key, (c,), 0, n)
    table1 = jnp.arange(n, dtype=jnp.int32)
    tablef9 = jax.random.normal(key, (n, 9))
    vals = jax.random.randint(key, (c,), 0, 1 << 30)
    pay = jnp.arange(c, dtype=jnp.int32)
    sorted_n = jnp.sort(jax.random.randint(key, (n,), 0, 1 << 30))
    queries = jax.random.randint(key, (c,), 0, 1 << 30)
    f9 = jax.random.normal(key, (c, 9))

    t = timeit(jax.jit(lambda i: table1[i]), idx)
    print(f"gather int32 (C={c/1e6:.0f}M from N={n/1e6:.1f}M):  {t:8.2f} ms"
          f"  ({c/t/1e6:.0f}M elem/s)")
    t = timeit(jax.jit(lambda i: tablef9[i]), idx)
    print(f"gather f32 rows (C,9):                  {t:8.2f} ms"
          f"  ({9*c/t/1e6:.0f}M elem/s)")
    t = timeit(jax.jit(lambda v, p: jax.lax.sort((v, p), num_keys=1,
                                                 is_stable=True)), vals, pay)
    print(f"sort C 1key+1payload:                   {t:8.2f} ms"
          f"  ({c/t/1e6:.0f}M elem/s)")
    t = timeit(jax.jit(lambda v, p: jax.lax.sort((v, p, p), num_keys=1,
                                                 is_stable=True)),
               vals, pay)
    print(f"sort C 1key+2payload:                   {t:8.2f} ms")
    half = vals[: c // 2]
    payh = pay[: c // 2]
    t = timeit(jax.jit(lambda v, p: jax.lax.sort((v, p), num_keys=1,
                                                 is_stable=True)), half, payh)
    print(f"sort C/2 1key+1payload:                 {t:8.2f} ms")
    for method in ("scan", "scan_unrolled", "sort"):
        try:
            t = timeit(jax.jit(
                lambda s, q, m=method: jnp.searchsorted(s, q, method=m)),
                sorted_n, queries)
            print(f"searchsorted[{method:13s}] C into N:    {t:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"searchsorted[{method}]: {type(e).__name__}")
    t = timeit(jax.jit(lambda x: jnp.cumsum(x)), table1)
    print(f"cumsum N int32:                         {t:8.2f} ms")
    t = timeit(jax.jit(lambda x: jnp.cumsum(x, axis=0)), f9)
    print(f"cumsum (C,9) f32:                       {t:8.2f} ms")
    den = jnp.maximum(idx.astype(jnp.int32), 1)
    t = timeit(jax.jit(lambda a, b: a // b), vals, den)
    print(f"int32 div C:                            {t:8.2f} ms")
    # contiguous-ish gather: expansion-style idx (sorted, clustered)
    sidx = jnp.sort(idx)
    t = timeit(jax.jit(lambda i: tablef9[i]), sidx)
    print(f"gather f32 rows, SORTED idx:            {t:8.2f} ms")


if __name__ == "__main__":
    main()
