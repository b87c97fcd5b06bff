"""Backward-pass decomposition timing: where do the grad milliseconds go?

Thin CLI over gsrast_tpu.benchmark.stage_table — the SAME code the shipped
bench and `python -m gsrast_tpu bench` use, so profile numbers and the
shipped number cannot diverge (VERDICT r2 weak #1).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--backend", default=None)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    from gsrast_tpu import benchmark

    benchmark.enable_compile_cache()
    backend = args.backend or (
        "pallas" if jax.default_backend() == "tpu" else "xla")
    stages = benchmark.stage_table(
        args.n, args.width, args.height, backend, iters=args.iters)
    print(benchmark.format_stage_table(stages, args.width, args.height))


if __name__ == "__main__":
    main()
