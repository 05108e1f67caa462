#!/usr/bin/env python
"""Cubic-box benchmark: full rebuild + LJ over a 100^3-cell cube.

The geometry where plain sorted-order windows degenerate (a full z-layer);
uses the column decomposition (ops/columns.py). Same density as the
headline protocol (10 particles per cutoff^3).

Usage: python benchmarks/cubic.py [n=1e7]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    T = int(os.environ.get("CUBIC_T", "3"))
    M = int(os.environ.get("CUBIC_M", "16384"))
    L = int(os.environ.get("CUBIC_L", "1024"))
    cutoff = 10.0
    side = (n / 0.01) ** (1 / 3)

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    import jax.numpy as jnp

    from zelll_tpu.ops.columns import column_pair_sum
    from zelll_tpu.ops.pallas_pairs import combine_count, count_term
    from zelll_tpu.utils.profiling import device_time, measure_rtt

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, side, (n, 3))
    pos = jax.device_put(jnp.asarray(pts, jnp.float32))

    c, ok = column_pair_sum(
        pos, cutoff, T=T, M=M, L=L, term=count_term, out_dtype=jnp.int32
    )
    npairs = combine_count(c)
    assert bool(ok), "column coverage failed"
    rtt = measure_rtt()

    def f(p, i):
        e, ok = column_pair_sum(
            p + (i % 2).astype(p.dtype) * 1e-6, cutoff, T=T, M=M, L=L
        )
        return e

    dt = device_time(f, pos, reps=5, rtt=rtt)
    print(
        f'{{"metric": "cubic_lj_pairs_per_sec_full_rebuild_n{n:.0e}", '
        f'"value": {npairs / dt:.6g}, "unit": "pairs/s", '
        f'"step_ms": {dt * 1e3:.1f}, "pairs": {npairs}, '
        f'"box_cells": {int(side / cutoff)}, "T": {T}, "M": {M}, "L": {L}}}'
    )


if __name__ == "__main__":
    main()
