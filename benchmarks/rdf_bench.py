#!/usr/bin/env python
"""Fused pair-distance histogram (RDF) throughput on the bench workload.

Measures the K-bin cumulative histogram kernel (`pair_lag_hist`) at the
headline config (thin bench box, cutoff 10, full rebuild per pass) and
reports pairs/s plus the cost relative to one fused energy pass — kernel
cost is linear in K by design.

Usage: python benchmarks/rdf_bench.py [n=1e7] [K=32]
Env: RDF_M, RDF_L, RDF_REPS, RDF_PATH=lag|tile (tile: cubic box at the
same density, RDF_MAXJ capacity), RDF_CUTOFF
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cutoff = float(os.environ.get("RDF_CUTOFF", "10.0"))
    M = int(os.environ.get("RDF_M", "16384"))
    L = int(os.environ.get("RDF_L", "256"))
    reps = int(os.environ.get("RDF_REPS", "5"))
    path = os.environ.get("RDF_PATH", "lag")
    MAXJ = int(os.environ.get("RDF_MAXJ", "12"))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache")
    )
    import jax.numpy as jnp

    from zelll_tpu.core.binning import bin_and_sort
    from zelll_tpu.ops.pallas_pairs import (
        combine_count_vec,
        lag_coverage_ok,
        pair_lag_hist,
    )
    from zelll_tpu.ops.tile_pairs import tile_pair_hist
    from zelll_tpu.utils.datagen import generate_points_random, lj_box
    from zelll_tpu.utils.profiling import measure_rtt

    if path == "tile":
        side = (n / 0.01) ** (1 / 3)
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, side, (n, 3))
    else:
        pts = generate_points_random(n, lj_box(n, cutoff))
    pos = jax.device_put(jnp.asarray(pts, jnp.float32))
    edges_sq = jnp.asarray(np.linspace(0, cutoff, K) ** 2, jnp.float32)
    rtt = measure_rtt()

    @jax.jit
    def hist_pass(p):
        bins, sp = bin_and_sort(
            p, cutoff, max_cells=1, need_perm=False, auto_order=True
        )
        if path == "tile":
            return tile_pair_hist(
                sp, bins.sorted_keys, bins.info.strides, edges_sq, MAXJ=MAXJ
            )
        packed = pair_lag_hist(
            sp, bins.sorted_keys, bins.info.strides, edges_sq, M=M, L=L
        )
        ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
        return packed, ok

    @jax.jit
    def loop(p0):
        def body(i, acc):
            p = p0 + (i % 2).astype(p0.dtype) * 1e-6
            packed, _ = hist_pass(p)
            return acc + packed[0, K - 1] + packed[1, K - 1]

        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    packed, ok = hist_pass(pos)
    assert bool(ok), f"lag coverage failed at L={L}"
    cum = combine_count_vec(np.asarray(packed))
    npairs = int(cum[-1])

    int(loop(pos))  # compile + warm
    t0 = time.perf_counter()
    int(loop(pos))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / reps
    print(
        f'{{"metric": "rdf_hist{K}_{path}_pairs_per_sec_n{n:.0e}", '
        f'"value": {npairs / dt:.6g}, "unit": "pairs/s", '
        f'"step_ms": {dt * 1e3:.2f}, "pairs": {npairs}, "K": {K}}}'
    )
    shells = cum[1:] - cum[:-1]
    print("shells:", shells.tolist()[:8], "...", file=sys.stderr)


if __name__ == "__main__":
    main()
