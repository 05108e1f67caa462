#!/usr/bin/env python
"""Criterion-equivalent benchmark sweep, CSV output.

Mirrors the reference protocol (benches/cellgrid.rs, benches/lj.rs,
benches/iters.rs): for n = 10^2..10^maxexp, uniform random cloud
(ChaCha12 seed 3079380797442975911) in the 30 x 30 x (n/0.01/900) box,
cutoff 10, report per n:

  build_ms        full grid construction (keys + sort + cell table)
  rebuild_ms      rebuild_mut path with perturbed positions (fast/slow mix)
  pairs_lj_ms     fused full rebuild + cutoff-filtered LJ reduction
  pairs           cutoff-filtered unique pair count
  pairs_per_sec   pairs / pairs_lj_ms (the headline metric)
  energy_per_atom LJ energy / n (the cross-tool parity oracle,
                  benches/lj.rs:93 prints the same quantity)

All timings are device-side medians over REPS iterations inside one jit
(the TPU tunnel adds ~28 ms per dispatch which is subtracted once).

Usage: python benchmarks/sweep.py [maxexp=6] [out.csv]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    maxexp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    reps_env = os.environ.get("BENCH_REPS")

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from zelll_tpu.core import build, rebuild
    from zelll_tpu.ops.fused import fused_lj_rebuild_energy
    from zelll_tpu.ops.pallas_pairs import count_term
    from zelll_tpu.utils.datagen import generate_points_random, lj_box

    def rtt():
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8,), jnp.float32)
        float(f(x)[0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x)[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def timeit(jitted_loop, *args):
        r = jitted_loop(*args)
        jax.block_until_ready(r)
        float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        t0 = time.perf_counter()
        r = jitted_loop(*args)
        float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        return max(time.perf_counter() - t0 - _rtt, 1e-9) / reps

    _rtt = rtt()
    rows = ["n,build_ms,rebuild_ms,pairs_lj_ms,pairs,pairs_per_sec,energy_per_atom"]
    print(rows[0], flush=True)

    for exp in range(2, maxexp + 1):
        n = 10**exp
        # scale reps so each timed loop runs well above the ~28 ms dispatch
        # RTT even for tiny n
        reps = int(reps_env) if reps_env else min(2000, max(5, 3_000_000 // n))
        cutoff = 10.0
        pts = generate_points_random(n, lj_box(n, cutoff))
        pos = jax.device_put(jnp.asarray(pts, jnp.float32))
        M = 1024 if n < 200_000 else 8192
        L = 256

        @jax.jit
        def build_loop(p):
            def body(i, acc):
                g = build(p + (i % 2).astype(p.dtype) * 1e-6, cutoff)
                return acc + g.bins.num_cells
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        @jax.jit
        def rebuild_loop(p):
            g0 = build(p, cutoff)
            def body(i, carry):
                g, acc = carry
                g = rebuild(g, p + (i % 3).astype(p.dtype) * 1e-3)
                return g, acc + g.bins.num_cells
            _, acc = jax.lax.fori_loop(0, reps, body, (g0, jnp.int32(0)))
            return acc

        @jax.jit
        def lj_loop(p):
            def body(i, acc):
                e, ok = fused_lj_rebuild_energy(
                    p + (i % 2).astype(p.dtype) * 1e-6, cutoff, M=M, L=L
                )
                return acc + e + jnp.where(ok, 0.0, jnp.nan)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        build_ms = timeit(build_loop, pos) * 1e3
        rebuild_ms = timeit(rebuild_loop, pos) * 1e3
        lj_s = timeit(lj_loop, pos)

        e, _ = fused_lj_rebuild_energy(pos, cutoff, M=M, L=L)
        c, _ = fused_lj_rebuild_energy(pos, cutoff, M=M, L=L, term=count_term)
        npairs = int(c)
        row = (
            f"{n},{build_ms:.3f},{rebuild_ms:.3f},{lj_s * 1e3:.3f},"
            f"{npairs},{npairs / lj_s:.4g},{float(e) / n:.10g}"
        )
        rows.append(row)
        print(row, flush=True)

    if out_path:
        with open(out_path, "w") as f:
            f.write("\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
