#!/usr/bin/env python
"""HBM-bandwidth / memory report — the TPU analogue of the reference's
valgrind cachemiss CSV (examples/cachemisses.rs:28-83,
scripts/cachemisses.sh:1-34; SURVEY.md section 5 prescribes this
translation) plus the massif/Mbytes memory column.

Per n in 1e2..1e8 and per stage {build (keys+sort+table), energy
(fused rebuild+LJ), forces}, on the protocol thin box AND the cubic box:
device time, logical operand bytes, achieved GB/s vs the v5e HBM peak
(~820 GB/s), and the device's peak live bytes. Variants mirror the
reference's {f32 x presorted} axis where it translates: f32 and split
(f64-grade) coordinate precision — presorted is a no-op here (sort-based
binning is input-order-invariant; comparison_r4.csv proves rows
bit-identical).

Usage: python benchmarks/hbm_report.py [out.csv] [max_exp=8]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/hbm_report_r4.csv"
    max_exp = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from zelll_tpu.core.binning import bin_and_sort
    from zelll_tpu.ops.fused import fused_lj_rebuild_energy
    from zelll_tpu.ops.pallas_pairs import pair_lag_forces, lag_coverage_ok
    from zelll_tpu.ops.tile_pairs import tile_lj_rebuild_energy
    from zelll_tpu.utils.profiling import device_time, hbm_row, measure_rtt

    rows = ["stage,n,variant,time_ms,logical_bytes,achieved_GBps,"
            "peak_live_bytes,analytic_live_bytes,extra"]
    rtt = measure_rtt()
    rng = np.random.default_rng(0)

    for exp in range(2, max_exp + 1):
        n = 10 ** exp
        cutoff = 10.0
        # protocol thin box (30 x 30 x n/9) like benches/cellgrid.rs
        zlen = n / 0.01 / 900.0
        pts = rng.uniform(0, 1, (n, 3)) * np.array([30.0, 30.0, zlen])
        pos = jax.device_put(jnp.asarray(pts, jnp.float32))
        reps = 5 if n >= 10**6 else 20

        # ---- build: keys -> multi-operand sort -> cell table ----
        def build(p, i):
            bins, sp = bin_and_sort(
                p + (i % 2).astype(p.dtype) * 1e-6, cutoff, max_cells=1,
                need_perm=False,
            )
            return sp[0, 0] + bins.sorted_keys[0]

        t = device_time(build, pos, reps=reps, rtt=rtt)
        # read 12n (f32 coords) + write sorted 12n + keys 4n + table
        logical = 12 * n + 12 * n + 4 * n + 8 * n
        rows.append(hbm_row("build", n, "f32", t, logical, "thin",
                            live_bytes=36 * n))

        # ---- fused energy (lag kernel) f32 and split ----
        M = 16384
        L = 256

        def energy(p, i):
            e, _ = fused_lj_rebuild_energy(
                p + (i % 2).astype(p.dtype) * 1e-6, cutoff, M=M, L=L)
            return e

        t = device_time(energy, pos, reps=reps, rtt=rtt)
        logical = (12 + 12 + 4) * n + 8 * n  # build + kernel re-read
        rows.append(hbm_row("energy", n, "f32", t, logical, "thin",
                            live_bytes=36 * n))

        def energy_split(p, i):
            hi = (p + (i % 2).astype(p.dtype) * 1e-6).astype(jnp.float32)
            e, _ = fused_lj_rebuild_energy(
                hi, cutoff, positions_lo=jnp.zeros_like(hi), M=M, L=L)
            return e

        t = device_time(energy_split, pos, reps=reps, rtt=rtt)
        rows.append(hbm_row("energy", n, "split", t, logical * 2, "thin",
                            live_bytes=64 * n))

        # ---- forces (lag kernel, Newton both-endpoint) ----
        def forces(p, i):
            bins, sp = bin_and_sort(
                p + (i % 2).astype(p.dtype) * 1e-6, cutoff, max_cells=1,
                need_perm=False,
            )
            f = pair_lag_forces(
                sp, bins.sorted_keys, bins.info.strides,
                jnp.float32(cutoff) ** 2, M=4096, L=L,
            )
            return f[0, 0]

        t = device_time(forces, pos, reps=reps, rtt=rtt)
        logical = (12 + 12 + 4) * n + 12 * n  # build + force planes out
        rows.append(hbm_row("forces", n, "f32", t, logical, "thin",
                            live_bytes=48 * n))

        # ---- cubic-box energy (segment-tile kernel) ----
        side = (n / 0.01) ** (1 / 3)
        ptsc = rng.uniform(0, side, (n, 3))
        posc = jax.device_put(jnp.asarray(ptsc, jnp.float32))

        def energy_cubic(p, i):
            e, _ = tile_lj_rebuild_energy(
                p + (i % 2).astype(p.dtype) * 1e-6, cutoff, MAXJ=13,
                kahan=False, safe_term=False,
            )
            return e

        t = device_time(energy_cubic, posc, reps=reps, rtt=rtt)
        # build + packed blocks (8 rows/chunk) + windows DMA (~2.3x
        # executed blocks at MAXJ=13 per-band waste)
        logical = (12 + 12 + 4) * n + 32 * n + int(2.3 * 32 * n)
        # live: coords + sorted planes + packed 8-row blocks (32 B/slot)
        rows.append(hbm_row("energy", n, "f32", t, logical, "cubic",
                            live_bytes=60 * n))

        print(rows[-5] if n < 10**8 else rows[-1])

    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {out} ({len(rows) - 1} rows)")


if __name__ == "__main__":
    main()
