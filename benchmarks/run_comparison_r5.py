#!/usr/bin/env python
"""Round-5 cross-tool comparison: the full reference protocol
(scripts/more_benches.sh:16-50) — n = 1e2..1e8 with the repeat schedule
{1e5, 1e4, 1e3, 1e2, 10, 1, 1} so runtime_s measures the WORKLOAD, not
dispatch (the round-3 CSV's reps=1 rows at small n measured the ~30 ms
device-tunnel RTT).

Differences from run_comparison.sh (which remains the file-based
orchestrator): each tool runs in its own subprocess (peak-RSS memory_mb
like more_benches.sh's Mbytes column) and regenerates the dataset
in-process from the protocol generator (benchmarks/lammps_data.py uses
the same `generate_points_random` — the ChaCha12 stream is
RFC-8439-verified and bit-identical to the data files, test_datagen.py),
which is what makes 1e8 feasible (a 4 GB text file parsed per tool is
not). Engine rows time `reps` evaluations inside ONE jitted fori_loop
(per-iteration input perturbation defeats loop-invariant hoisting).

At 1e8 the split (f64-grade) energy runs as the "splitchunk" variant
(round 13): one-dispatch split is RESOURCE_EXHAUSTED on the 16 GB v5e
(hi+lo planes double every sort operand — measured), so the energy runs
in K host-sequential major-axis slab chunks, each [one-cell halo | own
rows] with the `parallel/domain.py` min_islot ownership rule on one
chip — O(n/K) device memory, exact pair coverage (cell width == cutoff
bounds pairs to adjacent major cells). Remaining omissions, documented
not forgotten: scipy cKDTree at 1e8 (hours on this 1-core host,
>20 GB); torch brute force (O(n^2) f64 — ~years); LAMMPS/Julia cannot
be installed here (no package installs, no egress).

Usage: python benchmarks/run_comparison_r5.py [out.csv] [exponents...]
"""
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REPS = {2: 100000, 3: 10000, 4: 1000, 5: 100, 6: 10, 7: 1, 8: 1}

ENGINE = r'''
import os, sys, time, resource
import numpy as np
sys.path.insert(0, os.environ["ZELLL_REPO"])
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
import jax.numpy as jnp
from zelll_tpu.utils.datagen import generate_points_random, lj_box
from zelll_tpu.ops.fused import auto_lj_energy, fused_lj_rebuild_energy
from zelll_tpu.ops.pallas_pairs import suggest_lag
from zelll_tpu.core.binning import bin_and_sort

n = int(sys.argv[1]); reps = int(sys.argv[2])
variant = os.environ["ZELLL_VARIANT"]
cutoff = 10.0
pts = generate_points_random(n, lj_box(n, cutoff))

if variant == "splitchunk":
    # f64-grade (split-precision) energy at n beyond single-dispatch
    # device memory: host-sequential slab chunks along the major axis,
    # each chunk = [one-cell halo | own rows] with min_islot ownership
    # (parallel/domain.py's rule run serially on one chip). Cell width
    # == cutoff bounds every pair to adjacent major cells, so one halo
    # layer is exact. Matches /root/reference/scripts/more_benches.sh
    # exact-f64 coverage through 1e8.
    from zelll_tpu.core.geometry import Aabb, GridInfo
    from zelll_tpu.ops.pallas_pairs import (
        lag_coverage_ok, lj_term, pair_lag_reduce, suggest_lag)
    pos64 = np.asarray(pts, np.float64)
    hi = pos64.astype(np.float32)
    lo = (pos64 - hi.astype(np.float64)).astype(np.float32)
    del pts, pos64
    t0 = time.perf_counter()
    inf32, sup32 = hi.min(axis=0), hi.max(axis=0)
    info = GridInfo.create(
        Aabb(jnp.asarray(inf32), jnp.asarray(sup32)), cutoff,
        auto_order=True)
    major = int(np.argmax(sup32 - inf32))
    # EXACT f32 replica of GridInfo.cell_index on the major axis
    zc = np.floor(
        (hi[:, major] - inf32[major]) / np.float32(cutoff)
    ).astype(np.int32)
    order = np.argsort(zc, kind="stable")
    hi, lo, zc = hi[order], lo[order], zc[order]
    del order
    K = int(os.environ.get("ZELLL_CHUNKS", "14"))
    bcells = np.unique(zc[np.arange(1, K) * (n // K)])
    starts = np.concatenate(
        [[0], np.searchsorted(zc, bcells, side="left"), [n]])
    starts = np.unique(starts)
    halos = np.searchsorted(zc, zc[starts[:-1]] - 1, side="left")
    cap = int(np.max(starts[1:] - halos))
    cap = -(-(cap + 8) // 1024) * 1024
    csq = jnp.float32(cutoff) ** 2
    # one capacity class: every chunk runs the same compiled graph
    from zelll_tpu.core.binning import bin_and_sort as _bs
    b0, _ = _bs(jnp.asarray(hi[halos[0]:starts[1]]), cutoff,
                max_cells=1, need_perm=False, info=info)
    L = suggest_lag(np.asarray(b0.sorted_keys), np.asarray(info.strides))
    M = max(1024, min(16384, L))
    del b0

    @jax.jit
    def chunk_energy(chi, clo, valid, mis):
        bins, cols = _bs(
            jnp.concatenate([chi, clo], axis=1), cutoff, max_cells=1,
            need_perm=False, info=info, valid=valid)
        e = pair_lag_reduce(
            cols[:, :3], bins.sorted_keys, info.strides, csq,
            cols[:, 3:], M=M, L=L, term=lj_term, min_islot=mis)
        return e, lag_coverage_ok(bins.sorted_keys, info.strides, L)

    from zelll_tpu.api import _pad_far
    e_total, all_ok = 0.0, True
    for c in range(len(starts) - 1):
        h0, s0, s1 = int(halos[c]), int(starts[c]), int(starts[c + 1])
        m = s1 - h0
        chi = _pad_far(hi[h0:s1], cap)
        clo = np.zeros((cap, 3), np.float32)
        clo[:m] = lo[h0:s1]
        valid = np.arange(cap) < m
        ev, ok = chunk_energy(
            jnp.asarray(chi), jnp.asarray(clo), jnp.asarray(valid),
            jnp.int32(s0 - h0))
        e_total += float(ev)
        all_ok = all_ok and bool(ok)
    assert all_ok, "chunked split energy: coverage flag tripped"
    dt = time.perf_counter() - t0
    mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    print(f"{n},1,{e_total / n:.14g},{dt:.6g},{mb:.1f},"
          f"zelll_tpu[splitchunk(K={len(starts) - 1},L={L})|split]")
    sys.exit(0)
if variant == "presorted":
    org = pts.min(axis=0)
    cell = np.floor((pts - org) / cutoff).astype(np.int64)
    shape = cell.max(axis=0) + 1
    strides = np.array([1, shape[0] + 4, (shape[0] + 4) * (shape[1] + 4)])
    pts = pts[np.argsort(cell @ strides, kind="stable")]
split = variant == "split"
# one auto call learns the dispatch (path, L) and checks coverage
e, path = auto_lj_energy(pts, cutoff, split=split)
if split:
    pos64 = np.asarray(pts, np.float64)
    hi = pos64.astype(np.float32)
    pos = jnp.asarray(hi)
    pos_lo = jnp.asarray((pos64 - hi.astype(np.float64)).astype(np.float32))
else:
    pos = jnp.asarray(pts, np.float32)
    pos_lo = None
bins, _ = bin_and_sort(pos, cutoff, max_cells=1, need_perm=False)
L = suggest_lag(np.asarray(bins.sorted_keys), np.asarray(bins.info.strides))
M = max(1024, min(16384, L))

@jax.jit
def loop(p, plo):
    def body(i, acc):
        q = p + (i % 2).astype(p.dtype) * 1e-6
        ev, _ = fused_lj_rebuild_energy(q, cutoff, plo, M=M, L=L)
        return acc + ev
    return jax.lax.fori_loop(0, reps, body, jnp.zeros((), pos.dtype))

float(loop(pos, pos_lo))  # warm
t0 = time.perf_counter()
float(loop(pos, pos_lo))
dt = (time.perf_counter() - t0) / reps
mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(f"{n},{reps},{e / n:.14g},{dt:.6g},{mb:.1f},zelll_tpu[{path}|{variant}]")
'''

ORACLE = r'''
import os, sys, time, resource
import numpy as np
sys.path.insert(0, os.environ["ZELLL_REPO"])
from zelll_tpu.utils.datagen import generate_points_random, lj_box
from zelll_tpu import oracle
n = int(sys.argv[1]); reps = int(sys.argv[2])
cutoff = 10.0
pts = generate_points_random(n, lj_box(n, cutoff))
assert oracle.available()
e_ref, n_pairs = oracle.lj_energy(pts, cutoff)  # warm
t0 = time.perf_counter()
for _ in range(reps):
    e_ref, n_pairs = oracle.lj_energy(pts, cutoff)
dt = (time.perf_counter() - t0) / reps
mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(f"{n},{reps},{e_ref / n:.14g},{dt:.6g},{mb:.1f},cpp_oracle")
'''

EXTERNAL = r'''
import os, sys, time, resource
import numpy as np
sys.path.insert(0, os.environ["ZELLL_REPO"])
from zelll_tpu.utils.datagen import generate_points_random, lj_box
n = int(sys.argv[1]); reps = int(sys.argv[2]); tool = sys.argv[3]
cutoff = 10.0
pts = generate_points_random(n, lj_box(n, cutoff))
if tool == "scipy":
    from scipy.spatial import cKDTree
    def run():
        t = cKDTree(pts)
        pairs = t.query_pairs(cutoff, output_type="ndarray")
        d = pts[pairs[:, 0]] - pts[pairs[:, 1]]
        dsq = (d * d).sum(1)
        x = (1.0 / dsq) ** 3
        return float((4.0 * x * (x - 1.0)).sum())
else:
    import torch
    def run():
        p = torch.from_numpy(pts)
        e = 0.0
        for lo in range(0, n, 2048):
            d = p[lo : lo + 2048, None, :] - p[None, :, :]
            dsq = (d * d).sum(-1)
            ii = torch.arange(lo, min(lo + 2048, n))
            gj = torch.arange(n)[None, :].expand(len(ii), n)
            m = (dsq < cutoff * cutoff) & (gj > ii[:, None])
            x = torch.where(m, 1.0 / dsq, torch.zeros(())) ** 3
            e += float((4.0 * x * (x - 1.0) * m).sum())
        return e
e = run()  # warm
t0 = time.perf_counter()
done = 0
for _ in range(reps):
    e = run()
    done += 1
    if time.perf_counter() - t0 > 60.0 and done < reps:
        break  # cap: 1-core host; per-rep time is converged by now
dt = (time.perf_counter() - t0) / done
mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(f"{n},{done},{e / n:.14g},{dt:.6g},{mb:.1f},{tool}")
'''


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/comparison_r5.csv"
    exps = [int(e) for e in sys.argv[2:]] or list(range(2, 9))
    env = dict(os.environ, ZELLL_REPO=REPO)
    rows = ["n,reps,energy_per_atom,runtime_s,memory_mb,tool"]

    def run(code, *args, **kw):
        r = subprocess.run([sys.executable, "-c", code, *map(str, args)],
                           capture_output=True, text=True,
                           env=dict(env, **kw), timeout=7200)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if r.returncode or not line:
            sys.stderr.write(f"-- failed ({args}): {r.stderr[-400:]}\n")
            return None
        return line

    for exp in exps:
        n, reps = 10 ** exp, REPS[exp]
        sys.stderr.write(f"== n=1e{exp} reps={reps}\n")
        variants = (("splitchunk", "f32", "presorted") if exp >= 8
                    else ("split", "f32", "presorted"))
        for variant in variants:
            line = run(ENGINE, n, reps, ZELLL_VARIANT=variant)
            if line:
                rows.append(line)
                print(line, flush=True)
        line = run(ORACLE, n, reps)
        if line:
            rows.append(line)
            print(line, flush=True)
        if exp <= 7:
            line = run(EXTERNAL, n, reps, "scipy")
            if line:
                rows.append(line)
                print(line, flush=True)
        if exp <= 5:
            line = run(EXTERNAL, n, min(reps, 3), "torch")
            if line:
                rows.append(line)
                print(line, flush=True)
        with open(out, "w") as f:
            f.write("\n".join(rows) + "\n")
    sys.stderr.write(f"wrote {out}\n")


if __name__ == "__main__":
    main()
