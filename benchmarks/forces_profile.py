#!/usr/bin/env python
"""Per-stage profile of the cubic tile MD step at n (default 1e7):

  sort6    bin_and_sort of 6 planes (pos+vel payload, the MD-step sort)
  sort3    bin_and_sort of 3 planes (the energy-bench sort, for contrast)
  forces   _packed_forces_core alone on pre-sorted planes
  step     full md_step_cubic_tile

Usage: python benchmarks/forces_profile.py [n] [reps]
Env: FP_CB, FP_MAXJ, FP_BANDMASK (default 0 = maskless).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cutoff = 10.0
    side = (n / 0.01) ** (1 / 3)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from zelll_tpu.core.binning import bin_and_sort
    from zelll_tpu.core.geometry import GridInfo, aabb_from_positions
    from zelll_tpu.models.lj_md import MDState, md_step_cubic_tile
    from zelll_tpu.ops.lj import lj_force_factor
    from zelll_tpu.ops.tile_pairs import _packed_forces_core
    from zelll_tpu.utils.profiling import measure_rtt

    CB = int(os.environ.get("FP_CB", "8"))
    mj_env = os.environ.get("FP_MAXJ", "12")
    bandmask = os.environ.get("FP_BANDMASK", "0") == "1"


    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    pos = jax.device_put(
        jnp.asarray(rng.uniform(0, side, (n, 3)), jnp.float32)
    )
    if mj_env == "auto":
        # per-band capacities for the FULL (mirrored) force bands
        from zelll_tpu.core.binning import bin_and_sort as _bs
        from zelll_tpu.ops.pallas_pairs import _pad_and_desentinel
        from zelll_tpu.ops.segments import CHUNK, segment_bands, suggest_maxj

        b0, _ = _bs(pos, cutoff, max_cells=1, need_perm=False,
                    auto_order=True)
        C = max(-(-n // (CHUNK * CB)) * CB, CB) * CHUNK
        MAXJ = suggest_maxj(
            _pad_and_desentinel(b0.sorted_keys, C),
            segment_bands(b0.info.strides, full=True), half=False,
            per_band=True,
        )
        print("per-band MAXJ_F:", MAXJ, flush=True)
        del b0
    else:
        MAXJ = int(mj_env)
    vel = jnp.zeros_like(pos)
    csq = jnp.float32(cutoff**2)

    def timeit(name, fn, *args):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                return acc + fn(i, *a)

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        float(loop(*args))
        t0 = time.perf_counter()
        float(loop(*args))
        dt = (time.perf_counter() - t0 - rtt) / reps
        print(f"{name:8s} {dt * 1e3:8.1f} ms", flush=True)
        return dt

    def sortk(k):
        def run(i, p, v):
            p = p + (i % 2).astype(p.dtype) * 1e-6
            stacked = jnp.concatenate([p, v[:, : k - 3]], axis=1)
            info = GridInfo.create(aabb_from_positions(p), cutoff)
            bins, planes = bin_and_sort(
                stacked, cutoff, max_cells=1, need_perm=False,
                stacked=False, info=info,
            )
            return sum(pl[0] for pl in planes) + bins.sorted_keys[0]

        return run

    timeit("sort3", sortk(3), pos, vel)
    timeit("sort6", sortk(6), pos, vel)

    # pre-sorted planes for the kernel-only measurement
    info = GridInfo.create(aabb_from_positions(pos), cutoff)
    bins, planes = bin_and_sort(
        pos, cutoff, max_cells=1, need_perm=False, stacked=False, info=info
    )
    splanes = [jax.device_put(p) for p in planes]
    skeys = jax.device_put(bins.sorted_keys)
    strides = bins.info.strides

    def forces_only(i, p0, p1, p2, keys):
        ps = [p0 + (i % 2).astype(p0.dtype) * 1e-6, p1, p2]
        fpl, ok = _packed_forces_core(
            ps, keys, strides, csq, CB=CB, MAXJ=MAXJ,
            gfn=lj_force_factor, interpret=False, split=False,
            bandmask=bandmask, safe_term=False,
        )
        return fpl[0][0] + jnp.where(ok, 0.0, jnp.nan)

    timeit("forces", forces_only, *splanes, skeys)

    def step(i, p, v):
        st = MDState(p + (i % 2).astype(p.dtype) * 1e-6, v)
        st2, ok = md_step_cubic_tile(st, cutoff, 0.0, CB=CB, MAXJ=MAXJ,
                                     bandmask=bandmask)
        return st2.velocities[0, 0] + jnp.where(ok, 0.0, jnp.nan)

    timeit("step", step, pos, vel)


if __name__ == "__main__":
    main()
