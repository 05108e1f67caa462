#!/usr/bin/env python
"""Tile-kernel benchmark: cubic + thin boxes at n, vs the existing paths.

Usage: python benchmarks/tile_profile.py [n] [reps]
Env: TP_CB, TP_MAXJ, TP_SHAPE=cubic|thin|both, TP_SPLIT=1
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cutoff = 10.0
    shapes = {
        "cubic": ((n / 0.01) ** (1 / 3),) * 3,
        "thin": (30.0, 30.0, n / 0.01 / 900),
    }
    which = os.environ.get("TP_SHAPE", "both")
    if which != "both":
        shapes = {which: shapes[which]}

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from zelll_tpu.core.binning import bin_and_sort
    from zelll_tpu.ops.pallas_pairs import combine_count, count_term, split_f64
    from zelll_tpu.ops.tile_pairs import tile_pair_reduce

    CB = int(os.environ.get("TP_CB", "8"))
    MAXJ = int(os.environ.get("TP_MAXJ", "12"))
    split = os.environ.get("TP_SPLIT") == "1"
    kahan = os.environ.get("TP_KAHAN", "1") == "1"
    OH = int(os.environ.get("TP_OH", "128"))
    PACKED = os.environ.get("TP_PACKED", "0") == "1"

    from zelll_tpu.utils.profiling import measure_rtt

    rtt = measure_rtt()
    print(f"n={n} reps={reps} CB={CB} MAXJ={MAXJ} split={split} kahan={kahan} OH={OH} packed={PACKED} rtt={rtt*1e3:.1f}ms",
          flush=True)
    print("shape,stage,ms,extra", flush=True)

    for name, box in shapes.items():
        rng = np.random.default_rng(0)
        pts64 = rng.uniform(0, 1, (n, 3)) * np.asarray(box)
        pos = jax.device_put(jnp.asarray(pts64, jnp.float32))
        pos_lo = (
            jax.device_put(jnp.asarray(pts64 - np.asarray(pos, np.float64),
                                       jnp.float32))
            if split else None
        )

        def full(p):
            lo = pos_lo
            cols = p if lo is None else jnp.concatenate([p, lo], axis=1)
            bins, sp = bin_and_sort(cols, cutoff, max_cells=1, need_perm=False)
            hi = sp[:, :3]
            slo = sp[:, 3:] if lo is not None else None
            e, ok = tile_pair_reduce(
                hi, bins.sorted_keys, bins.info.strides,
                jnp.float32(cutoff) ** 2, slo, CB=CB, MAXJ=MAXJ, kahan=kahan, OH=OH, packed=PACKED,
            )
            return e, ok

        def count(p):
            bins, sp = bin_and_sort(p, cutoff, max_cells=1, need_perm=False)
            c, ok = tile_pair_reduce(
                sp, bins.sorted_keys, bins.info.strides,
                jnp.float32(cutoff) ** 2, CB=CB, MAXJ=MAXJ, OH=OH, packed=PACKED,
                term=count_term, out_dtype=jnp.int32,
            )
            return c, ok

        def sort_only(p):
            bins, sp = bin_and_sort(p, cutoff, max_cells=1, need_perm=False)
            return sp[-1], bins.sorted_keys[-1]

        def timeit(fn):
            f = jax.jit(fn)
            out = f(pos)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.asarray(leaf).reshape(-1)[0])
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(pos)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.asarray(leaf).reshape(-1)[0])
            return (time.perf_counter() - t0 - rtt) / reps, out

        t_sort, _ = timeit(sort_only)
        t_count, _ = timeit(count)
        t_full, (e, ok) = timeit(full)
        assert bool(ok), "tile coverage failed — raise TP_MAXJ"
        packed, ok2 = jax.jit(count)(pos)
        npairs = combine_count(np.asarray(packed))
        print(f"{name},sort,{t_sort*1e3:.1f},", flush=True)
        print(f"{name},count,{t_count*1e3:.1f},", flush=True)
        print(f"{name},kernel,{(t_full-t_sort)*1e3:.1f},", flush=True)
        print(
            f"{name},full,{t_full*1e3:.1f},pairs={npairs} "
            f"pps={npairs/t_full:.3g} e/atom={float(e)/n:.6f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
