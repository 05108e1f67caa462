#!/usr/bin/env python
"""Stage-level profile + T/M/L sweep for the cubic-box column path.

Times, at n (default 1e7) in a cubic box at reference density:
  expand  — column_expand alone (4x copy + keys + flags)
  sort    — the 4n-row multi-operand sort alone
  kernel  — pair_lag_reduce alone on presorted planes
  full    — column_pair_sum end to end
for each (T, M, L) config. Prints CSV to stdout.

Usage: python benchmarks/cubic_profile.py [n] [reps]
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
    side = (n / 0.01) ** (1 / 3)

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from zelll_tpu.ops.columns import column_expand, column_pair_sum
    from zelll_tpu.ops.pallas_pairs import lj_term, pair_lag_reduce

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, side, (n, 3))
    pos = jax.device_put(jnp.asarray(pts, jnp.float32))

    from zelll_tpu.utils.profiling import measure_rtt

    rtt = measure_rtt()

    def timeit(fn, *args):
        """fn must return a scalar-reducible pytree; jitted loop timing."""
        f = jax.jit(fn)

        def sync(out):
            # block_until_ready can return early through the tunnel: force
            # a scalar readback (CLAUDE.md timing gotcha)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.asarray(leaf).reshape(-1)[0])

        sync(f(*args))  # compile + warm, fully drained
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        sync(out)
        return (time.perf_counter() - t0 - rtt) / reps

    print("T,M,L,expand_ms,sort_ms,kernel_ms,full_ms,pairs_per_s,cov_ok", flush=True)

    for T in (int(os.environ.get("CP_T", "0")),) if os.environ.get("CP_T") else (2, 3):
        for M, L in (
            ((16384, 384), (32768, 384), (16384, 512), (32768, 512))
            if not os.environ.get("CP_ML")
            else [tuple(map(int, os.environ["CP_ML"].split(",")))]
        ):
            # L must cover the column window: skip configs that can't
            w_slots = (T + 2) ** 2 * 12 + (T + 2) * 12  # ~density 10 + margin
            if L < 0.8 * w_slots:
                continue
            # stage: expand
            def expand_fn(p):
                pos4, keys, owner, s_local, valid, hok, colspan = column_expand(
                    p, cutoff, T
                )
                return keys.sum(), owner.sum()

            t_expand = timeit(expand_fn, pos)

            # stage: expand + sort (owner derived post-sort, as in the path)
            def sort_fn(p):
                pos4, keys, owner, s_local, valid, hok, colspan = column_expand(
                    p, cutoff, T
                )
                out = jax.lax.sort(
                    (keys, pos4[:, 0], pos4[:, 1], pos4[:, 2]),
                    num_keys=1, is_stable=False,
                )
                return out[0][-1], out[1][-1]

            t_sort = timeit(sort_fn, pos) - t_expand

            # full path
            def full_fn(p):
                e, ok = column_pair_sum(p, cutoff, T=T, M=M, L=L)
                return e, ok

            e_val, cov_ok = jax.jit(full_fn)(pos)
            cov_ok = bool(cov_ok)
            t_full = timeit(full_fn, pos)
            t_kernel = t_full - t_expand - t_sort

            # pairs (reference density): ~16.07 pairs/particle at this proto
            pairs = 16.07 * n / 2 * 2  # rough; exact printed by cubic.py
            print(
                f"{T},{M},{L},{t_expand*1e3:.1f},{t_sort*1e3:.1f},"
                f"{t_kernel*1e3:.1f},{t_full*1e3:.1f},"
                f"{1.607e8 * (n/1e7) / t_full:.3g},{int(cov_ok)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
