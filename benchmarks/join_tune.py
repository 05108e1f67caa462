#!/usr/bin/env python
"""Join-kernel tuning sweep: us/query vs (CB, query count, atom count).

Run on the real TPU to pick the chunk-block factor CB for the fused
query join (`ops.join` / `ops.sdf_join`). Prints CSV:

    natoms,nq,CB,us_per_query,total_ms

Env: ATOMS (default "2000,20000,100000"), QUERIES ("4096,65536,262144"),
CBS ("8,16,32"), REPS (5).
"""

import os
import sys
import time

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_here, ".."))
sys.path.insert(0, _here)

from sdf_queries import synthetic_protein  # noqa: E402


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache")
    )
    import jax.numpy as jnp

    from zelll_tpu.models.sdf import SmoothDistanceField, _sdf_join_batch

    atoms = [int(x) for x in os.environ.get(
        "ATOMS", "2000,20000,100000").split(",")]
    queries = [int(x) for x in os.environ.get(
        "QUERIES", "4096,65536,262144").split(",")]
    cbs = [int(x) for x in os.environ.get("CBS", "8,16,32").split(",")]
    reps = int(os.environ.get("REPS", "5"))

    rng = np.random.default_rng(0)
    print("natoms,nq,CB,us_per_query,total_ms", flush=True)
    for na in atoms:
        pos, radii = synthetic_protein(n=na, radius=8.0 * (na / 2e3) ** (1 / 3))
        sdf = SmoothDistanceField(pos, radii, cutoff=4.0, method="join")
        lo, hi = pos.min(0) - 2, pos.max(0) + 2
        for nq in queries:
            q = jnp.asarray(
                rng.uniform(lo, hi, (nq, 3)),
                sdf.data.grid.sorted_pos.dtype,
            )
            for cb in cbs:
                v, g, valid, ok = _sdf_join_batch(sdf._join, q, CB=cb)
                jax.block_until_ready(v)
                assert bool(ok)
                t0 = time.perf_counter()
                for r in range(reps):
                    v, g, _, _ = _sdf_join_batch(sdf._join, q + 1e-6 * r,
                                                 CB=cb)
                float(jnp.sum(v))  # scalar readback forces a real sync
                dt = (time.perf_counter() - t0) / reps
                print(f"{na},{nq},{cb},{dt / nq * 1e6:.3f},{dt * 1e3:.2f}",
                      flush=True)


if __name__ == "__main__":
    main()
