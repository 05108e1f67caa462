#!/usr/bin/env python
"""SDF query throughput: l^3 grid evaluations over a structure, CSV.

The analogue of the reference's surface-sampling query benchmark
(surface-sampling/scripts/sdf_queries.sh + cli.rs:150-195): evaluate the
smooth distance field (value + gradient) on an l^3 grid for several
cutoffs and report total nanoseconds. Queries are batched into one device
pass (the reference evaluates point-by-point).

Usage: python benchmarks/sdf_queries.py [pdb] [l=64]
Without a PDB a synthetic 2000-atom globular structure is used.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_protein(n=2000, radius=15.0, seed=0):
    rng = np.random.default_rng(seed)
    r = radius * rng.random(n) ** (1 / 3)
    theta = np.arccos(2 * rng.random(n) - 1)
    phi = 2 * np.pi * rng.random(n)
    pos = np.stack(
        [
            r * np.sin(theta) * np.cos(phi),
            r * np.sin(theta) * np.sin(phi),
            r * np.cos(theta),
        ],
        -1,
    )
    radii = rng.choice([1.7, 1.55, 1.52, 1.09], n, p=[0.5, 0.15, 0.2, 0.15])
    return pos, radii


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    from zelll_tpu.models.psssh import eval_grid
    from zelll_tpu.models.sdf import SmoothDistanceField
    from zelll_tpu.utils.pdb import read_pdb

    pdb = sys.argv[1] if len(sys.argv) > 1 else None
    l = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if pdb:
        pos, radii, _ = read_pdb(pdb)
    else:
        pos, radii = synthetic_protein()

    methods = os.environ.get("SDF_METHODS", "join,xla").split(",")
    print("method,cutoff,l,queries,ns_total,us_per_query")
    for method in methods:
        for cutoff in (1.0, 2.0, 5.0, 10.0):
            sdf = SmoothDistanceField(pos, radii, cutoff=cutoff,
                                      method=method)
            eval_grid(sdf, l)  # compile + warm
            _, vals, grads, dt = eval_grid(sdf, l)
            q = l**3
            print(f"{method},{cutoff},{l},{q},{dt * 1e9:.0f},"
                  f"{dt / q * 1e6:.3f}", flush=True)


if __name__ == "__main__":
    main()
