#!/usr/bin/env python
"""Cubic-box PBC MD step benchmark (tile forces path) at bench scale.

The production PBC workload: a cubic solvent box, rebuild + forces +
integrate + wrap per step. Compares against the open-boundary cubic MD
step. Env: PBC_N (default 1e7), PBC_REPS (default 5).
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zelll_tpu.ops.pbc import md_step_pbc, suggest_pbc_capacity

N = int(float(os.environ.get("PBC_N", "1e7")))
REPS = int(os.environ.get("PBC_REPS", "5"))
CUTOFF = 10.0
MAXJ = 24
BANDMASK = os.environ.get("PBC_BANDMASK", "0") == "1"
DT = 1e-4


def main():
    side = (N / 0.01) ** (1 / 3)
    box = np.array([side, side, side])
    rng = np.random.default_rng(7)
    pos = jnp.asarray((rng.random((N, 3)) * box), jnp.float32)
    vel = jnp.zeros_like(pos)
    origin = jnp.zeros(3, jnp.float32)
    boxj = jnp.asarray(box, jnp.float32)
    B, G, BE = suggest_pbc_capacity(N, box, CUTOFF, with_multi=True)

    @jax.jit
    def loop(p, v):
        def body(i, carry):
            p, v = carry
            p2, v2, ok = md_step_pbc(
                p, v, origin, boxj, CUTOFF, DT, B=B, G=G, BE=BE,
                path="tile", MAXJ=MAXJ, bandmask=BANDMASK,
            )
            return p2, v2

        return jax.lax.fori_loop(0, REPS, body, (p, v))

    out = loop(pos, vel)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(pos, vel)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    # coverage flag checked once outside the loop
    _, _, ok = md_step_pbc(pos, vel, origin, boxj, CUTOFF, DT, B=B, G=G,
                           BE=BE, path="tile", MAXJ=MAXJ,
                           bandmask=BANDMASK)
    print(json.dumps({
        "metric": f"pbc_md_step_cubic_n{N:.0e}",
        "ms_per_step": ms,
        "B": B, "G": G, "MAXJ": MAXJ,
        "coverage_ok": bool(ok),
    }), flush=True)


if __name__ == "__main__":
    main()
