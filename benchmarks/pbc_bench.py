#!/usr/bin/env python
"""PBC overhead benchmark: full rebuild + LJ under periodic vs open
boundaries at bench scale (thin box, lag path).

Prints one JSON line per mode with ms/step and pairs/s. Protocol matches
bench.py (k jitted iterations in one fori_loop with input perturbation,
scalar readback), so numbers are comparable to the headline.

Env: PBC_N (default 1e7), PBC_REPS (default 5).
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

from zelll_tpu.ops.fused import fused_lj_rebuild_energy
from zelll_tpu.ops.pbc import pbc_pair_sum, suggest_pbc_capacity
from zelll_tpu.utils.datagen import generate_points_random, lj_box

N = int(float(os.environ.get("PBC_N", "1e7")))
REPS = int(os.environ.get("PBC_REPS", "5"))
CUTOFF = 10.0
M, L = 16384, 256


def timed(fn, pos, reps):
    """k iterations inside one jit with index perturbation (the RTT-proof
    protocol from bench.py)."""

    @jax.jit
    def loop(p):
        def body(i, acc):
            e, ok = fn(p + i * jnp.float32(1e-6))
            return acc + e

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(loop(pos))  # compile + warm
    t0 = time.perf_counter()
    float(loop(pos))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    box = lj_box(N, CUTOFF)
    pts = generate_points_random(N, box)
    pos = jnp.asarray(pts, jnp.float32)
    origin = jnp.zeros(3, jnp.float32)
    boxj = jnp.asarray(box, jnp.float32)

    B, G = suggest_pbc_capacity(N, box, CUTOFF)

    open_ms = timed(
        lambda p: fused_lj_rebuild_energy(p, CUTOFF, M=M, L=L), pos, REPS
    )
    pbc_ms = timed(
        lambda p: pbc_pair_sum(
            p, origin, boxj, CUTOFF, B=B, G=G, M=M, L=L
        ),
        pos,
        REPS,
    )
    print(json.dumps({
        "metric": f"pbc_overhead_thin_n{N:.0e}",
        "open_ms": open_ms,
        "pbc_ms": pbc_ms,
        "overhead": pbc_ms / open_ms,
        "B": B, "G": G, "M": M, "L": L,
        "note": "thin bench box is 3 cutoffs wide in x/y: ~90% of "
                "particles are boundary — the ghost-extension worst case",
    }), flush=True)

    # round 9: in-kernel minimum image on the narrow x/y axes — only the
    # long axis keeps a ghost shell (~0.2% of particles), so periodic
    # cost should approach open-boundary cost on this very box
    from zelll_tpu.ops.pbc import minimage_axes

    Bm, Gm = suggest_pbc_capacity(N, box, CUTOFF,
                                  axes=~minimage_axes(box, CUTOFF))
    Lm = int(os.environ.get("PBC_MI_L", str(L)))
    mi_ms = timed(
        lambda p: pbc_pair_sum(
            p, origin, boxj, CUTOFF, B=Bm, G=Gm, M=M, L=Lm,
            minimage="auto",
        ),
        pos,
        REPS,
    )
    _, okm = pbc_pair_sum(
        pos, origin, boxj, CUTOFF, B=Bm, G=Gm, M=M, L=Lm, minimage="auto"
    )
    print(json.dumps({
        "metric": f"pbc_minimage_thin_n{N:.0e}",
        "open_ms": open_ms,
        "pbc_ms": mi_ms,
        "overhead": mi_ms / open_ms,
        "B": Bm, "G": Gm, "M": M, "L": Lm, "coverage_ok": bool(okm),
    }), flush=True)

    # cubic box — the realistic PBC workload (solvent box): ~6% boundary
    from zelll_tpu.ops.segments import suggest_maxj
    from zelll_tpu.ops.tile_pairs import tile_lj_rebuild_energy

    side = (N / 0.01) ** (1 / 3)
    boxc = np.array([side, side, side])
    rng = np.random.default_rng(7)
    ptsc = (rng.random((N, 3)) * boxc).astype(np.float32)
    posc = jnp.asarray(ptsc)
    boxcj = jnp.asarray(boxc, jnp.float32)
    Bc, Gc, BEc = suggest_pbc_capacity(N, boxc, CUTOFF, with_multi=True)
    MAXJ = 24
    BMASK = os.environ.get("PBC_BANDMASK", "0") == "1"  # maskless default

    open_c = timed(
        lambda p: tile_lj_rebuild_energy(p, CUTOFF, MAXJ=MAXJ,
                                         bandmask=BMASK, safe_term=BMASK,
                                         kahan=False), posc, REPS
    )
    pbc_c = timed(
        lambda p: pbc_pair_sum(
            p, origin, boxcj, CUTOFF, B=Bc, G=Gc, BE=BEc, path="tile",
            MAXJ=MAXJ, bandmask=BMASK, kahan=False,
        ),
        posc,
        REPS,
    )
    # flag check outside the timing loop (host sync)
    _, okc = pbc_pair_sum(
        posc, origin, boxcj, CUTOFF, B=Bc, G=Gc, BE=BEc, path="tile",
        MAXJ=MAXJ, bandmask=BMASK,
    )
    print(json.dumps({
        "metric": f"pbc_overhead_cubic_n{N:.0e}",
        "open_ms": open_c,
        "pbc_ms": pbc_c,
        "overhead": pbc_c / open_c,
        "B": Bc, "G": Gc, "MAXJ": MAXJ, "coverage_ok": bool(okc),
    }), flush=True)


if __name__ == "__main__":
    main()
