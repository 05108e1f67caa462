#!/usr/bin/env python
"""Thermodynamic observables benchmark: virial / fused stress / NPT step
cost on top of the plain energy/forces passes, at bench scale.

Prints one JSON line per observable with ms/step. Protocol matches
bench.py (k jitted iterations in one fori_loop with input perturbation,
scalar readback) so numbers are comparable to the headline.

Modes (independent flags — each adds its block):
* thin box (lag path, always on): virial vs energy, direct-pair-sum
  stress vs energy
* cubic box (tile path): OBS_CUBIC=1 — virial + stress on the tile kernel
* PBC cubic: OBS_PBC=1 — pbc_virial + one-pass shift-sign-masked
  pbc_stress_fused (round 9; the round-8 three-pass decomposition is
  superseded)

Env: OBS_N (default 1e7), OBS_REPS (default 5), OBS_CUBIC, OBS_PBC.
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
from zelll_tpu.ops.virial import virial_rebuild, fused_stress_open
from zelll_tpu.utils.datagen import generate_points_random, lj_box

N = int(float(os.environ.get("OBS_N", "1e7")))
REPS = int(os.environ.get("OBS_REPS", "5"))
CUTOFF = 10.0
M, L = 16384, 256


def timed_scalar(fn, pos, reps):
    @jax.jit
    def loop(p):
        def body(i, acc):
            out = fn(p + i * jnp.float32(1e-6))
            leaves = jax.tree_util.tree_leaves(out)
            return acc + jnp.sum(leaves[0]).astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(loop(pos))  # compile + warm
    t0 = time.perf_counter()
    float(loop(pos))
    return (time.perf_counter() - t0) / reps * 1e3


def emit(name, ms, baseline_ms=None):
    row = {"metric": name, "ms_per_step": round(ms, 2)}
    if baseline_ms:
        row["x_over_baseline"] = round(ms / baseline_ms, 3)
    print(json.dumps(row), flush=True)


def main():
    box = lj_box(N, CUTOFF)
    pts = generate_points_random(N, box)
    pos = jnp.asarray(pts, jnp.float32)

    e_ms = timed_scalar(
        lambda p: fused_lj_rebuild_energy(p, CUTOFF, M=M, L=L)[0], pos, REPS
    )
    emit("thin_energy", e_ms)
    w_ms = timed_scalar(
        lambda p: virial_rebuild(p, CUTOFF, M=M, L=L)[0], pos, REPS
    )
    emit("thin_virial", w_ms, e_ms)
    s_ms = timed_scalar(
        lambda p: fused_stress_open(p, CUTOFF, M=M, L=L)[0], pos, REPS
    )
    emit("thin_stress_rf", s_ms, e_ms)

    want_cubic = os.environ.get("OBS_CUBIC", "0") == "1"
    want_pbc = os.environ.get("OBS_PBC", "0") == "1"
    if want_cubic or want_pbc:
        # shared cubic fixture (OBS_PBC runs on the same box, so either
        # flag alone gets a working benchmark)
        from zelll_tpu.ops.pallas_pairs import lj_term
        from zelll_tpu.ops.tile_pairs import tile_lj_rebuild_energy
        from zelll_tpu.ops.virial import lj_virial_term

        side = (N / 0.01) ** (1 / 3)
        cpts = generate_points_random(N, (side, side, side))
        cpos = jnp.asarray(cpts, jnp.float32)
        MAXJ = int(os.environ.get("OBS_MAXJ", "24"))
        ce_ms = timed_scalar(
            lambda p: tile_lj_rebuild_energy(p, CUTOFF, MAXJ=MAXJ,
                                             term=lj_term)[0], cpos, REPS
        )
        emit("cubic_energy", ce_ms)

    if want_cubic:
        cw_ms = timed_scalar(
            lambda p: tile_lj_rebuild_energy(p, CUTOFF, MAXJ=MAXJ,
                                             term=lj_virial_term)[0],
            cpos, REPS,
        )
        emit("cubic_virial", cw_ms, ce_ms)
        cs_ms = timed_scalar(
            lambda p: fused_stress_open(p, CUTOFF, path="tile",
                                        MAXJ=MAXJ)[0], cpos, REPS
        )
        emit("cubic_stress_pair", cs_ms, ce_ms)

    if want_pbc:
        from zelll_tpu.ops.pbc import suggest_pbc_capacity
        from zelll_tpu.ops.virial import pbc_stress_fused, pbc_virial

        origin = jnp.zeros(3, jnp.float32)
        boxj = jnp.full((3,), np.float32(side))
        B, G = suggest_pbc_capacity(N, (side,) * 3, CUTOFF)
        pw_ms = timed_scalar(
            lambda p: pbc_virial(p, origin, boxj, CUTOFF, path="tile",
                                 B=B, G=G, MAXJ=MAXJ)[0], cpos, REPS
        )
        emit("pbc_virial_tile", pw_ms, ce_ms)
        ps_ms = timed_scalar(
            lambda p: pbc_stress_fused(p, origin, boxj, CUTOFF,
                                       path="tile", B=B, G=G,
                                       MAXJ=MAXJ)[0], cpos, REPS
        )
        emit("pbc_stress_tile_1pass", ps_ms, ce_ms)


if __name__ == "__main__":
    main()
