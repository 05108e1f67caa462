#!/usr/bin/env python
"""Steady-state PBC MD benchmark: Verlet-skin ghost reuse vs full rebuild.

The PBC sibling of steady_state.py: the skin loops build the grid AND the
ghost images with margin cutoff+skin and reuse both while no particle
drifted more than skin/2, so steps between rebuilds are sort-free and
ghost rows track their parents with G-sized gathers. Cubic box on the
segment-tile kernel (`md_run_skin_tile_pbc`); the thin benchmark box runs
the lag kernel (`md_run_skin_pbc`).

Usage: python benchmarks/pbc_steady_state.py [n] [steps]  (default 1e7, 50)
Env: SS_SKIN (default 0.5), SS_DT (default 1e-4), SS_MAXJ (default 20).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from steady_state import lattice_cloud, time_loop  # noqa: E402


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from zelll_tpu.models.lj_md import (
        MDState,
        md_run_skin_pbc,
        md_run_skin_tile_pbc,
    )
    from zelll_tpu.ops.pbc import md_step_pbc, suggest_pbc_capacity

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e7)
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    skin = float(os.environ.get("SS_SKIN", "0.5"))
    maxj = int(os.environ.get("SS_MAXJ", "20"))
    dt = float(os.environ.get("SS_DT", "1e-4"))
    cutoff = 10.0
    rng = np.random.default_rng(0)

    side = (n / 0.01) ** (1 / 3)
    box_cube = (side, side, side)
    box_thin = (30.0, 30.0, n / 0.01 / 900.0)

    for name, box in (("cubic", box_cube), ("thin", box_thin)):
        pts = lattice_cloud(n, box, rng)
        vel = rng.normal(0, 0.3, pts.shape)
        st = MDState(
            positions=jnp.asarray(pts, jnp.float32),
            velocities=jnp.asarray(vel, jnp.float32),
        )
        origin = jnp.zeros(3, jnp.float32)
        boxj = jnp.asarray(box, jnp.float32)
        B, G = suggest_pbc_capacity(n, np.asarray(box), cutoff + skin)
        if name == "cubic":
            skinf = lambda s: md_run_skin_tile_pbc(  # noqa: E731
                s, origin, boxj, cutoff, dt, steps=steps, B=B, G=G,
                skin=skin, MAXJ=maxj,
            )
            path = "tile"
        else:
            skinf = lambda s: md_run_skin_pbc(  # noqa: E731
                s, origin, boxj, cutoff, dt, steps=steps, B=B, G=G,
                skin=skin, M=16384, L=256,
            )
            path = "lag"

        t_skin, out = time_loop(skinf, st)
        st2, ok, e, nrb = out
        print(
            f"pbc {name}: skin loop {t_skin / steps * 1e3:.1f} ms/step "
            f"({steps} steps, {int(nrb)} rebuilds, ok={bool(ok)}, "
            f"E={float(e):.6g})",
            flush=True,
        )

        # full-rebuild reference loop on the same kernel path
        B2, G2 = suggest_pbc_capacity(n, np.asarray(box), cutoff)

        def full(s0, _path=path, _B=B2, _G=G2):
            import jax.lax as lax

            def body(carry, _):
                p, v, okacc = carry
                kw = dict(B=_B, G=_G)
                if _path == "tile":
                    kw.update(path="tile", MAXJ=maxj)
                else:
                    kw.update(path="lag", M=16384, L=256)
                p2, v2, ok = md_step_pbc(
                    p, v, origin, boxj, cutoff, dt, **kw
                )
                return (p2, v2, okacc & ok), None

            (p, v, ok), _ = lax.scan(
                body, (s0.positions, s0.velocities, jnp.asarray(True)),
                None, length=steps,
            )
            return p, v, jnp.sum(p[0]), ok  # [2] scalar for sync

        full = jax.jit(full)
        t_full, outf = time_loop(full, st)
        print(
            f"pbc {name}: full rebuild {t_full / steps * 1e3:.1f} ms/step "
            f"(ok={bool(outf[3])})",
            flush=True,
        )


if __name__ == "__main__":
    main()
