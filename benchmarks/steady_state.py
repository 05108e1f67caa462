#!/usr/bin/env python
"""Steady-state MD benchmark: Verlet-skin grid reuse vs full rebuild.

The reference's steady-state win is `rebuild_mut` topology reuse when no
particle changed cells (zelll src/cellgrid.rs:264-312). The TPU analogue
is the skin loop: steps between rebuilds run sort-free. This harness
measures amortized ms/step for both loops at matched physics (perturbed
lattice, mild velocities) on the thin benchmark box (lag kernel) and a
cubic box (segment-tile kernel).

Usage: python benchmarks/steady_state.py [n] [steps]  (default 1e7, 50)
Env: SS_SKIN (default 0.5), SS_DT (default 1e-4).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def lattice_cloud(n, box, rng):
    """Perturbed lattice filling `box` with ~n points (no overlaps)."""
    vol = float(np.prod(box))
    a = (vol / n) ** (1 / 3)
    dims = [max(int(np.floor(b / a)), 1) for b in box]
    g = np.stack(
        np.meshgrid(*(np.arange(d) for d in dims), indexing="ij"), -1
    ).reshape(-1, 3) * a
    g = g + rng.uniform(-0.05 * a, 0.05 * a, g.shape)
    return g.astype(np.float64)


def time_loop(fn, *args, reps=3):
    out = fn(*args)  # compile + warm
    import jax

    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        # force a real sync through the tunnel with a scalar readback
        float(out[2])
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from zelll_tpu.models.lj_md import (
        MDState,
        md_run,
        md_run_skin,
        md_run_skin_tile,
    )

    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e7)
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    skin = float(os.environ.get("SS_SKIN", "0.5"))
    maxj_env = os.environ.get("SS_MAXJ", "20")
    bandmask = os.environ.get("SS_BANDMASK", "0") == "1"
    dt = float(os.environ.get("SS_DT", "1e-4"))
    cutoff = 10.0
    rng = np.random.default_rng(0)

    # thin benchmark box (BASELINE protocol geometry at density 0.01)
    box_thin = (30.0, 30.0, n / 0.01 / 900.0)
    # cubic box, same density
    side = (n / 0.01) ** (1 / 3)
    box_cube = (side, side, side)

    for name, box in (("thin", box_thin), ("cubic", box_cube)):
        pts = lattice_cloud(n, box, rng)
        vel = rng.normal(0, 0.3, pts.shape)
        st = MDState(
            positions=jnp.asarray(pts, jnp.float32),
            velocities=jnp.asarray(vel, jnp.float32),
        )
        if name == "thin":
            full = lambda s: md_run(s, cutoff, dt, steps=steps, M=16384, L=256)
            skinf = lambda s: md_run_skin(
                s, cutoff, dt, steps=steps, skin=skin, M=16384, L=256
            )
        else:
            import jax.lax as lax

            from zelll_tpu.models.lj_md import md_step_cubic_tile

            if maxj_env == "auto":
                # per-band capacities for the forces kernel's 9 full
                # bands, measured on the skin-grid keys (one host sync)
                from zelll_tpu.core.binning import bin_and_sort
                from zelll_tpu.ops.pallas_pairs import _pad_and_desentinel
                from zelll_tpu.ops.segments import (
                    CHUNK, segment_bands, suggest_maxj,
                )

                bins, _ = bin_and_sort(
                    st.positions, cutoff + skin, max_cells=1,
                    need_perm=False, auto_order=True,
                )
                C = max(-(-n // (CHUNK * 8)) * 8, 8) * CHUNK
                maxj = suggest_maxj(
                    _pad_and_desentinel(bins.sorted_keys, C),
                    segment_bands(bins.info.strides, full=True),
                    half=False, per_band=True,
                )
                # +1 margin: particles drift between rebuilds, so the
                # exact initial windows are a lower bound
                maxj = tuple(m + 1 for m in maxj)
                del bins
                print(f"cubic: auto per-band MAXJ = {maxj}", flush=True)
            else:
                maxj = int(maxj_env)

            def full(s0):
                def body(carry, _):
                    st, okacc = carry
                    st, ok = md_step_cubic_tile(st, cutoff, dt, MAXJ=maxj,
                                                bandmask=bandmask)
                    return (st, okacc & ok), None

                (st, ok), _ = lax.scan(
                    body, (s0, jnp.asarray(True)), None, length=steps
                )
                return st, ok, jnp.sum(st.positions[0])  # scalar for sync

            full = jax.jit(full)
            skinf = lambda s: md_run_skin_tile(
                s, cutoff, dt, steps=steps, skin=skin, MAXJ=maxj,
                bandmask=bandmask,
            )
        t_skin, out = time_loop(skinf, st)
        st2, ok, e, nrb = out
        print(
            f"{name}: skin loop {t_skin / steps * 1e3:.1f} ms/step "
            f"({steps} steps, {int(nrb)} rebuilds, ok={bool(ok)}, "
            f"E={float(e):.6g})",
            flush=True,
        )
        if full is not None:
            t_full, out = time_loop(full, st)
            print(
                f"{name}: full rebuild {t_full / steps * 1e3:.1f} ms/step "
                f"(ok={bool(out[1])})",
                flush=True,
            )


if __name__ == "__main__":
    main()
