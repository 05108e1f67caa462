#!/usr/bin/env python
"""Multi-chip weak/strong scaling harness for the sharded MD step.

On a real pod slice this measures ICI halo-exchange scaling; in this
environment it validates on the virtual CPU mesh (set JAX_PLATFORMS=cpu
and XLA_FLAGS=--xla_force_host_platform_device_count=<D>).

Usage: python benchmarks/scaling.py [n_per_device=20000] [mode=weak|strong]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_per = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "weak"

    import jax

    # this environment's sitecustomize overrides JAX_PLATFORMS; force the
    # requested platform via config (cpu needed for the virtual mesh)
    plat = os.environ.get("SCALING_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zelll_tpu.parallel import make_mesh, partition_by_slab, sharded_md_step
    from zelll_tpu.utils.datagen import generate_points_random

    ndev_all = jax.device_count()
    cutoff = 10.0
    print("devices,n,step_ms,energy", flush=True)

    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev_all]
    for ndev in sizes:
        n = n_per * (ndev if mode == "weak" else 1)
        # box grows with n along z (constant density)
        c = n / 0.01 / 900
        pts = generate_points_random(n, (30.0, 30.0, c))

        mesh = make_mesh(ndev)
        parts, n_local = partition_by_slab(pts, cutoff, ndev)
        sharding = NamedSharding(mesh, P("z", None))
        pos = jax.device_put(jnp.asarray(parts, jnp.float32), sharding)
        vel = jax.device_put(jnp.zeros_like(pos), sharding)

        H = max(256, int(4 * n_local ** (2 / 3)))
        step = sharded_md_step(mesh, cutoff=cutoff, H=min(H, n_local), K=40,
                               chunk=128, dt=1e-6)
        p2, v2, e, cov = step(pos, vel)
        assert bool(cov), "coverage failed: raise H/K"
        float(e)  # forced readback (block_until_ready alone can be async
        # through the axon tunnel)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            p2, v2, e, cov = step(p2, v2)
        float(e)
        dt = (time.perf_counter() - t0) / reps
        print(f"{ndev},{n},{dt * 1e3:.2f},{float(e):.6g}", flush=True)


if __name__ == "__main__":
    main()
