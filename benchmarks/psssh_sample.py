#!/usr/bin/env python
"""Sampler throughput for the psssh surface-sampling workload, CSV.

The reference CLI drives one nuts-rs chain on one core
(surface-sampling/examples/cli.rs:87-122); the TPU path runs thousands
of chains in lockstep with one fused SDF-join dispatch per leapfrog.
Measures wall time and draw throughput for the batched samplers:

    sampler,chains,burnin,draws,grad_path,seconds,draws_per_s

Usage: python benchmarks/psssh_sample.py [pdb]
Env: CHAINS (default 1024), BURNIN (200), DRAWS (50),
     SAMPLERS (hmc,nuts-batched), GRAD (join,xla).
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

    from zelll_tpu.models.nuts import (
        hmc_sample_batched, nuts_sample_batched,
    )
    from zelll_tpu.models.sdf import SmoothDistanceField
    from zelll_tpu.utils.pdb import read_pdb

    if len(sys.argv) > 1:
        pos, radii, _ = read_pdb(sys.argv[1])
    else:
        pos, radii = synthetic_protein()

    chains = int(os.environ.get("CHAINS", "1024"))
    burnin = int(os.environ.get("BURNIN", "200"))
    draws = int(os.environ.get("DRAWS", "50"))
    samplers = os.environ.get("SAMPLERS", "hmc,nuts-batched").split(",")
    grads = os.environ.get("GRAD", "join,xla").split(",")

    rng = np.random.default_rng(0)
    starts = pos[rng.integers(0, len(pos), chains)] + rng.normal(
        0, 0.1, (chains, 3)
    )
    fns = {"hmc": hmc_sample_batched, "nuts-batched": nuts_sample_batched}

    print("sampler,chains,burnin,draws,grad_path,seconds,draws_per_s",
          flush=True)
    for grad_path in grads:
        sdf = SmoothDistanceField(pos, radii, cutoff=4.0, method=grad_path)
        vgrad = sdf.hmc_vgrad_fn() if grad_path == "join" else None
        logp = None if grad_path == "join" else sdf.logdensity_fn()
        for name in samplers:
            fn = fns[name]

            def run(key):
                return fn(
                    logp, jnp.asarray(starts), key,
                    num_warmup=burnin, num_samples=draws,
                    value_and_grad_fn=vgrad,
                )

            s, a = run(jax.random.PRNGKey(0))  # compile + warm
            jax.block_until_ready((s, a))
            t0 = time.perf_counter()
            s, a = run(jax.random.PRNGKey(1))
            # force a real sync through a scalar readback (tunnel RTT
            # can make block_until_ready return early — CLAUDE.md)
            float(jnp.sum(s))
            dt = time.perf_counter() - t0
            total = draws * chains
            print(f"{name},{chains},{burnin},{draws},{grad_path},"
                  f"{dt:.3f},{total / dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
