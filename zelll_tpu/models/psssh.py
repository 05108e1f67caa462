"""psssh: Protein Structure Surface Sampling using HMC — end-to-end app.

TPU-native re-design of the reference case study crate
(surface-sampling/examples/cli.rs): sample points on a protein iso-surface
defined by the smooth distance field, driven by cell-list neighbor queries.

Two subcommands, mirroring the reference CLI:
* sample: burn-in + draws on the harmonic iso-surface log density, written
  out as a PDB point cloud (cli.rs:63-143). The TPU path runs many chains
  at once (`chains` parameter): `sampler="hmc"` (jittered-length HMC) or
  `sampler="nuts-batched"` (device-side lockstep NUTS,
  `nuts.nuts_sample_batched`); `sampler="nuts"` gives the single-chain
  host-recursion NUTS matching the reference's nuts-rs usage.
* eval: evaluate SDF value+gradient over an l^3 query grid around the
  structure, reporting timing (cli.rs:150-195) — batched into one device
  pass instead of the reference's per-point loop.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pdb import read_pdb, write_points_pdb
from .nuts import hmc_sample_batched, nuts_sample, nuts_sample_batched
from .sdf import SmoothDistanceField

__all__ = ["sample_surface", "sample_surface_sharded", "eval_grid", "main"]


def sample_surface(
    sdf: SmoothDistanceField,
    *,
    chains: int = 256,
    burnin: int = 300,
    draws: int = 20,
    seed: int = 0,
    sampler: str = "hmc",
    nuts_depth: int = 7,
):
    """Sample points near the iso-surface. Returns (points (draws*chains, 3)).

    Chains start at randomly jittered atom positions (inside the grid so
    logp is finite), like the reference seeding near the structure.
    ``nuts_depth`` caps the NUTS tree depth (cli.rs:42-46, maxdepth).
    """
    atoms = np.asarray(sdf.data.grid.sorted_pos)
    rng = np.random.default_rng(seed)

    if sampler == "nuts":
        # single-chain host-recursion NUTS (reference parity path). Every
        # leapfrog is one tiny gradient evaluation, so it runs on the CPU
        # backend when available: per-dispatch latency beats an accelerator
        # tunnel's RTT by orders of magnitude at psssh scales.
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None

        if cpu is not None:
            with jax.default_device(cpu):
                cpu_sdf = SmoothDistanceField(
                    np.asarray(sdf.data.grid.sorted_pos, np.float64),
                    np.asarray(sdf.data.radii_sorted[:-1], np.float64),
                    cutoff=float(sdf.data.cutoff),
                    surface_radius=sdf.surface_radius,
                    k_force=sdf.k_force,
                )

            def vg(q):
                with jax.default_device(cpu):
                    v, g, ok = cpu_sdf.hmc_gradient(q[None, :])
                if not ok[0]:
                    return -np.inf, np.zeros(3)
                return float(v[0]), np.asarray(g[0])
        else:
            def vg(q):
                v, g, ok = sdf.hmc_gradient(q[None, :])
                if not ok[0]:
                    return -np.inf, np.zeros(3)
                return float(v[0]), np.asarray(g[0])

        q0 = atoms[rng.integers(len(atoms))] + rng.normal(0, 0.1, 3)
        samples, _ = nuts_sample(
            vg, q0, num_warmup=burnin, num_samples=draws * chains,
            max_treedepth=nuts_depth, seed=seed,
        )
        return samples

    starts = atoms[rng.integers(0, len(atoms), chains)] + rng.normal(
        0, 0.1, (chains, 3)
    )
    # batched chains: analytic join-kernel gradients when the structure
    # fits (one fused dispatch per leapfrog for ALL chains); XLA autodiff
    # gather path otherwise
    vgrad = sdf.hmc_vgrad_fn() if sdf._use_join() else None
    logp = sdf.logdensity_fn()
    key = jax.random.PRNGKey(seed)
    kw = {}
    if sampler == "nuts-batched":
        sample_fn = nuts_sample_batched
        kw["max_treedepth"] = nuts_depth
    else:
        sample_fn = hmc_sample_batched
    samples, accept = sample_fn(
        logp,
        jnp.asarray(starts),
        key,
        num_warmup=burnin,
        num_samples=draws,
        value_and_grad_fn=vgrad,
        **kw,
    )
    return np.asarray(samples).reshape(-1, 3)


def sample_surface_sharded(
    sdf: SmoothDistanceField,
    *,
    chains: int = 1024,
    burnin: int = 300,
    draws: int = 20,
    seed: int = 0,
    sampler: str = "nuts-batched",
    mesh=None,
    **sampler_kw,
):
    """Multi-chip surface sampling: chains block-sharded over the mesh.

    Sampling is embarrassingly parallel along the chain axis — the
    structure (SDF particle planes) is replicated to every device and
    each device advances its chain block under the batched sampler
    (`nuts_sample_batched` or `hmc_sample_batched`) with a device-folded
    PRNG key, so streams are independent across devices. No collectives
    on the hot path; with the join kernel each device runs one fused
    dispatch per leapfrog for its whole block. ``chains`` is rounded up
    to a multiple of the device count. Returns (draws*chains, 3) points.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import make_mesh

    mesh = mesh if mesh is not None else make_mesh()
    ndev = int(mesh.devices.size)
    axis = mesh.axis_names[0]
    chains = -(-chains // ndev) * ndev

    atoms = np.asarray(sdf.data.grid.sorted_pos)
    rng = np.random.default_rng(seed)
    starts = atoms[rng.integers(0, len(atoms), chains)] + rng.normal(
        0, 0.1, (chains, 3)
    )
    use_join = sdf._use_join()
    vgrad = sdf.hmc_vgrad_fn() if use_join else None
    logp = None if use_join else sdf.logdensity_fn()
    sample_fn = (
        nuts_sample_batched if sampler == "nuts-batched"
        else hmc_sample_batched
    )

    def body(q0_block):
        key = jax.random.fold_in(
            jax.random.PRNGKey(seed), jax.lax.axis_index(axis)
        )
        s, a = sample_fn(
            logp, q0_block, key, num_warmup=burnin, num_samples=draws,
            value_and_grad_fn=vgrad, **sampler_kw,
        )
        return s, a

    samples, _ = jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=(P(None, axis), P(None, axis)),
            check_vma=False,  # pallas_call outputs carry no vma
        )
    )(jnp.asarray(starts, sdf.data.grid.sorted_pos.dtype))
    return np.asarray(samples).reshape(-1, 3)


def eval_grid(sdf: SmoothDistanceField, l: int = 64, margin: float = 0.0):
    """SDF value+gradient over an l^3 grid spanning the structure's AABB
    (plus optional margin; the reference grid spans exactly the AABB,
    cli.rs:160-176). Returns (points, values, grads, elapsed_seconds) —
    the reference's `eval` benchmark (cli.rs:150-195)."""
    pos = np.asarray(sdf.data.grid.sorted_pos)
    lo = pos.min(axis=0) - margin
    hi = pos.max(axis=0) + margin
    axes = [np.linspace(lo[a], hi[a], l) for a in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)

    t0 = time.perf_counter()
    vals, grads, ok = sdf.evaluate(grid)
    elapsed = time.perf_counter() - t0
    return grid, vals, grads, elapsed


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(prog="psssh", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    # flag names and defaults mirror the reference CLI (cli.rs:19-61);
    # --chains/--seed/--sampler are TPU-batching extensions
    sp = sub.add_parser("sample", help="sample iso-surface points")
    sp.add_argument("pdb")
    sp.add_argument("out", nargs="?", default=None,
                    help="output PDB (default: input + .psssh.pdb)")
    sp.add_argument("-c", "--cutoff", type=float, default=10.0)
    sp.add_argument("-n", "--samples", type=int, default=2000,
                    help="total samples across all chains")
    sp.add_argument("-b", "--burn-in", "--burnin", dest="burnin",
                    type=int, default=1000)
    sp.add_argument("-l", "--surface-level", "--surface-radius",
                    dest="surface_level", type=float, default=1.05)
    sp.add_argument("-f", "--force-constant", "--k-force",
                    dest="force_constant", type=float, default=10.0)
    sp.add_argument("-d", "--nuts-depth", type=int, default=7)
    sp.add_argument("--chains", type=int, default=256)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--sampler", choices=["hmc", "nuts", "nuts-batched"],
                    default="hmc")

    ep = sub.add_parser("eval", help="evaluate SDF over an l^3 grid")
    ep.add_argument("pdb")
    ep.add_argument("-l", "--axis-length", "--grid-size",
                    dest="grid_size", type=int, default=64,
                    help="query grid axis length (reference default 256; "
                    "64 keeps CPU runs tractable)")
    ep.add_argument("-c", "--cutoff", type=float, action="append",
                    default=None)

    args = ap.parse_args(argv)
    if args.cmd == "sample":
        import os

        out = args.out or os.path.splitext(args.pdb)[0] + ".psssh.pdb"
        pos, radii, _ = read_pdb(args.pdb)
        sdf = SmoothDistanceField(
            pos, radii, cutoff=args.cutoff,
            surface_radius=args.surface_level, k_force=args.force_constant,
        )
        chains = 1 if args.sampler == "nuts" else args.chains
        draws = -(-args.samples // chains)
        pts = sample_surface(
            sdf, chains=chains, burnin=args.burnin, draws=draws,
            seed=args.seed, sampler=args.sampler,
            nuts_depth=args.nuts_depth,
        )[: args.samples]
        write_points_pdb(out, pts)
        print(f"wrote {len(pts)} surface samples to {out}")
    else:
        import os

        cutoffs = args.cutoff or [10.0]
        pos, radii, _ = read_pdb(args.pdb)
        name = os.path.splitext(os.path.basename(args.pdb))[0]
        vol = float(np.prod(pos.max(axis=0) - pos.min(axis=0)))
        print("name,atoms,vol,cutoff,queries,ns_total")  # cli.rs:183-195
        for c in cutoffs:
            sdf = SmoothDistanceField(pos, radii, cutoff=c)
            _, _, _, warm = eval_grid(sdf, args.grid_size)  # compile
            _, vals, _, dt = eval_grid(sdf, args.grid_size)
            q = args.grid_size**3
            print(f"{name},{len(pos)},{vol},{c},{q},{dt * 1e9:.0f}")


if __name__ == "__main__":
    main()
