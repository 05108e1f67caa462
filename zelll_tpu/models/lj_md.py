"""Lennard-Jones molecular dynamics: the flagship end-to-end workload.

The reference leaves simulation to the caller (zelll README.md:41-42); its
benchmarks model the simulate -> rebuild loop (README.md:36-39,
benches/cellgrid.rs rebuild path). Here the whole loop is one XLA graph on
device: every step re-bins and re-sorts the particles (full `rebuild`
semantics — `neigh_modify every 1` in the LAMMPS comparison,
more_benches/in.zelllbench.txt:11) and evaluates fused LJ forces with the
Pallas lag kernel. State stays in sorted order between steps, so each
step's sort sees nearly-sorted input and velocities ride along as sort
payload columns — positions never leave HBM, forces never materialize a
pair list.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.binning import bin_and_sort
from ..ops.lj import lj_force_factor
from ..ops.pallas_pairs import (
    lag_coverage_ok,
    lj_term,
    pair_lag_forces,
    pair_lag_reduce,
)

__all__ = [
    "MDState",
    "MDStateSplit",
    "md_step",
    "md_step_species",
    "md_run",
    "md_run_species",
    "md_run_vv",
    "md_run_vv_pbc",
    "md_step_split",
    "md_run_skin",
    "md_run_skin_pbc",
    "md_run_skin_tile",
    "md_run_skin_tile_pbc",
    "md_step_cubic",
    "md_step_cubic_tile",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MDState:
    positions: jax.Array  # (n, 3)
    velocities: jax.Array  # (n, 3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MDStateSplit:
    """MD state with split-precision coordinates: positions are carried as
    (hi, lo) f32 planes with hi + lo == the f64 position (`split_f64`).
    Removes the ~1e-2-class f32 coordinate-cancellation error in large
    boxes for BOTH forces and the integration update, at f32 speed (the
    reference is f64 end to end, lib.rs generic over F)."""

    pos_hi: jax.Array  # (n, 3) f32
    pos_lo: jax.Array  # (n, 3) f32
    velocities: jax.Array  # (n, 3) f32

    @classmethod
    def from_f64(cls, positions, velocities=None):
        from ..ops.pallas_pairs import split_f64

        hi, lo = split_f64(jnp.asarray(positions, jnp.float64))
        vel = (
            jnp.zeros_like(hi)
            if velocities is None
            else jnp.asarray(velocities, jnp.float32)
        )
        return cls(pos_hi=hi, pos_lo=lo, velocities=vel)

    def positions_f64(self):
        return self.pos_hi.astype(jnp.float64) + self.pos_lo.astype(
            jnp.float64
        )


@partial(jax.jit, static_argnames=("M", "L", "interpret", "K"))
def md_step(
    state: MDState,
    cutoff,
    dt,
    *,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
    K: int = 32,
):
    """One velocity-Verlet-style step with full grid rebuild.

    Returns (new_state, coverage_ok). Uses the one-force-evaluation form
    (semi-implicit Euler / leapfrog): v += dt f(x); x += dt v.

    State comes back in cell-key order with UNSPECIFIED order among
    equal keys (the hot sort is unstable since round 4 — ~15 ms faster
    at n=1e7); positions/velocities rows always correspond to each
    other. Map to input order by value if needed, or carry an explicit
    index payload column.

    3D runs the fused Pallas forces kernel; other dimensions use the XLA
    bucketed path (the reference is generic over N, lib.rs:132-135) with
    ``K`` as the static cell-bucket capacity, reflected in coverage_ok.
    """
    pos, vel = state.positions, state.velocities
    dim = pos.shape[1]
    stacked = jnp.concatenate([pos, vel], axis=1)
    csq = jnp.asarray(cutoff, pos.dtype) ** 2
    if dim == 3:
        bins, cols = bin_and_sort(
            stacked, cutoff, max_cells=1, need_perm=False
        )
        spos, svel = cols[:, :dim], cols[:, dim:]
        f = pair_lag_forces(
            spos, bins.sorted_keys, bins.info.strides, csq,
            M=M, L=L, gfn=lj_force_factor, interpret=interpret,
        )
        ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    else:
        from ..core.grid import CellGridData
        from ..core.pairs import pair_forces

        bins, cols = bin_and_sort(stacked[:, :dim], cutoff, need_perm=True)
        spos = cols
        svel = vel[bins.perm]
        grid = CellGridData(
            bins=bins, sorted_pos=spos, sorted_ids=bins.perm
        )
        # pair_forces returns input order; re-sort to the new sorted order
        f = pair_forces(
            grid, lj_force_factor, K=K, chunk=64, cutoff_sq=csq
        )[bins.perm]
        ok = bins.max_cell_count() <= K
    vel_new = svel + dt * f
    pos_new = spos + dt * vel_new
    return MDState(positions=pos_new, velocities=vel_new), ok


@partial(jax.jit, static_argnames=("M", "L", "interpret", "pot"))
def md_step_species(
    state: MDState,
    species: jax.Array,  # (n,) small integer species ids (any float/int)
    cutoff,
    dt,
    *,
    pot,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
):
    """One multi-species MD step: the species column rides the re-sort as
    one more payload column (exactly like velocities — never a gather),
    and the forces kernel evaluates the payload-parameterized
    ``pot.gfn(dsq, s_i, s_j)`` (`ops.potentials.lennard_jones_mixed`, or
    any `PairPotential`-shaped pair of payload term/gfn).

    ``pot`` is static (jit key): pass the SAME cached factory object
    each call. Returns (new_state, new_species, coverage_ok) — state AND
    species come back in the new sorted order (3D, lag path).
    """
    pos, vel = state.positions, state.velocities
    assert pos.shape[1] == 3, "md_step_species is 3D (lag kernel)"
    spec = jnp.asarray(species, pos.dtype).reshape(-1, 1)
    stacked = jnp.concatenate([pos, vel, spec], axis=1)
    csq = jnp.asarray(cutoff, pos.dtype) ** 2
    bins, cols = bin_and_sort(stacked, cutoff, max_cells=1, need_perm=False)
    spos, svel, sspec = cols[:, :3], cols[:, 3:6], cols[:, 6:]
    f = pair_lag_forces(
        spos, bins.sorted_keys, bins.info.strides, csq,
        sorted_payload=sspec, M=M, L=L, gfn=pot.gfn, interpret=interpret,
    )
    ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    vel_new = svel + dt * f
    pos_new = spos + dt * vel_new
    return (
        MDState(positions=pos_new, velocities=vel_new),
        sspec[:, 0],
        ok,
    )


@partial(jax.jit, static_argnames=("steps", "M", "L", "interpret", "pot"))
def md_run_species(
    state: MDState,
    species: jax.Array,
    cutoff,
    dt,
    *,
    pot,
    steps: int,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
):
    """`steps` multi-species MD steps in one jitted scan; final energy is
    the payload term ``pot.term(dsq, s_i, s_j)`` over the final
    configuration. Returns (state, species, all_covered, energy)."""

    def body(carry, _):
        st, sp, okacc = carry
        st, sp, ok = md_step_species(
            st, sp, cutoff, dt, pot=pot, M=M, L=L, interpret=interpret
        )
        return (st, sp, okacc & ok), None

    spec = jnp.asarray(species, state.positions.dtype).reshape(-1)
    (state, spec, ok), _ = jax.lax.scan(
        body, (state, spec, jnp.asarray(True)), None, length=steps
    )
    bins, cols = bin_and_sort(
        jnp.concatenate([state.positions, spec[:, None]], axis=1),
        cutoff, max_cells=1, need_perm=False,
    )
    energy = pair_lag_reduce(
        cols[:, :3], bins.sorted_keys, bins.info.strides,
        jnp.asarray(cutoff, state.positions.dtype) ** 2,
        sorted_payload=cols[:, 3:],
        M=M, L=L, term=pot.term, interpret=interpret,
    )
    return state, spec, ok, energy


@partial(jax.jit, static_argnames=("M", "L", "interpret"))
def md_step_split(
    state: MDStateSplit,
    cutoff,
    dt,
    *,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
):
    """One f64-grade MD step with full grid rebuild: split-precision forces
    (hi/lo coordinate planes through the lag kernel) and a compensated
    two-sum integration update, all in f32 arithmetic.

    Returns (new_state, coverage_ok). Binning keys come from the hi plane
    (cell assignment off-by-one requires a coordinate within one ulp of a
    cell boundary AND a partner at the cutoff boundary — the same
    measure-zero tie class as the documented count deviation).
    """
    hi, lo, vel = state.pos_hi, state.pos_lo, state.velocities
    stacked = jnp.concatenate([hi, lo, vel], axis=1)
    bins, cols = bin_and_sort(stacked, cutoff, max_cells=1, need_perm=False)
    shi, slo, svel = cols[:, :3], cols[:, 3:6], cols[:, 6:9]

    csq = jnp.asarray(cutoff, hi.dtype) ** 2
    f = pair_lag_forces(
        shi, bins.sorted_keys, bins.info.strides, csq, slo,
        M=M, L=L, gfn=lj_force_factor, interpret=interpret,
    )
    vel_new = svel + dt * f
    # two-sum position update: t = lo + dt*v is small, so hi_new + lo_new
    # == hi + (lo + dt*v) exactly to f32x2 (fast two-sum, |hi| >= |t|)
    t = slo + dt * vel_new
    hi_new = shi + t
    lo_new = (shi - hi_new) + t
    ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    return (
        MDStateSplit(pos_hi=hi_new, pos_lo=lo_new, velocities=vel_new),
        ok,
    )


@partial(jax.jit, static_argnames=("steps", "M", "L", "interpret"))
def md_run(
    state: MDState,
    cutoff,
    dt,
    *,
    steps: int,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
):
    """Run `steps` MD steps fully on device; returns (state, all_covered,
    final_energy)."""

    def body(carry, _):
        st, okacc = carry
        st, ok = md_step(st, cutoff, dt, M=M, L=L, interpret=interpret)
        return (st, okacc & ok), None

    (state, ok), _ = jax.lax.scan(body, (state, jnp.asarray(True)), None, length=steps)

    bins, spos = bin_and_sort(
        state.positions, cutoff, max_cells=1, need_perm=False
    )
    energy = pair_lag_reduce(
        spos, bins.sorted_keys, bins.info.strides,
        jnp.asarray(cutoff, spos.dtype) ** 2,
        M=M, L=L, term=lj_term, interpret=interpret,
    )
    return state, ok, energy


@partial(jax.jit, static_argnames=("steps", "M", "L", "interpret"))
def md_run_vv(
    state: MDState,
    cutoff,
    dt,
    *,
    steps: int,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
):
    """Velocity-Verlet trajectory fully on device: second-order symplectic
    at the SAME one-force-evaluation-per-step cost as `md_run` (the
    previous step's forces are carried in the scan; the half-kicked
    velocities ride the per-step re-sort as payload columns, so the new
    forces land in the matching sorted order). One extra force
    evaluation initializes the carry. Energy drift is O(dt^2) vs the
    semi-implicit Euler loop's O(dt). 3D only (the fused lag forces
    kernel is 3D; unlike `md_step`/`md_run` there is no XLA dispatch
    here — a 2D state would otherwise be silently binned on a velocity
    column).

    Returns (state, all_covered, final_energy).
    """
    if state.positions.shape[1] != 3:
        raise ValueError(
            "md_run_vv is 3D-only (fused lag kernel); use md_run for "
            f"dim={state.positions.shape[1]} (XLA bucketed dispatch)"
        )
    csq = jnp.asarray(cutoff, state.positions.dtype) ** 2

    def sort_and_forces(pos, vel):
        bins, cols = bin_and_sort(
            jnp.concatenate([pos, vel], axis=1), cutoff,
            max_cells=1, need_perm=False,
        )
        spos, svel = cols[:, :3], cols[:, 3:]
        f = pair_lag_forces(
            spos, bins.sorted_keys, bins.info.strides, csq,
            M=M, L=L, gfn=lj_force_factor, interpret=interpret,
        )
        ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
        return spos, svel, f, ok, bins

    spos, svel, f, ok0, _ = sort_and_forces(
        state.positions, state.velocities
    )

    def body(carry, _):
        pos, vel, f, okacc = carry
        vhalf = vel + (0.5 * dt) * f
        pos = pos + dt * vhalf
        pos, vhalf, f_new, ok, _ = sort_and_forces(pos, vhalf)
        vel_new = vhalf + (0.5 * dt) * f_new
        return (pos, vel_new, f_new, okacc & ok), None

    (pos, vel, f, ok), _ = jax.lax.scan(
        body, (spos, svel, f, ok0), None, length=steps
    )

    bins, spos2 = bin_and_sort(pos, cutoff, max_cells=1, need_perm=False)
    energy = pair_lag_reduce(
        spos2, bins.sorted_keys, bins.info.strides, csq,
        M=M, L=L, term=lj_term, interpret=interpret,
    )
    return MDState(positions=pos, velocities=vel), ok, energy


@partial(
    jax.jit,
    static_argnames=(
        "steps", "B", "G", "path", "M", "L", "K", "chunk", "MAXJ", "CB",
        "interpret",
    ),
)
def md_run_vv_pbc(
    state: MDState,
    origin,
    box,
    cutoff,
    dt,
    *,
    steps: int,
    B: int,
    G: int,
    path: str = "lag",
    M: int = 1024,
    L: int = 256,
    K: int = 32,
    chunk: int = 64,
    MAXJ=8,
    CB: int = 8,
    interpret: bool = False,
):
    """Velocity-Verlet trajectory under orthorhombic PBC, fully on
    device: the PBC state stays in input order (`ops.pbc.pbc_lj_forces`
    un-sorts each pass), so the forces carry through the scan directly —
    one force evaluation per step, O(dt^2) energy error like
    `md_run_vv`. Returns (state, all_covered).
    """
    from ..ops.pbc import pbc_lj_forces, wrap_positions

    kw = dict(B=B, G=G, path=path, M=M, L=L, K=K, chunk=chunk, MAXJ=MAXJ,
              CB=CB, interpret=interpret)
    f0, ok0 = pbc_lj_forces(
        state.positions, origin, box, cutoff, **kw
    )

    def body(carry, _):
        pos, vel, f, okacc = carry
        vhalf = vel + (0.5 * dt) * f
        pos = wrap_positions(pos + dt * vhalf, origin, box)
        f_new, ok = pbc_lj_forces(pos, origin, box, cutoff, **kw)
        vel_new = vhalf + (0.5 * dt) * f_new
        return (pos, vel_new, f_new, okacc & ok), None

    (pos, vel, _f, ok), _ = jax.lax.scan(
        body, (state.positions, state.velocities, f0, ok0), None,
        length=steps,
    )
    return MDState(positions=pos, velocities=vel), ok


@partial(jax.jit, static_argnames=("steps", "M", "L", "interpret"))
def md_run_skin(
    state: MDState,
    cutoff,
    dt,
    *,
    steps: int,
    skin: float = 0.5,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
):
    """Run `steps` MD steps with Verlet-skin grid reuse, fully on device.

    The grid is built with cell edge ``cutoff + skin`` and reused while no
    particle has drifted more than ``skin / 2`` from its position at the
    last (re)build; the force kernel keeps filtering by the true ``cutoff``.
    This is the steady-state analogue of the reference's `rebuild_mut`
    topology-reuse fast path (zelll src/cellgrid.rs:264-312: reuse the
    hashmap when no particle changed cells) in the form an MD loop actually
    wants: most steps run sort-free — just the lag forces kernel on the
    stale sorted order — and a full re-sort happens only when the drift
    bound is hit.

    Correctness: any pair within ``cutoff`` now was within
    ``cutoff + skin`` at build time (each endpoint moved < skin/2), so its
    endpoints were in adjacent build cells and the pair is inside the lag
    kernel's key window for the build keys — no pair is ever missed while
    the drift invariant holds, and the drift check runs *before* each
    force evaluation. Coverage of L is re-verified at every rebuild and
    accumulated into the returned flag (never silently drop pairs).

    Returns (state, all_covered, energy, n_rebuilds).
    """
    edge = jnp.asarray(cutoff, state.positions.dtype) + jnp.asarray(
        skin, state.positions.dtype
    )
    csq = jnp.asarray(cutoff, state.positions.dtype) ** 2
    half_skin_sq = (jnp.asarray(skin, state.positions.dtype) / 2) ** 2

    def do_build(pos, vel):
        stacked = jnp.concatenate([pos, vel], axis=1)
        bins, cols = bin_and_sort(stacked, edge, max_cells=1, need_perm=False)
        spos, svel = cols[:, :3], cols[:, 3:]
        ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
        return spos, svel, bins.sorted_keys, bins.info.strides, ok

    spos, svel, keys, strides, ok0 = do_build(
        state.positions, state.velocities
    )

    def body(carry, _):
        spos, svel, ref, keys, strides, okacc, nrb = carry
        drift_sq = jnp.max(jnp.sum((spos - ref) ** 2, axis=-1))
        need = drift_sq > half_skin_sq

        def rebuilt(_):
            p, v, k, s, ok = do_build(spos, svel)
            return p, v, p, k, s, ok, nrb + 1

        def reuse(_):
            return spos, svel, ref, keys, strides, jnp.asarray(True), nrb

        spos2, svel2, ref2, keys2, strides2, ok, nrb2 = jax.lax.cond(
            need, rebuilt, reuse, None
        )
        f = pair_lag_forces(
            spos2, keys2, strides2, csq,
            M=M, L=L, gfn=lj_force_factor, interpret=interpret,
        )
        vel_new = svel2 + dt * f
        pos_new = spos2 + dt * vel_new
        return (pos_new, vel_new, ref2, keys2, strides2, okacc & ok, nrb2), None

    init = (spos, svel, spos, keys, strides, ok0, jnp.asarray(0, jnp.int32))
    (spos, svel, _, _, _, ok, nrb), _ = jax.lax.scan(
        body, init, None, length=steps
    )

    bins, spos_f = bin_and_sort(spos, cutoff, max_cells=1, need_perm=False)
    energy = pair_lag_reduce(
        spos_f, bins.sorted_keys, bins.info.strides, csq,
        M=M, L=L, term=lj_term, interpret=interpret,
    )
    ok = ok & lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    return MDState(positions=spos, velocities=svel), ok, energy, nrb


@partial(jax.jit, static_argnames=("steps", "CB", "MAXJ", "interpret",
                                   "fast", "bandmask"))
def md_run_skin_tile(
    state: MDState,
    cutoff,
    dt,
    *,
    steps: int,
    skin: float = 0.5,
    CB: int = 8,
    MAXJ: int = 8,
    interpret: bool = False,
    fast: bool = False,
    bandmask: bool = False,
):
    """Steady-state MD for cubic/wide boxes: Verlet-skin grid reuse over
    the segment-tile forces kernel (the box-shape-robust sibling of
    `md_run_skin`; same drift invariant and rebuild-on-demand contract).

    Steps between rebuilds run sort-free — the packed forces kernel on the
    stale sorted planes with the stale keys/bands; a pair within ``cutoff``
    now was within ``cutoff + skin`` at build time, so it is inside the
    skin grid's cell-adjacency bands. State is carried as per-coordinate
    planes so steady steps never pay the (n, 3) stack/transpose.

    Returns (state, all_covered, energy, n_rebuilds).
    """
    from ..core.geometry import GridInfo, aabb_from_positions
    from ..ops.lj import lj_force_factor_fast
    from ..ops.tile_pairs import _packed_forces_core, tile_pair_reduce

    gfn = lj_force_factor_fast if fast else lj_force_factor
    dim = state.positions.shape[1]
    dtype = state.positions.dtype
    edge = jnp.asarray(cutoff, dtype) + jnp.asarray(skin, dtype)
    csq = jnp.asarray(cutoff, dtype) ** 2
    half_skin_sq = (jnp.asarray(skin, dtype) / 2) ** 2

    def do_build(pos_pl, vel_pl):
        pos = jnp.stack(pos_pl, axis=-1)
        stacked = jnp.concatenate([pos, jnp.stack(vel_pl, axis=-1)], axis=1)
        info = GridInfo.create(
            aabb_from_positions(pos), edge, auto_order=True
        )
        bins, planes = bin_and_sort(
            stacked, edge, max_cells=1, need_perm=False, stacked=False,
            info=info,
        )
        return (
            tuple(planes[:dim]),
            tuple(planes[dim:]),
            bins.sorted_keys,
            bins.info.strides,
        )

    pos0 = tuple(state.positions[:, a] for a in range(dim))
    vel0 = tuple(state.velocities[:, a] for a in range(dim))
    spos, svel, keys, strides = do_build(pos0, vel0)

    def body(carry, _):
        spos, svel, ref, keys, strides, okacc, nrb = carry
        drift_sq = sum((spos[a] - ref[a]) ** 2 for a in range(dim))
        need = jnp.max(drift_sq) > half_skin_sq

        def rebuilt(_):
            p, v, k, s = do_build(spos, svel)
            return p, v, p, k, s, nrb + 1

        def reuse(_):
            return spos, svel, ref, keys, strides, nrb

        spos2, svel2, ref2, keys2, strides2, nrb2 = jax.lax.cond(
            need, rebuilt, reuse, None
        )
        f_pl, ok = _packed_forces_core(
            list(spos2), keys2, strides2, csq,
            CB=CB, MAXJ=MAXJ, gfn=gfn, interpret=interpret,
            split=False, bandmask=bandmask, safe_term=False,
        )
        vel_new = tuple(svel2[a] + dt * f_pl[a] for a in range(dim))
        pos_new = tuple(spos2[a] + dt * vel_new[a] for a in range(dim))
        return (pos_new, vel_new, ref2, keys2, strides2, okacc & ok, nrb2), None

    init = (spos, svel, spos, keys, strides, jnp.asarray(True), jnp.asarray(0, jnp.int32))
    (spos, svel, _, _, _, ok, nrb), _ = jax.lax.scan(
        body, init, None, length=steps
    )

    pos_f = jnp.stack(spos, axis=-1)
    bins, spos_f = bin_and_sort(
        pos_f, cutoff, max_cells=1, need_perm=False, auto_order=True
    )
    # the loop's MAXJ spec is for the forces kernel's 9 full bands; the
    # one-shot final energy uses 5 half bands — reuse the widest capacity
    mj_e = MAXJ if isinstance(MAXJ, int) else max(MAXJ)
    energy, ok_e = tile_pair_reduce(
        spos_f, bins.sorted_keys, bins.info.strides, csq,
        MAXJ=mj_e, interpret=interpret,
    )
    return (
        MDState(positions=pos_f, velocities=jnp.stack(svel, axis=-1)),
        ok & ok_e,
        energy,
        nrb,
    )


@partial(jax.jit, static_argnames=("T", "M", "L", "interpret"))
def md_step_cubic(
    state: MDState,
    cutoff,
    dt,
    *,
    T: int = 3,
    M: int = 8192,
    L: int = 1024,
    interpret: bool = False,
):
    """MD step for cubic/wide boxes via the column decomposition
    (`ops.columns`): forces come back in input order, so state needs no
    sorted invariant between steps. Returns (new_state, coverage_ok)."""
    from ..ops.columns import column_lj_forces

    pos, vel = state.positions, state.velocities
    f, ok = column_lj_forces(
        pos, cutoff, T=T, M=M, L=L, interpret=interpret
    )
    vel_new = vel + dt * f
    pos_new = pos + dt * vel_new
    return MDState(positions=pos_new, velocities=vel_new), ok


@partial(jax.jit, static_argnames=("CB", "MAXJ", "interpret", "fast",
                                   "bandmask"))
def md_step_cubic_tile(
    state: MDState,
    cutoff,
    dt,
    *,
    CB: int = 8,
    MAXJ: int = 8,
    interpret: bool = False,
    fast: bool = False,
    bandmask: bool = False,
):
    """MD step for cubic/wide boxes via the segment-tile forces kernel
    (`ops.tile_pairs.tile_pair_forces`): like the thin-box `md_step`,
    velocities ride the sort as payload and state stays in sorted order
    between steps (no duplication, no owner-copy extraction — the tile
    kernel's full-stencil bands give per-particle forces directly).
    ``bandmask=False`` (the default since round 4) runs the maskless
    tile body (coverage_ok then also guards window disjointness — see
    `tile_pair_reduce`); measured ~18% faster at n = 1e7 cubic.
    Returns (new_state, coverage_ok)."""
    from ..ops.lj import lj_force_factor, lj_force_factor_fast
    from ..ops.tile_pairs import _packed_forces_core

    gfn = lj_force_factor_fast if fast else lj_force_factor
    pos, vel = state.positions, state.velocities
    dim = pos.shape[1]
    csq = jnp.asarray(cutoff, pos.dtype) ** 2
    stacked = jnp.concatenate([pos, vel], axis=1)
    # planes stay separate through the sort: the packed forces kernel
    # consumes them directly (no stack/transpose round trip, see
    # bin_and_sort(stacked=False)). Explicit info so the velocity payload
    # columns are never mistaken for spatial coordinates (dim < 3).
    from ..core.geometry import GridInfo, aabb_from_positions

    info = GridInfo.create(
        aabb_from_positions(pos), cutoff, auto_order=True
    )
    bins, planes = bin_and_sort(
        stacked, cutoff, max_cells=1, need_perm=False, stacked=False,
        info=info,
    )
    fplanes, ok = _packed_forces_core(
        list(planes[:dim]), bins.sorted_keys, bins.info.strides, csq,
        CB=CB, MAXJ=MAXJ, gfn=gfn, interpret=interpret,
        # safe_term=False: gfn here is always an LJ force factor, whose
        # value at masked dsq (0 or huge) is inf-or-0 and select-discarded
        split=False, bandmask=bandmask, safe_term=False,
    )
    vel_new = [planes[dim + a] + dt * fplanes[a] for a in range(dim)]
    pos_new = [planes[a] + dt * vel_new[a] for a in range(dim)]
    return (
        MDState(
            positions=jnp.stack(pos_new, axis=-1),
            velocities=jnp.stack(vel_new, axis=-1),
        ),
        ok,
    )


@partial(
    jax.jit,
    static_argnames=("steps", "B", "G", "M", "L", "interpret"),
)
def md_run_skin_pbc(
    state: MDState,
    origin,
    box,
    cutoff,
    dt,
    *,
    steps: int,
    B: int,
    G: int,
    skin: float = 0.5,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
):
    """Verlet-skin MD under orthorhombic PBC, fully on device.

    `md_run_skin`'s periodic sibling: the grid AND the ghost images are
    built with margin ``cutoff + skin`` and reused while no real particle
    drifted more than ``skin/2``; steps between rebuilds are sort-free.
    Ghost rows track their parents exactly (one G-sized gather + scatter
    per step — G ~ the boundary population, far below the n-gather the
    no-gather rule forbids): ``ghost = parent + (image - parent)_build``,
    so the skin coverage argument of `md_run_skin` applies verbatim to
    cross-boundary pairs (any pair within cutoff now was within
    cutoff+skin at build, when its image existed by the margin rule).

    Velocities of ghost rows are pinned to zero so integration leaves
    them to the tracking update. Rebuilds extract the real rows with one
    n-gather (amortized over the skin window), wrap, and re-extend.

    Returns (state (positions in build-sorted real order), all_covered,
    energy, n_rebuilds).
    """
    from ..core.binning import compute_keys
    from ..core.geometry import GridInfo, aabb_from_positions
    from ..ops.pbc import pbc_extend, pbc_pair_sum, wrap_positions

    pos0, vel0 = state.positions, state.velocities
    n = pos0.shape[0]
    dtp = pos0.dtype
    org = jnp.asarray(origin, dtp).reshape(3)
    bx = jnp.asarray(box, dtp).reshape(3)
    edge = jnp.asarray(cutoff, dtp) + jnp.asarray(skin, dtp)
    csq = jnp.asarray(cutoff, dtp) ** 2
    half_skin_sq = (jnp.asarray(skin, dtp) / 2) ** 2

    def do_build(p, v):
        p = wrap_positions(p, org, bx)
        ext, _, _w, valid, okg, gparent = pbc_extend(
            p, org, bx, edge, B=B, G=G, return_parents=True
        )
        nG = ext.shape[0]
        vin = jnp.concatenate([v, jnp.zeros((nG - n, 3), dtp)])
        isg = jnp.concatenate([
            jnp.zeros((n,), jnp.int32), jnp.ones((nG - n,), jnp.int32)
        ])
        par_in = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32), gparent]
        )
        info = GridInfo.create(
            aabb_from_positions(ext, valid), edge, auto_order=True
        )
        keys = compute_keys(ext, info, valid)
        iota = jnp.arange(nG, dtype=jnp.int32)
        out = jax.lax.sort(
            (keys, ext[:, 0], ext[:, 1], ext[:, 2],
             vin[:, 0], vin[:, 1], vin[:, 2], isg, par_in, iota),
            num_keys=1, is_stable=False,
        )
        skeys = out[0]
        spos = jnp.stack(out[1:4], axis=-1)
        svel = jnp.stack(out[4:7], axis=-1)
        sisg, spar, sinput = out[7], out[8], out[9]
        slot = jnp.arange(nG, dtype=jnp.int32)
        # inverse permutation and real/ghost slot lists — sort-based;
        # 2 keys: slots ascend within each class (sorted-scatter hints)
        _, slot_by_input = jax.lax.sort((sinput, slot), num_keys=1)
        _, slots_by_flag = jax.lax.sort(
            (sisg, slot), num_keys=2, is_stable=False
        )
        real_slots = slots_by_flag[:n]
        ghost_slots = slots_by_flag[n:]
        gpar_slot = slot_by_input[spar[ghost_slots]]  # (G,) gathers
        gshift = spos[ghost_slots] - spos[gpar_slot]
        real_mask = (sisg == 0)[:, None]
        ok = okg & lag_coverage_ok(skeys, info.strides, L)
        return (spos, svel, spos, skeys, info.strides.astype(jnp.int32),
                real_mask, real_slots, ghost_slots, gpar_slot, gshift, ok)

    built = do_build(pos0, vel0)

    def body(carry, _):
        (spos, svel, ref, keys, strides, real_mask, real_slots,
         ghost_slots, gpar_slot, gshift, okacc, nrb) = carry
        d = jnp.where(real_mask, spos - ref, 0.0)
        need = jnp.max(jnp.sum(d * d, axis=-1)) > half_skin_sq

        def rebuilt(_):
            R = spos[real_slots]
            V = svel[real_slots]
            return do_build(R, V) + (nrb + 1,)

        def reuse(_):
            return (spos, svel, ref, keys, strides, real_mask, real_slots,
                    ghost_slots, gpar_slot, gshift,
                    jnp.asarray(True), nrb)

        (spos2, svel2, ref2, keys2, strides2, rm2, rs2, gs2, gp2, gsh2,
         ok, nrb2) = jax.lax.cond(need, rebuilt, reuse, None)

        f = pair_lag_forces(
            spos2, keys2, strides2, csq,
            M=M, L=L, gfn=lj_force_factor, interpret=interpret,
        )
        svel3 = svel2 + dt * jnp.where(rm2, f, 0.0)
        spos3 = spos2 + dt * svel3  # ghost velocities are pinned to zero
        spos3 = spos3.at[gs2].set(spos3[gp2] + gsh2,
                                  indices_are_sorted=True,
                                  unique_indices=True)
        return (spos3, svel3, ref2, keys2, strides2, rm2, rs2, gs2, gp2,
                gsh2, okacc & ok, nrb2), None

    init = built + (jnp.asarray(0, jnp.int32),)
    (spos, svel, *_rest, ok, nrb), _ = jax.lax.scan(
        body, init, None, length=steps
    )
    real_slots = _rest[4]
    R = wrap_positions(spos[real_slots], org, bx)
    V = svel[real_slots]
    energy, oke = pbc_pair_sum(
        R, org, bx, cutoff, term=lj_term, B=B, G=G, M=M, L=L,
        interpret=interpret,
    )
    return MDState(positions=R, velocities=V), ok & oke, energy, nrb


@partial(
    jax.jit,
    static_argnames=("steps", "B", "G", "CB", "MAXJ", "MAXJ_E",
                     "interpret", "fast", "bandmask"),
)
def md_run_skin_tile_pbc(
    state: MDState,
    origin,
    box,
    cutoff,
    dt,
    *,
    steps: int,
    B: int,
    G: int,
    skin: float = 0.5,
    CB: int = 8,
    MAXJ: int | tuple = 8,
    MAXJ_E: int | None = None,
    interpret: bool = False,
    fast: bool = False,
    bandmask: bool = False,
):
    """Verlet-skin MD under orthorhombic PBC on the segment-tile kernel —
    `md_run_skin_pbc`'s cubic/wide-box sibling (the lag kernel's key
    window degenerates on cubic grids; the tile kernel's per-chunk
    searchsorted windows do not).

    Identical contract: grid AND ghost images are built with margin
    ``cutoff + skin`` and reused while no real particle drifted more than
    ``skin/2`` (any pair within cutoff now was within cutoff+skin at
    build, when its image existed by the margin rule). Steps between
    rebuilds are sort-free; state is carried as per-coordinate planes so
    steady steps feed the packed forces kernel directly (no (n, 3)
    stack/transpose). Ghost rows track parents exactly — one G-sized
    gather + scatter per plane per step — with velocities pinned to zero.

    The tile forces kernel accumulates i-side only, so ghost forces are
    simply never applied (no reaction bookkeeping); per-step tile window
    coverage (``MAXJ``, 9 full bands — tuple accepted) folds into the
    returned flag. ``MAXJ_E`` sizes the final one-shot energy's 5 half
    bands (defaults to max(MAXJ)).

    Returns (state (real rows, build-sorted order, wrapped), all_covered,
    energy, n_rebuilds).
    """
    from ..core.binning import compute_keys
    from ..core.geometry import GridInfo, aabb_from_positions
    from ..ops.lj import lj_force_factor_fast
    from ..ops.pbc import pbc_extend, pbc_pair_sum, wrap_positions
    from ..ops.tile_pairs import _packed_forces_core

    gfn = lj_force_factor_fast if fast else lj_force_factor
    pos0, vel0 = state.positions, state.velocities
    n, dim = pos0.shape
    assert dim == 3, "md_run_skin_tile_pbc is 3D (2D PBC routes to XLA)"
    dtp = pos0.dtype
    org = jnp.asarray(origin, dtp).reshape(3)
    bx = jnp.asarray(box, dtp).reshape(3)
    edge = jnp.asarray(cutoff, dtp) + jnp.asarray(skin, dtp)
    csq = jnp.asarray(cutoff, dtp) ** 2
    half_skin_sq = (jnp.asarray(skin, dtp) / 2) ** 2

    def do_build(p_pl, v_pl):
        p = wrap_positions(jnp.stack(p_pl, axis=-1), org, bx)
        ext, _, _w, valid, okg, gparent = pbc_extend(
            p, org, bx, edge, B=B, G=G, return_parents=True
        )
        nG = ext.shape[0]
        vin = [
            jnp.concatenate([v_pl[a], jnp.zeros((nG - n,), dtp)])
            for a in range(3)
        ]
        isg = jnp.concatenate([
            jnp.zeros((n,), jnp.int32), jnp.ones((nG - n,), jnp.int32)
        ])
        par_in = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32), gparent]
        )
        info = GridInfo.create(
            aabb_from_positions(ext, valid), edge, auto_order=True
        )
        keys = compute_keys(ext, info, valid)
        iota = jnp.arange(nG, dtype=jnp.int32)
        out = jax.lax.sort(
            (keys, ext[:, 0], ext[:, 1], ext[:, 2],
             vin[0], vin[1], vin[2], isg, par_in, iota),
            num_keys=1, is_stable=False,
        )
        skeys = out[0]
        spos = tuple(out[1:4])
        svel = tuple(out[4:7])
        sisg, spar, sinput = out[7], out[8], out[9]
        slot = jnp.arange(nG, dtype=jnp.int32)
        _, slot_by_input = jax.lax.sort((sinput, slot), num_keys=1)
        # 2 keys: slots ascend within each class, so the per-step ghost
        # scatter runs with sorted+unique index hints (measurably
        # cheaper XLA scatter lowering than random-order indices)
        _, slots_by_flag = jax.lax.sort(
            (sisg, slot), num_keys=2, is_stable=False
        )
        real_slots = slots_by_flag[:n]
        ghost_slots = slots_by_flag[n:]
        gpar_slot = slot_by_input[spar[ghost_slots]]  # (G,) gathers
        gshift = tuple(
            spos[a][ghost_slots] - spos[a][gpar_slot] for a in range(3)
        )
        real_mask = sisg == 0
        return (spos, svel, spos, skeys, info.strides.astype(jnp.int32),
                real_mask, real_slots, ghost_slots, gpar_slot, gshift, okg)

    pos_pl = tuple(pos0[:, a] for a in range(3))
    vel_pl = tuple(vel0[:, a] for a in range(3))
    built = do_build(pos_pl, vel_pl)

    def body(carry, _):
        (spos, svel, ref, keys, strides, real_mask, real_slots,
         ghost_slots, gpar_slot, gshift, okacc, nrb) = carry
        drift_sq = sum(
            jnp.where(real_mask, spos[a] - ref[a], 0.0) ** 2
            for a in range(3)
        )
        need = jnp.max(drift_sq) > half_skin_sq

        def rebuilt(_):
            R = tuple(spos[a][real_slots] for a in range(3))
            V = tuple(svel[a][real_slots] for a in range(3))
            return do_build(R, V) + (nrb + 1,)

        def reuse(_):
            return (spos, svel, ref, keys, strides, real_mask, real_slots,
                    ghost_slots, gpar_slot, gshift, jnp.asarray(True), nrb)

        (spos2, svel2, ref2, keys2, strides2, rm2, rs2, gs2, gp2, gsh2,
         ok, nrb2) = jax.lax.cond(need, rebuilt, reuse, None)

        f_pl, okc = _packed_forces_core(
            list(spos2), keys2, strides2, csq,
            CB=CB, MAXJ=MAXJ, gfn=gfn, interpret=interpret, split=False,
            bandmask=bandmask, safe_term=False,
        )
        svel3 = tuple(
            svel2[a] + dt * jnp.where(rm2, f_pl[a], 0.0) for a in range(3)
        )
        # ghost velocities are pinned to zero; ghosts move only via the
        # parent-tracking scatter below
        spos3 = tuple(spos2[a] + dt * svel3[a] for a in range(3))
        spos3 = tuple(
            spos3[a].at[gs2].set(
                spos3[a][gp2] + gsh2[a],
                indices_are_sorted=True, unique_indices=True,
            )
            for a in range(3)
        )
        return (spos3, svel3, ref2, keys2, strides2, rm2, rs2, gs2, gp2,
                gsh2, okacc & ok & okc, nrb2), None

    init = built + (jnp.asarray(0, jnp.int32),)
    (spos, svel, *_rest, ok, nrb), _ = jax.lax.scan(
        body, init, None, length=steps
    )
    real_slots = _rest[4]
    R = wrap_positions(
        jnp.stack([spos[a][real_slots] for a in range(3)], axis=-1),
        org, bx,
    )
    V = jnp.stack([svel[a][real_slots] for a in range(3)], axis=-1)
    mj_e = MAXJ_E if MAXJ_E is not None else (
        MAXJ if isinstance(MAXJ, int) else max(MAXJ)
    )
    energy, oke = pbc_pair_sum(
        R, org, bx, cutoff, term=lj_term, B=B, G=G, path="tile",
        CB=CB, MAXJ=mj_e, interpret=interpret, bandmask=bandmask,
    )
    return MDState(positions=R, velocities=V), ok & oke, energy, nrb
