"""Virial, stress tensor, and pressure — the thermodynamic observables.

The scalar pair virial

    W = sum_pairs f_ij . r_ij = sum_pairs gfn(dsq) * dsq

is *a scalar pair term*, so it rides every existing fused reduction path
unchanged (lag kernel, segment-tile kernel, XLA bucketed path, PBC ghost
masking, multi-chip slab sharding): no kernel changes, same coverage
flags. The full configurational stress tensor

    sigma_ab = sum_pairs gfn(dsq) * dx_a * dx_b        (trace = W)

needs per-axis separations and runs on the XLA bucketed path
(`core.pairs.pair_stress`); under PBC each cross pair is counted once via
endpoint half-weights (real rows weight 1, ghost images 0 — pair (i, jg)
and its mirror (j, ig) each contribute half).

Pressure (instantaneous, per the standard virial theorem for pair
potentials, unit mass, dimensionless units):

    P = (2 * KE + W) / (dim * V)

The reference library exposes raw pair iteration from which users fold
such sums (zelll `src/cellgrid.rs:338-340`); here they are first-class
fused observables, feeding the NPT barostat in `models.thermostats`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.grid import CellGridData
from .lj import lj_force_factor

__all__ = [
    "lj_virial_term",
    "virial_term_from_gfn",
    "fused_virial",
    "virial_rebuild",
    "pbc_virial",
    "pair_stress_open",
    "pbc_stress",
    "fused_stress_open",
    "pbc_stress_fused",
    "kinetic_energy",
    "kinetic_stress",
    "pressure",
    "pressure_tensor",
]


def lj_virial_term(dsq):
    """w(dsq) = lj_force_factor(dsq) * dsq = 24 t (2t - 1), t = dsq^-3.

    The per-pair virial f_ij . r_ij of the dimensionless LJ potential —
    algebraically simplified so the kernel does one fewer divide than
    composing `lj_force_factor` with a multiply.
    """
    t = (1.0 / dsq) ** 3
    return 24.0 * t * (2.0 * t - 1.0)


_VIRIAL_TERMS: dict = {}


def virial_term_from_gfn(gfn: Callable) -> Callable:
    """w(dsq) = gfn(dsq) * dsq for an arbitrary force factor.

    Cached per gfn identity: the fused reductions jit on term identity, so
    a fresh closure per call would retrace every time.
    """
    fn = _VIRIAL_TERMS.get(gfn)
    if fn is None:
        def fn(dsq):
            return gfn(dsq) * dsq

        _VIRIAL_TERMS[gfn] = fn
    return fn


def fused_virial(grid: CellGridData, *, gfn: Callable | None = None, **kw):
    """Scalar virial W over unique cutoff pairs of a built grid (open
    boundaries), on the fused lag kernel. Returns (W, coverage_ok)."""
    from .fused import fused_pair_sum

    term = lj_virial_term if gfn is None else virial_term_from_gfn(gfn)
    return fused_pair_sum(grid, term, **kw)


def virial_rebuild(positions: jax.Array, cutoff, positions_lo=None, **kw):
    """Full-pipeline scalar virial (keys -> sort -> fused reduction), the
    rebuild-per-step form used by MD observers. Returns (W, coverage_ok)."""
    from .fused import fused_lj_rebuild_energy

    gfn = kw.pop("gfn", None)
    term = lj_virial_term if gfn is None else virial_term_from_gfn(gfn)
    return fused_lj_rebuild_energy(
        positions, cutoff, positions_lo, term=term, **kw
    )


def pbc_virial(positions: jax.Array, origin, box, cutoff, *,
               gfn: Callable | None = None, **kw):
    """Scalar virial W over unique minimum-image cutoff pairs under
    orthorhombic PBC (any path: lag | tile | xla). Returns (W, ok)."""
    from .pbc import pbc_pair_sum

    term = lj_virial_term if gfn is None else virial_term_from_gfn(gfn)
    return pbc_pair_sum(positions, origin, box, cutoff, term=term, **kw)


def pair_stress_open(
    positions: jax.Array,
    cutoff,
    *,
    gfn: Callable | None = None,
    K: int | None = None,
    chunk: int = 256,
):
    """Configurational stress tensor under open boundaries.

    Builds the grid and folds sigma_ab = sum_pairs gfn(dsq) dx_a dx_b on
    the XLA bucketed path. ``K`` defaults to the data's max cell count
    (host-syncing; pass explicitly inside jit). Returns ((dim, dim), ok).
    """
    from ..core.grid import build
    from ..core.pairs import pair_stress

    grid = build(positions, cutoff)
    if K is None:
        K = int(grid.bins.max_cell_count())
    sigma = pair_stress(
        grid, gfn or lj_force_factor, K=K, chunk=chunk,
        cutoff_sq=jnp.asarray(cutoff, positions.dtype) ** 2,
    )
    ok = grid.bins.max_cell_count() <= K
    return sigma, ok


def pbc_stress(
    positions: jax.Array,
    origin,
    box,
    cutoff,
    *,
    gfn: Callable | None = None,
    B: int | None = None,
    G: int | None = None,
    K: int | None = None,
    chunk: int = 256,
):
    """Configurational stress tensor under orthorhombic PBC.

    Ghost-image extension + endpoint half-weights (see
    `core.pairs.pair_stress`): real rows weigh 1, ghost rows 0, so each
    minimum-image cross pair is counted exactly once and ghost-ghost
    pairs vanish. Returns ((dim, dim), ok).
    """
    from ..core.grid import build
    from ..core.pairs import pair_stress
    from .pbc import pbc_extend, suggest_pbc_capacity

    n = positions.shape[0]
    if B is None or G is None:
        Bd, Gd = suggest_pbc_capacity(n, box, cutoff)
        B = Bd if B is None else B
        G = Gd if G is None else G
    ext, _ext_lo, _w, valid, ok = pbc_extend(
        positions, origin, box, cutoff, B=B, G=G
    )
    grid = build(ext, cutoff, valid=valid)
    if K is None:
        K = int(grid.bins.max_cell_count())
    ok &= grid.bins.max_cell_count() <= K
    # sorted_ids < n <=> the slot holds a real (non-ghost, non-pad) row
    weights = (grid.sorted_ids < n).astype(positions.dtype)
    sigma = pair_stress(
        grid, gfn or lj_force_factor, K=K, chunk=chunk,
        cutoff_sq=jnp.asarray(cutoff, positions.dtype) ** 2,
        slot_weights=weights,
    )
    return sigma, ok


def _rf_contract(pos, f, center, pos_lo=None):
    """sum_i (r_i - center) (x) f_i, axis-unrolled (never a matmul: Mosaic
    f32 dots carry one bf16 pass — silently wrong for value-bearing
    operands, CLAUDE.md) and symmetrized. ``center`` only improves
    conditioning: sum f_i = 0 exactly for pairwise both-endpoint kernels,
    so the result is center-invariant."""
    dim = pos.shape[1]
    r = [pos[:, a] - center[a] for a in range(dim)]
    if pos_lo is not None:
        r = [ra + pos_lo[:, a] for a, ra in enumerate(r)]
    out = jnp.zeros((dim, dim), pos.dtype)
    for a in range(dim):
        for b in range(dim):
            out = out.at[a, b].set(jnp.sum(r[a] * f[:, b]))
    return 0.5 * (out + out.T)


def _forces_pass(positions, cutoff, center, *, gfn, path, M, L, MAXJ, CB,
                 interpret, valid=None, positions_lo=None):
    """One fused forces pass -> (sum (r-center) (x) f over ALL rows, ok).

    For both kernels, summing r (x) f over every sorted row equals
    sum_pairs gfn(dsq) * dx (x) dx over exactly the pairs the kernel
    counts: the lag path applies Newton's +/-f to both endpoints of each
    unique pair; the tile path accumulates both ordered directions
    (i-side for every row, ghosts included). Rows masked by ``valid``
    never pair (sentinel keys) and carry zero force.
    """
    from ..core.binning import bin_and_sort

    dim = positions.shape[1]
    if positions_lo is not None:
        stacked = jnp.concatenate([positions, positions_lo], axis=1)
        from ..core.geometry import GridInfo, aabb_from_positions

        info = GridInfo.create(
            aabb_from_positions(positions, valid=valid), cutoff,
            auto_order=True,
        )
        bins, sorted_cols = bin_and_sort(
            stacked, cutoff, max_cells=1, need_perm=False, valid=valid,
            info=info,
        )
        sp, slo = sorted_cols[:, :dim], sorted_cols[:, dim:]
    else:
        bins, sp = bin_and_sort(
            positions, cutoff, max_cells=1, need_perm=False, valid=valid,
            auto_order=True,
        )
        slo = None
    csq = jnp.asarray(cutoff, positions.dtype) ** 2
    if path == "tile":
        from .tile_pairs import tile_pair_forces

        f, ok = tile_pair_forces(
            sp, bins.sorted_keys, bins.info.strides, csq, slo,
            CB=CB, MAXJ=MAXJ, gfn=gfn, interpret=interpret,
        )
    elif path == "lag":
        from .pallas_pairs import lag_coverage_ok, pair_lag_forces

        f = pair_lag_forces(
            sp, bins.sorted_keys, bins.info.strides, csq, slo,
            M=M, L=L, gfn=gfn, interpret=interpret,
        )
        ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    else:
        raise ValueError(f"unknown path {path!r} (lag | tile)")
    return _rf_contract(sp, f, center, slo), ok


def fused_stress_open(
    positions: jax.Array,
    cutoff,
    *,
    gfn: Callable | None = None,
    path: str = "lag",
    M: int = 1024,
    L: int = 256,
    MAXJ=8,
    CB: int = 8,
    interpret: bool = False,
    positions_lo: jax.Array | None = None,
):
    """Configurational stress tensor at fused-kernel speed, open
    boundaries: one forces pass + one r (x) f contraction (the pair list
    never materializes; no kernel changes). ``path="lag"`` for thin
    boxes, ``"tile"`` for cubic/wide. Returns ((dim, dim), ok).

    Prefer this over `pair_stress_open` above ~1e5 particles; the XLA
    bucketed path remains the N-dimensional/arbitrary-weights fallback
    (dim != 3 dispatches there automatically — the fused kernels are
    3D-only, the reference is generic over N, lib.rs:132-135).
    """
    dim = positions.shape[1]
    if dim != 3:
        return pair_stress_open(positions, cutoff, gfn=gfn)
    center = [
        0.5 * (jnp.min(positions[:, a]) + jnp.max(positions[:, a]))
        for a in range(dim)
    ]
    return _forces_pass(
        positions, cutoff, center, gfn=gfn, path=path, M=M, L=L,
        MAXJ=MAXJ, CB=CB, interpret=interpret, positions_lo=positions_lo,
    )


def pbc_stress_fused(
    positions: jax.Array,
    origin,
    box,
    cutoff,
    *,
    gfn: Callable | None = None,
    path: str = "lag",
    B: int | None = None,
    G: int | None = None,
    M: int = 1024,
    L: int = 256,
    MAXJ=8,
    CB: int = 8,
    interpret: bool = False,
):
    """Configurational stress tensor at fused-kernel speed under
    orthorhombic PBC, by a three-pass ghost decomposition:

        A = extended pass (reals + ghost images):  RR + 2*RG + GG
        B = ghosts-only pass:                      GG
        C = reals-only pass (direct pairs):        RR
        sigma = (A - B + C) / 2              =     RR + RG

    Each minimum-image cross pair appears TWICE in the extension — as
    (i, j_ghost) and its mirror (j, i_ghost), with identical dx (x) dx —
    so A counts it twice, B removes ghost-ghost artifacts, and C restores
    the direct pairs to weight 2. ~2.2x one forces pass at cubic-box
    ghost fractions; the XLA `pbc_stress` stays as the N-dim fallback.
    Returns ((dim, dim), ok).
    """
    from .pbc import pbc_extend, suggest_pbc_capacity

    n, dim = positions.shape
    if dim != 3:
        return pbc_stress(positions, origin, box, cutoff, gfn=gfn, B=B, G=G)
    if B is None or G is None:
        Bd, Gd = suggest_pbc_capacity(n, box, cutoff)
        B = Bd if B is None else B
        G = Gd if G is None else G
    ext, _ext_lo, _w, valid, ok = pbc_extend(
        positions, origin, box, cutoff, B=B, G=G
    )
    center = [origin[a] + 0.5 * box[a] for a in range(dim)]
    kw = dict(gfn=gfn, path=path, M=M, L=L, MAXJ=MAXJ, CB=CB,
              interpret=interpret)
    s_a, ok_a = _forces_pass(ext, cutoff, center, valid=valid, **kw)
    s_b, ok_b = _forces_pass(
        ext[n:], cutoff, center, valid=valid[n:], **kw
    )
    s_c, ok_c = _forces_pass(positions, cutoff, center, **kw)
    return 0.5 * (s_a - s_b + s_c), ok & ok_a & ok_b & ok_c


def kinetic_energy(velocities: jax.Array):
    """Total kinetic energy, unit mass: KE = 1/2 sum |v|^2."""
    dim = velocities.shape[1]
    # spatial axis unrolled: minor-dim-3 reductions lower pathologically
    total = jnp.sum(velocities[:, 0] * velocities[:, 0])
    for a in range(1, dim):
        total = total + jnp.sum(velocities[:, a] * velocities[:, a])
    return 0.5 * total


def kinetic_stress(velocities: jax.Array):
    """Kinetic stress tensor, unit mass: sum_i v_a v_b (trace = 2 KE)."""
    dim = velocities.shape[1]
    out = jnp.zeros((dim, dim), velocities.dtype)
    for a in range(dim):
        for b in range(a, dim):
            s = jnp.sum(velocities[:, a] * velocities[:, b])
            out = out.at[a, b].set(s)
            if b != a:
                out = out.at[b, a].set(s)
    return out


def pressure(virial_w, kinetic, volume, dim: int = 3):
    """Instantaneous scalar pressure P = (2 KE + W) / (dim V)."""
    return (2.0 * kinetic + virial_w) / (dim * volume)


def pressure_tensor(sigma_conf, sigma_kin, volume):
    """Instantaneous pressure tensor P_ab = (sigma_kin + sigma_conf) / V;
    its trace/dim is the scalar `pressure`."""
    return (sigma_kin + sigma_conf) / volume
