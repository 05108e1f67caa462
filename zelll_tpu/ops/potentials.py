"""Standard pair potentials as fused-kernel term/force factories.

The reference leaves the pair interaction to user closures over its pair
iterator (`/root/reference/src/cellgrid.rs:338-340`; `benches/lj.rs:42-47`
is the one worked example). Here the interaction is a first-class,
parameterized object that plugs into EVERY kernel path — the same
``term(dsq)`` / ``gfn(dsq)`` conventions the whole library uses:

* ``term(dsq)`` — pair energy from the SQUARED distance; feeds
  `pair_lag_reduce` / `tile_pair_reduce` / `pbc_pair_sum` /
  `sharded_lj_energy` (any ``term=`` keyword).
* ``gfn(dsq)`` — scalar force factor f with ``F_i = f * (p_i - p_j)``,
  i.e. ``f = -2 dV/d(dsq)``; feeds every forces/stress kernel
  (``gfn=``) and `ops.virial.virial_term_from_gfn`.

Every factory is cached on its (kind, params) key: the fused kernels jit
on term IDENTITY, so handing out the same function object for the same
parameters is what keeps re-evaluation retrace-free (the same contract
as `ops.pbc._pbc_term`). Parameters are baked as Python constants —
XLA folds them, nothing is traced.

All forms are TPU-friendly: polynomial / rsqrt / exp on the VPU, no
branches (the WCA cut is a `where` select). Potentials needing r itself
(Morse, Yukawa, Buckingham, harmonic) take one `sqrt` per candidate —
still one fused pass, no pair list.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax.numpy as jnp

__all__ = [
    "PairPotential",
    "buckingham",
    "gaussian",
    "harmonic",
    "lennard_jones",
    "lennard_jones_mixed",
    "morse",
    "shifted",
    "soft_sphere",
    "wca",
    "yukawa",
]


class PairPotential(NamedTuple):
    """A pair interaction in the library's two fused-kernel conventions.

    ``term(dsq)`` sums to the potential energy; ``gfn(dsq)`` is the
    force factor (``F_i = gfn * (p_i - p_j)``). Both are plain functions
    of the squared distance, usable anywhere the library takes ``term=``
    or ``gfn=`` (open/PBC, lag/tile/XLA, single- or multi-chip). The
    scalar virial term is `ops.virial.virial_term_from_gfn(gfn)`.
    """

    term: Callable
    gfn: Callable


@functools.lru_cache(maxsize=None)
def lennard_jones(epsilon: float = 1.0, sigma: float = 1.0) -> PairPotential:
    """4 eps ((sigma/r)^12 - (sigma/r)^6) — the generalized form of the
    benchmark's eps = sigma = 1 `ops.lj` (`benches/lj.rs:42-47`)."""
    e4, s2 = 4.0 * float(epsilon), float(sigma) ** 2

    def term(dsq):
        t = (s2 / dsq) ** 3
        return e4 * t * (t - 1.0)

    def gfn(dsq):
        t = (s2 / dsq) ** 3
        return 6.0 * e4 * t * (2.0 * t - 1.0) / dsq

    return PairPotential(term, gfn)


@functools.lru_cache(maxsize=None)
def wca(epsilon: float = 1.0, sigma: float = 1.0) -> PairPotential:
    """Weeks-Chandler-Andersen: LJ truncated at its minimum
    r_c = 2^(1/6) sigma and shifted up by eps — purely repulsive and
    continuous at the cut. The cut lives INSIDE the potential (a select),
    so any grid cutoff >= r_c enumerates a superset and the extra
    candidates contribute exactly zero."""
    e4, s2 = 4.0 * float(epsilon), float(sigma) ** 2
    rc2 = 2.0 ** (1.0 / 3.0) * s2
    eps = float(epsilon)

    def term(dsq):
        t = (s2 / dsq) ** 3
        v = e4 * t * (t - 1.0) + eps
        return jnp.where(dsq < rc2, v, jnp.zeros_like(v))

    def gfn(dsq):
        t = (s2 / dsq) ** 3
        g = 6.0 * e4 * t * (2.0 * t - 1.0) / dsq
        return jnp.where(dsq < rc2, g, jnp.zeros_like(g))

    return PairPotential(term, gfn)


@functools.lru_cache(maxsize=None)
def soft_sphere(epsilon: float = 1.0, sigma: float = 1.0,
                n: int = 12) -> PairPotential:
    """eps (sigma/r)^n, even n (pure repulsion; n=12 is the LJ core)."""
    assert n % 2 == 0 and n > 0, "soft_sphere needs a positive even n"
    eps, s2, h = float(epsilon), float(sigma) ** 2, n // 2

    def term(dsq):
        return eps * (s2 / dsq) ** h

    def gfn(dsq):
        return float(n) * eps * (s2 / dsq) ** h / dsq

    return PairPotential(term, gfn)


@functools.lru_cache(maxsize=None)
def gaussian(epsilon: float = 1.0, sigma: float = 1.0) -> PairPotential:
    """eps exp(-dsq / (2 sigma^2)) (the Gaussian-core model)."""
    eps, inv2s2 = float(epsilon), 1.0 / (2.0 * float(sigma) ** 2)

    def term(dsq):
        return eps * jnp.exp(-dsq * inv2s2)

    def gfn(dsq):
        return 2.0 * inv2s2 * eps * jnp.exp(-dsq * inv2s2)

    return PairPotential(term, gfn)


@functools.lru_cache(maxsize=None)
def morse(D: float = 1.0, a: float = 1.0, r0: float = 1.0) -> PairPotential:
    """D (1 - exp(-a (r - r0)))^2 - D (zero at the well minimum r0)."""
    D, a, r0 = float(D), float(a), float(r0)

    def term(dsq):
        r = jnp.sqrt(dsq)
        x = jnp.exp(-a * (r - r0))
        return D * (1.0 - x) ** 2 - D

    def gfn(dsq):
        # f = -(1/r) dV/dr; dV/dr = 2 D a x (1 - x), x = exp(-a(r - r0))
        r = jnp.sqrt(dsq)
        x = jnp.exp(-a * (r - r0))
        return -2.0 * D * a * x * (1.0 - x) / r

    return PairPotential(term, gfn)


@functools.lru_cache(maxsize=None)
def yukawa(A: float = 1.0, kappa: float = 1.0) -> PairPotential:
    """A exp(-kappa r) / r (screened Coulomb / Debye-Hueckel)."""
    A, k = float(A), float(kappa)

    def term(dsq):
        r = jnp.sqrt(dsq)
        return A * jnp.exp(-k * r) / r

    def gfn(dsq):
        # f = -(1/r) dV/dr = A e^{-kr} (k r + 1) / r^3
        r = jnp.sqrt(dsq)
        return A * jnp.exp(-k * r) * (k * r + 1.0) / (dsq * r)

    return PairPotential(term, gfn)


@functools.lru_cache(maxsize=None)
def buckingham(A: float = 1.0, rho: float = 1.0,
               C: float = 1.0) -> PairPotential:
    """A exp(-r/rho) - C / r^6 (exp-6)."""
    A, rho, C = float(A), float(rho), float(C)

    def term(dsq):
        r = jnp.sqrt(dsq)
        return A * jnp.exp(-r / rho) - C / dsq**3

    def gfn(dsq):
        # dV/dr = -(A/rho) e^{-r/rho} + 6 C / r^7; f = -(1/r) dV/dr
        r = jnp.sqrt(dsq)
        return (A / rho) * jnp.exp(-r / rho) / r - 6.0 * C / dsq**4

    return PairPotential(term, gfn)


@functools.lru_cache(maxsize=None)
def harmonic(k: float = 1.0, r0: float = 1.0) -> PairPotential:
    """0.5 k (r - r0)^2 for every cutoff pair (soft repulsive/restoring
    shell; a cheap crowding model, not a bonded-topology spring)."""
    k, r0 = float(k), float(r0)

    def term(dsq):
        r = jnp.sqrt(dsq)
        return 0.5 * k * (r - r0) ** 2

    def gfn(dsq):
        r = jnp.sqrt(dsq)
        return -k * (r - r0) / r

    return PairPotential(term, gfn)


@functools.lru_cache(maxsize=None)
def lennard_jones_mixed(eps: tuple, sigma: tuple) -> PairPotential:
    """Multi-species LJ with Lorentz-Berthelot mixing, as PAYLOAD-
    parameterized term/gfn: both receive ``(dsq, s_i, s_j)`` where the
    s planes carry small integer species ids (0..S-1, as the f32 payload
    the kernels transport). Per endpoint, eps/sigma are one-hot selected
    (S multiply-adds each — no gathers, no tables in VMEM); the pair
    parameters are ``eps_ij = sqrt(eps_i eps_j)``,
    ``sigma_ij = (sigma_i + sigma_j) / 2``.

    Feed through the payload convention everywhere: energy/virial via
    ``pair_lag_reduce(sorted_payload=species[:, None], term=pot.term)``,
    forces via ``pair_lag_forces(sorted_payload=..., gfn=pot.gfn)``
    (carry the species column through `bin_and_sort` — never a gather).
    Symmetric under (i, j) swap, so Newton's third law holds exactly.
    """
    eps = tuple(float(e) for e in eps)
    sigma = tuple(float(s) for s in sigma)
    S = len(eps)
    assert len(sigma) == S and S >= 1

    def _mix(dsq, si, sj):
        ei = si * 0.0 + eps[0]
        si_g = si * 0.0 + sigma[0]
        ej = sj * 0.0 + eps[0]
        sj_g = sj * 0.0 + sigma[0]
        for a in range(1, S):
            ia = si == a
            ja = sj == a
            ei = jnp.where(ia, eps[a], ei)
            si_g = jnp.where(ia, sigma[a], si_g)
            ej = jnp.where(ja, eps[a], ej)
            sj_g = jnp.where(ja, sigma[a], sj_g)
        e_ij = jnp.sqrt(ei * ej)
        s_ij = 0.5 * (si_g + sj_g)
        return e_ij, s_ij * s_ij / dsq

    def term(dsq, si, sj):
        e_ij, x = _mix(dsq, si, sj)
        t = x**3
        return 4.0 * e_ij * t * (t - 1.0)

    def gfn(dsq, si, sj):
        e_ij, x = _mix(dsq, si, sj)
        t = x**3
        return 24.0 * e_ij * t * (2.0 * t - 1.0) / dsq

    return PairPotential(term, gfn)


@functools.lru_cache(maxsize=None)
def shifted(pot: PairPotential, cutoff: float) -> PairPotential:
    """Energy-shifted variant: V(r) - V(cutoff), forces unchanged.

    Removes the truncation discontinuity at the cutoff — crossing pairs
    no longer jump the total energy by V(cutoff), which is what makes
    energy-conservation checks on `md_run_vv` trajectories clean (see
    CLAUDE.md round-8 note: the jump is a potential discontinuity, not
    integrator error). Cached on (pot, cutoff), so repeated calls reuse
    the same function objects (no kernel retrace)."""
    import inspect

    import numpy as np

    # payload-parameterized potentials (lennard_jones_mixed: term takes
    # (dsq, s_i, s_j)) have no single V(cutoff) to subtract — the shift
    # depends on the species pair. Raise clearly instead of letting the
    # eager evaluation below fail with an opaque arity TypeError.
    n_params = len(inspect.signature(pot.term).parameters)
    if n_params != 1:
        raise ValueError(
            "shifted() supports scalar-dsq potentials only; a payload-"
            "parameterized potential (term(dsq, s_i, s_j)) needs a "
            "per-pair shift — subtract term(cutoff**2, s_i, s_j) inside "
            "a custom term instead"
        )

    vc = float(np.asarray(pot.term(jnp.asarray(float(cutoff) ** 2))))

    def term(dsq):
        return pot.term(dsq) - vc

    return PairPotential(term, pot.gfn)
