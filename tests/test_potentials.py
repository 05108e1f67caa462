"""Standard pair-potential factories (`ops.potentials`): force-factor
consistency vs numeric derivatives, fused-kernel integration on every
convention (term= energy, gfn= forces), and cache identity (the
retrace contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.ops.potentials import (
    PairPotential,
    buckingham,
    gaussian,
    harmonic,
    lennard_jones,
    morse,
    shifted,
    soft_sphere,
    wca,
    yukawa,
)

ALL = [
    ("lennard_jones", lambda: lennard_jones(0.7, 1.1)),
    ("wca", lambda: wca(0.7, 1.1)),
    ("soft_sphere", lambda: soft_sphere(0.5, 1.2, n=8)),
    ("gaussian", lambda: gaussian(2.0, 0.8)),
    ("morse", lambda: morse(1.3, 2.0, 1.1)),
    ("yukawa", lambda: yukawa(1.5, 0.7)),
    ("buckingham", lambda: buckingham(1000.0, 0.3, 1.0)),
    ("harmonic", lambda: harmonic(3.0, 1.0)),
]


@pytest.mark.parametrize("name,factory", ALL)
def test_gfn_is_energy_derivative(name, factory):
    """gfn == -2 dV/d(dsq) (so F_i = gfn * (p_i - p_j) = -grad V),
    checked against jax.grad of the term at f64 across the well."""
    pot = factory()
    dsq = jnp.asarray(np.linspace(0.6, 4.0, 61) ** 2, jnp.float64)
    dV = jax.vmap(jax.grad(lambda s: pot.term(s).sum()))(dsq)
    got = np.asarray(jax.vmap(pot.gfn)(dsq), np.float64)
    want = np.asarray(-2.0 * dV, np.float64)
    if name == "wca":  # exclude the cut point itself (one-sided)
        keep = np.abs(dsq - 2.0 ** (1 / 3) * 1.1**2) > 1e-2
        got, want = got[keep], want[keep]
    scale = np.abs(want).max() + 1e-12
    np.testing.assert_allclose(got, want, rtol=1e-9,
                               atol=1e-9 * scale)


@pytest.mark.parametrize("name,factory", ALL)
def test_cache_identity(name, factory):
    """Same parameters -> the SAME function objects (kernels jit on term
    identity; a fresh closure per call would retrace every time)."""
    a, b = factory(), factory()
    assert a.term is b.term and a.gfn is b.gfn


def test_fused_energy_and_forces_all_paths():
    """Each potential runs through the fused lag kernel (term= and gfn=)
    and matches the O(n^2) f64 brute force."""
    from zelll_tpu.core.binning import bin_and_sort
    from zelll_tpu.ops.pallas_pairs import (
        lag_coverage_ok,
        pair_lag_forces,
        pair_lag_reduce,
    )

    rng = np.random.default_rng(5)
    cutoff = 2.5
    # jittered lattice: guaranteed minimum separation keeps pairs off the
    # steep cores so the f64 brute force is well-scaled
    cells = np.stack(np.meshgrid(np.arange(4), np.arange(4),
                                 np.arange(18), indexing="ij"), -1)
    pts = (cells.reshape(-1, 3) + 0.5) * 1.25
    pts += rng.uniform(-0.2, 0.2, pts.shape)
    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    assert dsq.min() > 0.5

    bins, sp = bin_and_sort(jnp.asarray(pts), cutoff, max_cells=1,
                            need_perm=False)
    csq = jnp.asarray(cutoff) ** 2
    within = np.triu(dsq < cutoff**2)
    for name, factory in ALL:
        pot = factory()
        e = pair_lag_reduce(sp, bins.sorted_keys, bins.info.strides, csq,
                            M=512, L=512, term=pot.term, interpret=True)
        assert bool(lag_coverage_ok(bins.sorted_keys, bins.info.strides,
                                    512))
        vd = np.asarray(
            jax.vmap(pot.term)(jnp.asarray(np.where(within, dsq, 1.0)))
        )
        e_ref = float(np.where(within, vd, 0.0).sum())
        scale = max(abs(e_ref), np.abs(np.where(within, vd, 0.0)).sum(),
                    1e-12)
        assert abs(float(e) - e_ref) <= 1e-9 * scale, name

        f = pair_lag_forces(sp, bins.sorted_keys, bins.info.strides, csq,
                            M=512, L=512, gfn=pot.gfn, interpret=True)
        m = dsq < cutoff**2
        g = np.asarray(jax.vmap(pot.gfn)(jnp.asarray(np.where(m, dsq, 1.0))))
        g = np.where(m, g, 0.0)
        f_ref = (g[..., None] * d).sum(axis=1)
        # compare in sorted order: recompute brute force on sorted coords
        spn = np.asarray(sp, np.float64)
        ds = spn[:, None] - spn[None]
        dsqs = (ds * ds).sum(-1)
        np.fill_diagonal(dsqs, np.inf)
        ms = dsqs < cutoff**2
        gs = np.asarray(
            jax.vmap(pot.gfn)(jnp.asarray(np.where(ms, dsqs, 1.0)))
        )
        gs = np.where(ms, gs, 0.0)
        fs_ref = (gs[..., None] * ds).sum(axis=1)
        fscale = np.abs(fs_ref).max() + 1e-12
        assert np.abs(np.asarray(f, np.float64) - fs_ref).max() <= (
            1e-9 * fscale
        ), name


def test_shifted_continuity_and_forces():
    """shifted(pot, rc): V(rc) == 0 (continuous truncation), forces
    unchanged, cached on (pot, rc)."""
    pot = lennard_jones(1.0, 1.0)
    s = shifted(pot, 2.5)
    assert shifted(pot, 2.5) is s
    assert abs(float(s.term(jnp.asarray(2.5**2)))) < 1e-12
    assert s.gfn is pot.gfn
    dsq = jnp.asarray(1.7)
    assert abs(
        float(s.term(dsq)) - (float(pot.term(dsq)) - float(pot.term(
            jnp.asarray(2.5**2))))
    ) < 1e-12


def test_potentials_compose_with_pbc_and_virial():
    """term/gfn plug into the PBC sum and the virial-from-gfn adapter."""
    from zelll_tpu.ops.pbc import pbc_pair_sum
    from zelll_tpu.ops.virial import virial_term_from_gfn

    rng = np.random.default_rng(9)
    box = np.array([4.0, 4.0, 12.0])
    pts = rng.uniform(0, 1, size=(200, 3)) * box
    c = 1.5
    pot = yukawa(1.5, 0.7)
    e, ok = pbc_pair_sum(jnp.asarray(pts), np.zeros(3), box, c,
                         term=pot.term, M=512, L=512, interpret=True)
    assert bool(ok)
    d = pts[:, None] - pts[None]
    d -= box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    m = np.triu(dsq < c * c)
    v = np.asarray(jax.vmap(pot.term)(jnp.asarray(np.where(m, dsq, 1.0))))
    e_ref = float(np.where(m, v, 0.0).sum())
    assert abs(float(e) - e_ref) <= 1e-9 * max(abs(e_ref), 1e-12)

    wterm = virial_term_from_gfn(pot.gfn)
    w, okw = pbc_pair_sum(jnp.asarray(pts), np.zeros(3), box, c,
                          term=wterm, M=512, L=512, interpret=True)
    assert bool(okw)
    g = np.asarray(jax.vmap(pot.gfn)(jnp.asarray(np.where(m, dsq, 1.0))))
    w_ref = float(np.where(m, g * dsq, 0.0).sum())
    assert abs(float(w) - w_ref) <= 1e-9 * max(abs(w_ref), 1e-12)


def test_mixed_lj_energy_forces_vs_bruteforce():
    """Two-species LB-mixed LJ through the payload convention: energy via
    pair_lag_reduce(sorted_payload=...), forces via the (new) payload
    forces kernel — exact vs an f64 brute force with per-pair
    eps_ij = sqrt(eps_i eps_j), sigma_ij = (sigma_i + sigma_j)/2."""
    from zelll_tpu.core.binning import bin_and_sort
    from zelll_tpu.ops.pallas_pairs import pair_lag_forces, pair_lag_reduce
    from zelll_tpu.ops.potentials import lennard_jones_mixed

    rng = np.random.default_rng(11)
    eps, sig = (1.0, 0.4), (1.0, 1.3)
    pot = lennard_jones_mixed(eps, sig)
    assert lennard_jones_mixed(eps, sig) is pot

    cells = np.stack(np.meshgrid(np.arange(3), np.arange(3),
                                 np.arange(20), indexing="ij"), -1)
    pts = (cells.reshape(-1, 3) + 0.5) * 1.3
    pts += rng.uniform(-0.15, 0.15, pts.shape)
    spec = rng.integers(0, 2, len(pts)).astype(np.float64)
    cutoff = 3.0

    bins, cols = bin_and_sort(
        jnp.concatenate([jnp.asarray(pts), jnp.asarray(spec)[:, None]],
                        axis=1),
        cutoff, max_cells=1, need_perm=False,
    )
    sp, spay = cols[:, :3], cols[:, 3:]
    csq = jnp.asarray(cutoff) ** 2

    e = pair_lag_reduce(sp, bins.sorted_keys, bins.info.strides, csq,
                        sorted_payload=spay, term=pot.term,
                        M=512, L=512, interpret=True)
    f = pair_lag_forces(sp, bins.sorted_keys, bins.info.strides, csq,
                        sorted_payload=spay, gfn=pot.gfn,
                        M=512, L=512, interpret=True)

    # f64 brute force on the SORTED order
    p = np.asarray(sp, np.float64)
    s = np.asarray(spay[:, 0], np.float64).astype(int)
    d = p[:, None] - p[None]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    m = dsq < cutoff**2
    e_i = np.asarray(eps)[s]
    s_i = np.asarray(sig)[s]
    e_ij = np.sqrt(e_i[:, None] * e_i[None, :])
    s_ij = 0.5 * (s_i[:, None] + s_i[None, :])
    x = np.where(m, (s_ij**2) / np.where(m, dsq, 1.0), 0.0)
    t = x**3
    v = 4.0 * e_ij * t * (t - 1.0)
    e_ref = float(np.where(np.triu(m), v, 0.0).sum())
    assert abs(float(e) - e_ref) <= 1e-9 * max(abs(e_ref), 1e-12)

    g = np.where(m, 24.0 * e_ij * t * (2.0 * t - 1.0)
                 / np.where(m, dsq, 1.0), 0.0)
    f_ref = (g[..., None] * d).sum(axis=1)
    fscale = np.abs(f_ref).max() + 1e-12
    assert np.abs(np.asarray(f, np.float64) - f_ref).max() <= 1e-9 * fscale


def test_md_species_matches_numpy():
    """Multi-species MD (species column rides the sort; payload gfn in
    the forces kernel) reproduces a numpy semi-implicit Euler reference
    with per-pair LB parameters, and md_run_species == stepwise."""
    from zelll_tpu.models.lj_md import MDState, md_run_species, md_step_species
    from zelll_tpu.ops.potentials import lennard_jones_mixed

    rng = np.random.default_rng(13)
    eps, sig = (1.0, 0.5), (1.0, 1.2)
    pot = lennard_jones_mixed(eps, sig)
    cells = np.stack(np.meshgrid(np.arange(3), np.arange(3),
                                 np.arange(12), indexing="ij"), -1)
    pts = (cells.reshape(-1, 3) + 0.5) * 1.4
    pts += rng.uniform(-0.05, 0.05, pts.shape)
    spec = rng.integers(0, 2, len(pts)).astype(np.float64)
    vel = rng.normal(0, 0.05, pts.shape)
    cutoff, dt, steps = 3.0, 1e-3, 4

    def np_forces(p, s):
        d = p[:, None] - p[None]
        dsq = (d * d).sum(-1)
        np.fill_diagonal(dsq, np.inf)
        m = dsq < cutoff**2
        e_i = np.asarray(eps)[s.astype(int)]
        s_i = np.asarray(sig)[s.astype(int)]
        e_ij = np.sqrt(e_i[:, None] * e_i[None])
        s_ij = 0.5 * (s_i[:, None] + s_i[None])
        x = np.where(m, s_ij**2 / np.where(m, dsq, 1.0), 0.0)
        t = x**3
        g = np.where(m, 24.0 * e_ij * t * (2.0 * t - 1.0)
                     / np.where(m, dsq, 1.0), 0.0)
        return (g[..., None] * d).sum(axis=1)

    p_np, v_np = pts.copy(), vel.copy()
    for _ in range(steps):
        v_np = v_np + dt * np_forces(p_np, spec)
        p_np = p_np + dt * v_np

    st = MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel))
    sp = jnp.asarray(spec)
    st1, sp1 = st, sp
    for _ in range(steps):
        st1, sp1, ok = md_step_species(st1, sp1, cutoff, dt, pot=pot,
                                       M=512, L=512, interpret=True)
        assert bool(ok)
    # compare as (x, y, z, species) row sets (device state is re-sorted)
    got = np.concatenate(
        [np.asarray(st1.positions), np.asarray(sp1)[:, None],
         np.asarray(st1.velocities)], axis=1)
    want = np.concatenate([p_np, spec[:, None], v_np], axis=1)
    order = lambda a: a[np.lexsort(a.T[::-1])]
    np.testing.assert_allclose(order(got), order(want), rtol=1e-9,
                               atol=1e-9)

    st2, sp2, ok2, e2 = md_run_species(
        MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel)),
        jnp.asarray(spec), cutoff, dt, pot=pot, steps=steps,
        M=512, L=512, interpret=True)
    assert bool(ok2)
    got2 = np.concatenate(
        [np.asarray(st2.positions), np.asarray(sp2)[:, None]], axis=1)
    np.testing.assert_allclose(order(got2), order(want[:, :4]),
                               rtol=1e-9, atol=1e-9)
    assert np.isfinite(float(e2))


@pytest.mark.parametrize("mi", [False, "auto"])
def test_mixed_pbc_forces_vs_bruteforce(mi):
    """Species-dependent PBC forces: ghost images inherit their parent's
    species (ghost branch) / species ride the min-image binning extras
    (fold branch) — both match the f64 minimum-image LB brute force."""
    from zelll_tpu.ops.pbc import pbc_lj_forces
    from zelll_tpu.ops.potentials import lennard_jones_mixed

    rng = np.random.default_rng(17)
    eps, sig = (1.0, 0.5), (1.0, 1.2)
    pot = lennard_jones_mixed(eps, sig)
    box = np.array([2.8, 2.8, 16.8])
    cells = np.stack(np.meshgrid(np.arange(2), np.arange(2),
                                 np.arange(12), indexing="ij"), -1)
    pts = (cells.reshape(-1, 3) + 0.5) * 1.4
    pts += rng.uniform(-0.05, 0.05, pts.shape)
    spec = rng.integers(0, 2, len(pts)).astype(np.float64)
    cutoff = 1.35  # box > 2*cutoff on every axis

    f, ok = pbc_lj_forces(
        jnp.asarray(pts), np.zeros(3), box, cutoff, gfn=pot.gfn,
        species=jnp.asarray(spec), M=512, L=512, interpret=True,
        minimage=mi,
    )
    assert bool(ok)

    d = pts[:, None] - pts[None]
    d -= box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    m = dsq < cutoff**2
    e_i = np.asarray(eps)[spec.astype(int)]
    s_i = np.asarray(sig)[spec.astype(int)]
    e_ij = np.sqrt(e_i[:, None] * e_i[None])
    s_ij = 0.5 * (s_i[:, None] + s_i[None])
    x = np.where(m, s_ij**2 / np.where(m, dsq, 1.0), 0.0)
    t = x**3
    g = np.where(m, 24.0 * e_ij * t * (2.0 * t - 1.0)
                 / np.where(m, dsq, 1.0), 0.0)
    f_ref = (g[..., None] * d).sum(axis=1)
    fscale = np.abs(f_ref).max() + 1e-12
    assert np.abs(np.asarray(f, np.float64) - f_ref).max() <= 1e-9 * fscale


def test_mixed_pbc_forces_tile_raises():
    from zelll_tpu.ops.pbc import pbc_lj_forces
    from zelll_tpu.ops.potentials import lennard_jones_mixed

    pot = lennard_jones_mixed((1.0, 0.5), (1.0, 1.2))
    pts = np.random.default_rng(0).uniform(0, 4, (32, 3))
    with pytest.raises(ValueError, match="lag path"):
        pbc_lj_forces(jnp.asarray(pts), np.zeros(3), np.full(3, 4.0), 1.0,
                      gfn=pot.gfn, species=jnp.zeros(32), path="tile")
