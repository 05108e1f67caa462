"""2D pencil domain decomposition (parallel.pencil) on the virtual
8-device CPU mesh, vs an f64 O(n^2) oracle and vs the 1D slab path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from zelll_tpu.parallel.pencil import (
    make_pencil_mesh,
    partition_by_pencil,
    sharded_pencil_lj_energy,
    sharded_pencil_md_step,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

CUT = 1.0


def _cloud(n=3000, seed=0, box=(6.0, 16.0, 24.0)):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=(n, 3)) * np.array(box)


def _ref_energy(pts):
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    w = np.triu(dsq < CUT * CUT)
    t = 1.0 / np.where(w, dsq, 1.0)
    t3 = t**3
    return float(np.where(w, 4.0 * t3 * (t3 - 1.0), 0.0).sum())


def _ref_forces(pts):
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    w = dsq < CUT * CUT
    t = 1.0 / np.where(w, dsq, 1.0)
    t3 = t * t * t
    g = np.where(w, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    return np.einsum("ij,ijk->ik", g, d)


def _put(mesh, arr):
    return jax.device_put(
        jnp.asarray(arr), NamedSharding(mesh, P(("z", "y"), None))
    )


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (8, 1)])
def test_pencil_energy_matches_oracle(shape):
    pts = _cloud()
    mesh = make_pencil_mesh(shape)
    parts, n_local, mid_bounds, n_real = partition_by_pencil(pts, CUT, shape)
    efn = sharded_pencil_lj_energy(
        mesh, cutoff=CUT, HZ=256, HY=512, L=512, interpret=True
    )
    e, ok = efn(_put(mesh, parts), mid_bounds, n_real)
    assert bool(ok)
    np.testing.assert_allclose(float(e), _ref_energy(pts), rtol=1e-9)


def test_pencil_energy_matches_slab_path():
    from zelll_tpu.parallel import (
        make_mesh, partition_by_slab, sharded_lj_energy,
    )

    pts = _cloud(seed=3)
    # slab (1D) reference
    mesh1 = make_mesh(8)
    parts1, _ = partition_by_slab(pts, CUT, 8)
    e1, ok1 = sharded_lj_energy(mesh1, cutoff=CUT, H=320, K=32, chunk=32)(
        jax.device_put(jnp.asarray(parts1),
                       NamedSharding(mesh1, P("z", None)))
    )
    # pencil (2, 4)
    mesh2 = make_pencil_mesh((2, 4))
    parts2, _, mb, nr = partition_by_pencil(pts, CUT, (2, 4))
    e2, ok2 = sharded_pencil_lj_energy(
        mesh2, cutoff=CUT, HZ=512, HY=512, L=1024, interpret=True
    )(_put(mesh2, parts2), mb, nr)
    assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(float(e2), float(e1), rtol=1e-12)


def test_pencil_md_step_forces_match_oracle():
    pts = _cloud(n=2000, seed=5)
    shape = (2, 4)
    mesh = make_pencil_mesh(shape)
    parts, n_local, mb, nr = partition_by_pencil(pts, CUT, shape)
    vel = np.zeros_like(parts)
    dt = 1e-4
    step = sharded_pencil_md_step(
        mesh, cutoff=CUT, HZ=256, HY=512, dt=dt, L=512, interpret=True
    )
    p2, v2, e, ok = step(_put(mesh, parts), _put(mesh, vel), mb, nr)
    assert bool(ok)
    np.testing.assert_allclose(float(e), _ref_energy(pts), rtol=1e-9)

    # map rows back by reconstructing originals (x2 = x + dt*v2, v0 = 0)
    p2, v2 = np.asarray(p2), np.asarray(v2)
    orig = p2 - dt * v2
    f_ref = _ref_forces(pts)
    # pads reconstruct to their far coords and match nothing; select the
    # real rows by matching against the input cloud
    d = ((orig[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    match = d.argmin(axis=1)
    good = d[np.arange(len(orig)), match] < 1e-16
    assert good.sum() == len(pts)
    np.testing.assert_allclose(v2[good] / dt, f_ref[match[good]],
                               rtol=1e-9, atol=1e-10)


def test_pencil_flags_trip_on_small_capacity():
    pts = _cloud(n=3000, seed=7)
    shape = (2, 4)
    mesh = make_pencil_mesh(shape)
    parts, _, mb, nr = partition_by_pencil(pts, CUT, shape)
    # HY far below the boundary-column population: capacity flag must trip
    efn = sharded_pencil_lj_energy(
        mesh, cutoff=CUT, HZ=256, HY=8, L=512, interpret=True
    )
    _, ok = efn(_put(mesh, parts), mb, nr)
    assert not bool(ok)


def _lattice(nx=8, ny=10, nz=12, spacing=1.3, seed=0, jitter=0.05):
    """Well-separated jittered lattice: random uniform LJ clouds contain
    overlapping pairs whose forces are ~1/r^13 ~ 1e30 — no dt makes that
    a steppable trajectory."""
    rng = np.random.default_rng(seed)
    g = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij"), -1).reshape(-1, 3)
    return g * spacing + rng.uniform(-jitter, jitter, (len(g), 3))


def test_pencil_md_run_matches_step_loop():
    """sharded_pencil_md_run == iterating sharded_pencil_md_step (the
    scanned trajectory is the same physics in one dispatch)."""
    from zelll_tpu.parallel.pencil import sharded_pencil_md_run

    pts = _lattice(seed=11)
    shape = (2, 4)
    mesh = make_pencil_mesh(shape)
    parts, _, mb, nr = partition_by_pencil(pts, CUT, shape)
    vel = np.zeros_like(parts)
    dt, steps = 1e-8, 3  # tiny dt: a random uniform LJ cloud explodes fast
    step = sharded_pencil_md_step(
        mesh, cutoff=CUT, HZ=256, HY=512, dt=dt, L=512, interpret=True
    )
    p, v = _put(mesh, parts), _put(mesh, vel)
    ok_all = True
    for _ in range(steps):
        p, v, e, ok = step(p, v, mb, nr)
        ok_all = ok_all and bool(ok)
    run = sharded_pencil_md_run(
        mesh, cutoff=CUT, HZ=256, HY=512, steps=steps, dt=dt, L=512,
        interpret=True,
    )
    p2, v2, e2, ok2 = run(_put(mesh, parts), _put(mesh, vel), mb, nr)
    assert ok_all and bool(ok2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), rtol=0,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=0,
                               atol=1e-12)
    np.testing.assert_allclose(float(e2), float(e), rtol=1e-12)


def test_pencil_md_step_tile_backend_matches_lag():
    """use_tile=True (segment-tile kernels) computes the same step."""
    pts = _cloud(n=1500, seed=13, box=(9.0, 9.0, 10.0))
    shape = (2, 4)
    mesh = make_pencil_mesh(shape)
    parts, _, mb, nr = partition_by_pencil(pts, CUT, shape)
    vel = np.zeros_like(parts)
    dt = 1e-4
    stepL = sharded_pencil_md_step(
        mesh, cutoff=CUT, HZ=256, HY=512, dt=dt, L=1024, interpret=True
    )
    stepT = sharded_pencil_md_step(
        mesh, cutoff=CUT, HZ=256, HY=512, dt=dt, MAXJ=24, use_tile=True,
        interpret=True,
    )
    pL, vL, eL, okL = stepL(_put(mesh, parts), _put(mesh, vel), mb, nr)
    pT, vT, eT, okT = stepT(_put(mesh, parts), _put(mesh, vel), mb, nr)
    assert bool(okL) and bool(okT)
    np.testing.assert_allclose(float(eT), float(eL), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vT), np.asarray(vL), rtol=1e-5,
                               atol=1e-8)


def test_pencil_species_payload_energy():
    """n_payload=1 species column: mixed-LB energy across the pencil mesh
    matches the per-pair oracle."""
    from zelll_tpu.ops.potentials import lennard_jones_mixed

    rng = np.random.default_rng(17)
    pts = _cloud(n=2000, seed=17)
    spec = rng.integers(0, 2, len(pts))
    eps_s = (1.0, 0.25)
    sig_s = (0.5, 0.6)
    term, _gfn = lennard_jones_mixed(eps_s, sig_s)
    eps = np.sqrt(np.outer(eps_s, eps_s))
    sig = (np.asarray(sig_s)[:, None] + np.asarray(sig_s)[None, :]) / 2

    shape = (2, 4)
    mesh = make_pencil_mesh(shape)
    cols = np.concatenate([pts, spec[:, None].astype(float)], axis=1)
    parts, _, mb, nr = partition_by_pencil(cols, CUT, shape, n_payload=1)
    efn = sharded_pencil_lj_energy(
        mesh, cutoff=CUT, HZ=256, HY=512, L=1024, term=term, n_payload=1,
        interpret=True,
    )
    e, ok = efn(_put(mesh, parts), mb, nr)
    assert bool(ok)

    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    w = np.triu(dsq < CUT * CUT)
    e_ij = eps[spec[:, None], spec[None, :]]
    s_ij = sig[spec[:, None], spec[None, :]]
    t = (s_ij**2) / np.where(w, dsq, 1.0)
    t3 = t**3
    ref = float(np.where(w, 4.0 * e_ij * t3 * (t3 - 1.0), 0.0).sum())
    np.testing.assert_allclose(float(e), ref, rtol=1e-9)


def test_pencil_ydrift_flag_trips_and_repartition_recovers():
    """A particle moved into the next y-column trips coverage_ok (the
    never-silently-drop invariant for y-migration, round-4 advisor fix);
    repartition_pencil restores residency and the energy stays exact."""
    from zelll_tpu.parallel.pencil import repartition_pencil

    pts = _cloud(n=2000, seed=19)
    shape = (2, 4)
    mesh = make_pencil_mesh(shape)
    parts, n_local, mb, nr = partition_by_pencil(pts, CUT, shape,
                                                 slack=16)
    efn = sharded_pencil_lj_energy(
        mesh, cutoff=CUT, HZ=256, HY=512, L=1024, interpret=True
    )
    e0, ok0 = efn(_put(mesh, parts), mb, nr)
    assert bool(ok0)

    # teleport one real row of device (0, 1) into column 0's y-range:
    # energy would silently lose its cross-column pairs without the flag
    parts2 = np.asarray(parts).copy()
    row = 1 * n_local  # device (z=0, y=1), first row (real: nr[1] > 0)
    assert int(np.asarray(nr)[1]) > 0
    moved = parts2[row].copy()
    # move along the mid axis into the first column's cells
    mid_axis = 1  # box (6, 16, 24): y = mid extent
    moved[mid_axis] = 0.01
    parts2[row] = moved
    _, ok1 = efn(_put(mesh, parts2), mb, nr)
    assert not bool(ok1)

    repfn = repartition_pencil(mesh, cutoff=CUT, shape=shape)
    p3, mb3, nr3, okr = repfn(_put(mesh, parts2), mb, nr)
    assert bool(okr)
    e3, ok3 = efn(_put(mesh, np.asarray(p3)), mb3, nr3)
    assert bool(ok3)
    pts_ref = pts.copy()
    # reconstruct the modified cloud: device (0,1) first row was some
    # real particle; identify it by matching parts[row] in pts
    d = ((pts - np.asarray(parts)[row]) ** 2).sum(-1)
    src = int(d.argmin())
    assert d[src] < 1e-16
    pts_ref[src] = moved
    np.testing.assert_allclose(float(e3), _ref_energy(pts_ref), rtol=1e-9)


def _ref_energy_pbc(pts, origin, box, cutoff):
    d = pts[:, None, :] - pts[None, :, :]
    d = d - box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    w = np.triu(dsq < cutoff * cutoff)
    t = 1.0 / np.where(w, dsq, 1.0)
    t3 = t**3
    return float(np.where(w, 4.0 * t3 * (t3 - 1.0), 0.0).sum())


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (1, 8), (2, 1)])
def test_pencil_pbc_energy_matches_minimage_oracle(shape):
    """Periodic pencil energy == O(n^2) minimum-image f64 oracle: z wraps
    the z ring, y wraps the y ring, minor-axis ghost images, corners via
    the two-phase forwarding — all deduped by the ownership plane."""
    from zelll_tpu.parallel.pencil import (
        partition_by_pencil_pbc, sharded_pencil_pbc_lj_energy,
    )

    rng = np.random.default_rng(23)
    origin = np.zeros(3)
    box = np.array([5.0, 12.0, 16.0])
    n = 2500
    pts = rng.uniform(0, 1, (n, 3)) * box
    mesh = make_pencil_mesh(shape)
    parts, n_local, mb, nr = partition_by_pencil_pbc(
        pts, origin, box, CUT, shape)
    efn = sharded_pencil_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=CUT, HZ=512, HY=1024,
        B=4096, G=8192, L=2048, interpret=True,
    )
    e, ok = efn(_put(mesh, parts), mb, nr)
    assert bool(ok), shape
    # rtol 1e-8: the random cloud's energy is dominated by a few huge
    # near-overlap terms; different summation orders across mesh shapes
    # cost a few ulps of the largest term
    np.testing.assert_allclose(
        float(e), _ref_energy_pbc(pts, origin, box, CUT), rtol=1e-8)


def test_pencil_pbc_md_run_matches_oracle_trajectory():
    """3 periodic pencil MD steps == a numpy minimum-image trajectory
    (forces exact for owned rows; positions wrapped)."""
    from zelll_tpu.parallel.pencil import (
        partition_by_pencil_pbc, sharded_pencil_pbc_md_run,
    )

    rng = np.random.default_rng(29)
    origin = np.zeros(3)
    box = np.array([5.0, 10.0, 14.0])
    pts = _lattice(nx=4, ny=7, nz=10, spacing=1.35, seed=29, jitter=0.04)
    pts = np.mod(pts, box)
    n = len(pts)
    dt, steps = 1e-6, 3
    shape = (2, 2)
    mesh = make_pencil_mesh(shape)
    parts, n_local, mb, nr = partition_by_pencil_pbc(
        pts, origin, box, CUT, shape)
    vel = np.zeros_like(parts)
    run = sharded_pencil_pbc_md_run(
        mesh, origin=origin, box=box, cutoff=CUT, HZ=512, HY=1024,
        B=4096, G=8192, steps=steps, dt=dt, L=2048, interpret=True,
    )
    p2, v2, e, ok = run(_put(mesh, parts), _put(mesh, vel), mb, nr)
    assert bool(ok)

    # numpy oracle trajectory
    def forces(pts):
        d = pts[:, None, :] - pts[None, :, :]
        d = d - box * np.round(d / box)
        dsq = (d * d).sum(-1)
        np.fill_diagonal(dsq, np.inf)
        w = dsq < CUT * CUT
        t = 1.0 / np.where(w, dsq, 1.0)
        t3 = t * t * t
        g = np.where(w, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
        return np.einsum("ij,ijk->ik", g, d)

    P_, V_ = pts.copy(), np.zeros((n, 3))
    for _ in range(steps):
        V_ = V_ + dt * forces(P_)
        P_ = origin + np.mod(P_ + dt * V_ - origin, box)
    e_ref = _ref_energy_pbc(P_, origin, box, CUT)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-8)

    # match real rows by velocity-reconstructed identity
    p2, v2 = np.asarray(p2), np.asarray(v2)
    real = np.concatenate([
        (np.arange(n_local) < int(c)) for c in np.asarray(nr)
    ])
    d = ((p2[real][:, None, :] - P_[None, :, :]) ** 2).sum(-1)
    match = d.argmin(axis=1)
    assert (d[np.arange(real.sum()), match] < 1e-12).all()
    assert len(set(match.tolist())) == n
    np.testing.assert_allclose(v2[real], V_[match], rtol=1e-7, atol=1e-10)


def _ref_stress(pts):
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    w = np.triu(dsq < CUT * CUT)
    t = 1.0 / np.where(w, dsq, 1.0)
    t3 = t * t * t
    g = np.where(w, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    return np.einsum("ij,ija,ijb->ab", g, d, d)


@pytest.mark.parametrize("shape,use_tile", [((2, 4), False), ((4, 2), True)])
def test_pencil_stress_matches_oracle(shape, use_tile):
    """Pencil stress (0.5-ownership pair_weight) vs the f64 oracle on
    both kernel paths."""
    from zelll_tpu.parallel.pencil import sharded_pencil_stress

    pts = _cloud(seed=7)
    mesh = make_pencil_mesh(shape)
    parts, n_local, mid_bounds, n_real = partition_by_pencil(pts, CUT, shape)
    sfn = sharded_pencil_stress(
        mesh, cutoff=CUT, HZ=256, HY=512, L=512, MAXJ=16,
        use_tile=use_tile, interpret=True,
    )
    sig, ok = sfn(_put(mesh, parts), mid_bounds, n_real)
    assert bool(ok)
    ref = _ref_stress(pts)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(sig), ref, atol=scale * 1e-9
    )


@pytest.mark.parametrize("shape,use_tile", [((4, 2), False), ((2, 4), True)])
def test_pencil_hist_matches_oracle(shape, use_tile):
    """Pencil pair histogram (coord-tie-key boolean ownership) vs numpy
    brute force: integer-exact cumulative counts on both kernel paths."""
    from zelll_tpu.ops.pallas_pairs import combine_count_vec
    from zelll_tpu.parallel.pencil import sharded_pencil_pair_hist

    pts = _cloud(seed=11)
    edges = np.linspace(0.25, CUT, 8)
    mesh = make_pencil_mesh(shape)
    parts, n_local, mid_bounds, n_real = partition_by_pencil(pts, CUT, shape)
    hfn = sharded_pencil_pair_hist(
        mesh, edges, HZ=256, HY=512, L=512, MAXJ=16,
        use_tile=use_tile, interpret=True,
    )
    packed, ok = hfn(_put(mesh, parts), mid_bounds, n_real)
    assert bool(ok)
    counts = combine_count_vec(np.asarray(packed))

    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    iu = np.triu_indices(len(pts), k=1)
    pd = dsq[iu]
    ref = np.array([(pd < e * e).sum() for e in edges])
    np.testing.assert_array_equal(counts, ref)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_pencil_pbc_energy_minimage(shape):
    """Pencil PBC with in-kernel minor-axis minimum image (no ghost
    rows) == the O(n^2) minimum-image oracle."""
    from zelll_tpu.parallel.pencil import (
        partition_by_pencil_pbc, sharded_pencil_pbc_lj_energy,
    )

    rng = np.random.default_rng(29)
    origin = np.zeros(3)
    box = np.array([3.5, 12.0, 16.0])  # minor = 4 cells: foldable
    n = 2200
    pts = rng.uniform(0, 1, (n, 3)) * box
    mesh = make_pencil_mesh(shape)
    parts, n_local, mb, nr = partition_by_pencil_pbc(
        pts, origin, box, CUT, shape)
    efn = sharded_pencil_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=CUT, HZ=512, HY=1024,
        B=4096, G=8192, L=2048, interpret=True, minimage=True,
    )
    e, ok = efn(_put(mesh, parts), mb, nr)
    assert bool(ok), shape
    np.testing.assert_allclose(
        float(e), _ref_energy_pbc(pts, origin, box, CUT), rtol=1e-8)


def test_pencil_pbc_md_step_minimage():
    """One pencil PBC MD step with minor-axis minimage matches the
    ghost-image path bit-for... to oracle forces (same trajectory)."""
    from zelll_tpu.parallel.pencil import (
        partition_by_pencil_pbc, sharded_pencil_pbc_md_step,
    )

    rng = np.random.default_rng(31)
    origin = np.zeros(3)
    box = np.array([3.5, 12.0, 16.0])
    n = 1500
    pts = rng.uniform(0, 1, (n, 3)) * box
    shape = (2, 4)
    mesh = make_pencil_mesh(shape)
    parts, n_local, mb, nr = partition_by_pencil_pbc(
        pts, origin, box, CUT, shape)
    vel = np.zeros_like(parts)
    kw = dict(origin=origin, box=box, cutoff=CUT, HZ=512, HY=1024,
              B=4096, G=8192, L=2048, dt=1e-4, interpret=True)
    step_g = sharded_pencil_pbc_md_step(mesh, **kw)
    step_m = sharded_pencil_pbc_md_step(mesh, minimage=True, **kw)
    pg, vg, eg, okg = step_g(_put(mesh, parts), _put(mesh, vel), mb, nr)
    pm, vm, em, okm = step_m(_put(mesh, parts), _put(mesh, vel), mb, nr)
    assert bool(okg) and bool(okm)
    np.testing.assert_allclose(float(em), float(eg), rtol=1e-6)
    # same real-row trajectories (order may differ per path; match by
    # sorted flattened values)
    np.testing.assert_allclose(
        np.sort(np.asarray(vm), axis=0), np.sort(np.asarray(vg), axis=0),
        atol=1e-10)
