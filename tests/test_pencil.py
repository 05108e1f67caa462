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
