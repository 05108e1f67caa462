"""Fast smoke tier (``pytest -m fast``): one small oracle-checked case
per kernel family, all in interpret mode on CPU. Target < 5 min on the
1-core host — the quick gate for iterating on kernel code; the full
suite (and `benchmarks/tpu_parity.py` on hardware) remains the real
gate. The tiering idea mirrors the reference's quick_bench feature
(/root/reference/benches/cellgrid.rs:44-45).
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def cloud():
    # jittered lattice: bounded minimum separation keeps LJ magnitudes
    # sane so f32-vs-f64 oracle comparisons are meaningful
    rng = np.random.default_rng(42)
    g = np.stack(np.meshgrid(*[np.arange(6)] * 2 + [np.arange(7)],
                             indexing="ij"), -1)
    pts = g.reshape(-1, 3) * 0.82 + rng.uniform(-0.16, 0.16, (252, 3))
    return pts


def _oracle(pts, cutoff, box=None):
    d = pts[:, None, :] - pts[None, :, :]
    if box is not None:
        d -= box * np.round(d / np.asarray(box))
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = dsq < cutoff * cutoff
    t = 1.0 / np.where(within, dsq, 1.0)
    t3 = t * t * t
    e = float(np.where(np.triu(within), 4.0 * t3 * (t3 - 1.0), 0.0).sum())
    g = np.where(within, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    forces = np.einsum("ij,ijk->ik", g, d)
    count = int(np.triu(within).sum())
    return e, forces, count


def test_lag_energy_count(cloud):
    from zelll_tpu.core.binning import bin_and_sort
    from zelll_tpu.ops.pallas_pairs import (
        combine_count, count_term, lag_coverage_ok, pair_lag_reduce,
        suggest_lag,
    )

    e_ref, _, c_ref = _oracle(cloud, 1.0)
    bins, sp = bin_and_sort(jnp.asarray(cloud), 1.0, max_cells=1,
                            need_perm=False, auto_order=True)
    L = suggest_lag(np.asarray(bins.sorted_keys), np.asarray(bins.info.strides))
    e = pair_lag_reduce(sp, bins.sorted_keys, bins.info.strides, 1.0,
                        M=1024, L=L, interpret=True)
    assert bool(lag_coverage_ok(bins.sorted_keys, bins.info.strides, L))
    assert abs(float(e) - e_ref) < 1e-6 * abs(e_ref)
    cnt = pair_lag_reduce(sp, bins.sorted_keys, bins.info.strides, 1.0,
                          M=1024, L=L, term=count_term,
                          out_dtype=jnp.int32, interpret=True)
    assert int(combine_count(cnt)) == c_ref


def test_tile_energy_forces(cloud):
    from zelll_tpu.core.binning import bin_and_sort
    from zelll_tpu.ops.tile_pairs import tile_pair_forces, tile_pair_reduce

    e_ref, f_ref, _ = _oracle(cloud, 1.0)
    bins, sp = bin_and_sort(jnp.asarray(cloud), 1.0, max_cells=1,
                            need_perm=True, auto_order=True)
    e, ok = tile_pair_reduce(sp, bins.sorted_keys, bins.info.strides, 1.0,
                             MAXJ=16, interpret=True)
    assert bool(ok) and abs(float(e) - e_ref) < 1e-6 * abs(e_ref)
    f, okf = tile_pair_forces(sp, bins.sorted_keys, bins.info.strides, 1.0,
                              MAXJ=16, interpret=True)
    assert bool(okf)
    f_unsorted = np.asarray(f)[np.argsort(np.asarray(bins.perm))]
    np.testing.assert_allclose(f_unsorted, f_ref, rtol=1e-5, atol=1e-7)


def test_hist_and_stress(cloud):
    from zelll_tpu.ops.rdf import pair_distance_histogram
    from zelll_tpu.ops.virial import fused_stress_open

    edges = np.array([0.3, 0.6, 1.0])
    counts, ok = pair_distance_histogram(jnp.asarray(cloud), edges,
                                         path="tile", MAXJ=16,
                                         interpret=True)
    assert bool(ok)
    d = cloud[:, None, :] - cloud[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    r = np.sqrt(dsq)
    ref = [int((np.triu((r >= edges[k]) & (r < edges[k + 1]))).sum())
           for k in range(2)]
    assert list(np.asarray(counts)) == ref

    _, f_ref, _ = _oracle(cloud, 1.0)
    sigma, oks = fused_stress_open(jnp.asarray(cloud), 1.0, path="lag",
                                   L=512, interpret=True)
    assert bool(oks)
    assert bool(jnp.all(jnp.isfinite(sigma)))


def test_pbc_energy(cloud):
    from zelll_tpu.ops.pbc import pbc_lj_energy

    box = np.array([5.0, 5.0, 6.0])
    e_ref, _, _ = _oracle(cloud, 1.0, box=box)
    e, ok = pbc_lj_energy(jnp.asarray(cloud), np.zeros(3), box, 1.0,
                          interpret=True)
    assert bool(ok)
    assert abs(float(e) - e_ref) < 1e-6 * abs(e_ref)


def test_join_counts(cloud):
    from zelll_tpu.api import CellGrid

    cg = CellGrid(cloud, cutoff=1.0)
    q = cloud[:5] + 0.01
    counts, valid = cg.count_neighbors_batch(q)
    assert valid.all()
    d = cloud[None, :, :] - q[:, None, :]
    ref = ((d * d).sum(-1) <= 1.0).sum(-1)
    np.testing.assert_array_equal(counts, ref)


def test_sharded_energy():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zelll_tpu.parallel import (
        make_mesh, partition_by_slab, sharded_lj_energy,
    )

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1, size=(600, 3)) * np.array([3.0, 3.0, 24.0])
    e_ref, _, _ = _oracle(pts, 1.0)
    mesh = make_mesh(8)
    parts, _ = partition_by_slab(pts, 1.0, 8)
    positions = jax.device_put(
        jnp.asarray(parts), NamedSharding(mesh, P("z", None))
    )
    e, ok = sharded_lj_energy(mesh, cutoff=1.0, H=64, K=16, chunk=16)(
        positions
    )
    assert bool(ok)
    assert abs(float(e) - e_ref) < 1e-6 * abs(e_ref)


def test_md_step(cloud):
    from zelll_tpu.models.lj_md import MDState, md_step

    st = MDState(positions=jnp.asarray(cloud),
                 velocities=jnp.zeros((len(cloud), 3)))
    st2, ok = md_step(st, 1.0, 1e-4, M=1024, L=512, interpret=True)
    assert bool(ok)
    _, f_ref, _ = _oracle(cloud, 1.0)
    # md_step keeps state in sorted (cell-key) order; reconstruct each
    # row's original position (x2 = x + dt*v2 with v starting at 0) and
    # match rows by nearest original point
    orig = np.asarray(st2.positions) - 1e-4 * np.asarray(st2.velocities)
    d = ((orig[:, None, :] - cloud[None, :, :]) ** 2).sum(-1)
    match = d.argmin(axis=1)
    assert len(set(match.tolist())) == len(cloud)  # bijective
    assert d[np.arange(len(cloud)), match].max() < 1e-16
    np.testing.assert_allclose(
        np.asarray(st2.velocities) / 1e-4, f_ref[match],
        rtol=1e-5, atol=1e-6,
    )
