"""Windowed join kernel (`ops.join` with MAXJ): particle arrays beyond
the VMEM-residency ceiling, equality vs the resident kernel and numpy
brute force, and the capacity-flag retry ladder."""

import numpy as np
import pytest

import jax.numpy as jnp

from zelll_tpu.core.grid import build
from zelll_tpu.ops.join import (
    JOIN_MAX_PARTICLES,
    count_neighbors,
    grid_join_reduce,
    grid_join_reduce_auto,
    join_reduce,
    nearest_dsq,
)


def _cloud(n, box, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (n, 3)) * np.asarray(box)


def _count_term(dsq, d, payload, within):
    return [within.astype(dsq.dtype)]


def _wsum_term(dsq, d, payload, within):
    (w,) = payload
    return [jnp.where(within, w * dsq, jnp.zeros_like(dsq))]


def test_windowed_matches_resident_and_bruteforce():
    """MAXJ-windowed kernel == resident kernel == brute force, including
    a payload-weighted sum term."""
    box, cutoff = (12.0, 12.0, 12.0), 1.4
    pos = _cloud(3000, box, 10)
    queries = np.concatenate([
        _cloud(300, box, 11),
        pos[:4],  # coincident
    ])
    w = np.random.default_rng(12).uniform(0.5, 2.0, 3000)
    grid = build(jnp.asarray(pos), cutoff)
    wp = jnp.asarray(w)[grid.bins.perm]

    res, valid_r, ok_r = grid_join_reduce(
        grid, jnp.asarray(queries), term=_wsum_term, n_out=1,
        payload=(wp,), interpret=True,
    )
    # box-scattered queries make sorted chunks span a wide key range, so
    # ladder the window capacity like production callers do
    MAXJ, ok_w = 2, False
    while not ok_w:
        win, valid_w, ok_w = grid_join_reduce(
            grid, jnp.asarray(queries), term=_wsum_term, n_out=1,
            payload=(wp,), MAXJ=MAXJ, interpret=True,
        )
        ok_w, MAXJ = bool(ok_w), MAXJ * 2
        assert MAXJ <= 64, "ladder failed to converge"
    assert bool(ok_r)
    np.testing.assert_array_equal(np.asarray(valid_r), np.asarray(valid_w))
    np.testing.assert_allclose(np.asarray(win), np.asarray(res), rtol=1e-12)

    dsq = ((queries[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    m = dsq <= cutoff**2
    ref = (np.where(m, dsq, 0.0) * w[None, :]).sum(1)
    v = np.asarray(valid_w)
    np.testing.assert_allclose(np.asarray(win)[v, 0], ref[v], rtol=1e-9)


def test_windowed_min_reducer():
    pos = _cloud(2500, (9.0, 9.0, 9.0), 20)
    queries = _cloud(140, (9.0, 9.0, 9.0), 21)
    cutoff = 1.1
    grid = build(jnp.asarray(pos), cutoff)

    nd_r, _, ok_r = nearest_dsq(grid, jnp.asarray(queries), interpret=True)
    MAXJ, ok_w = 2, False
    while not ok_w:
        nd_w, _, ok_w = grid_join_reduce(
            grid, jnp.asarray(queries),
            term=lambda dsq, d, p, within: [
                jnp.where(within, dsq, jnp.full_like(dsq, np.inf))
            ],
            n_out=1, reducer="min", MAXJ=MAXJ, interpret=True,
        )
        ok_w, MAXJ = bool(ok_w), MAXJ * 2
        assert MAXJ <= 64, "ladder failed to converge"
    assert bool(ok_r)
    np.testing.assert_allclose(
        np.asarray(nd_w)[:, 0], np.asarray(nd_r), rtol=1e-12
    )


def test_windowed_capacity_flag_never_drops():
    """An undersized window flips the coverage flag; doubling converges to
    the exact result (the capacity-class ladder contract)."""
    # dense cluster: one cell holds ~all particles, so its band windows
    # span many 128-slot chunks and MAXJ=1 must under-cover
    pos = _cloud(2000, (0.9, 0.9, 0.9), 30)
    queries = _cloud(64, (0.9, 0.9, 0.9), 31)
    cutoff = 1.0
    grid = build(jnp.asarray(pos), cutoff)

    out1, _, ok1 = grid_join_reduce(
        grid, jnp.asarray(queries), term=_count_term, n_out=1,
        MAXJ=1, interpret=True,
    )
    assert not bool(ok1), "undersized window must flag, not drop pairs"

    MAXJ, ok = 1, False
    while not ok:
        MAXJ *= 2
        out, valid, okx = grid_join_reduce(
            grid, jnp.asarray(queries), term=_count_term, n_out=1,
            MAXJ=MAXJ, interpret=True,
        )
        ok = bool(okx)
        assert MAXJ <= 64, "ladder failed to converge"
    dsq = ((queries[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    ref = (dsq <= cutoff**2).sum(1)
    v = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(out)[v, 0], ref[v])


def test_resident_kernel_rejects_above_ceiling():
    n = JOIN_MAX_PARTICLES + 1
    planes = tuple(jnp.zeros((n,)) for _ in range(3))
    keys = jnp.zeros((n,), jnp.int32)
    with pytest.raises(ValueError, match="MAXJ"):
        join_reduce(
            (jnp.zeros((4,)),) * 3, jnp.zeros((4,), jnp.int32),
            planes, keys, jnp.asarray([1, 7, 49], jnp.int32), 1.0,
            term=_count_term, n_out=1, interpret=True,
        )


def test_auto_large_grid_localized_queries():
    """Above the residency ceiling, the auto wrapper runs the windowed
    kernel; localized query batches (the eval-grid shape) stay exact."""
    n = JOIN_MAX_PARTICLES + 8000
    # ~10 particles per cell with unit cutoff
    side = (n / 10.0) ** (1 / 3)
    pos = _cloud(n, (side, side, side), 40)
    cutoff = 1.0
    # key-LOCAL query batch: windows live in key space, so the chunk's
    # key span (not its spatial extent) sets the window width — a slab
    # along x (the minor stride) keeps it a few keys, like the sorted
    # chunks of a dense eval grid; crossing even one z-cell boundary
    # would already add ~stride_z keys (see grid_join_reduce_auto).
    # Cell boundaries sit at origin + k*cutoff with origin ~ 0, so y/z in
    # [7.05, 7.85] stays strictly inside one cell layer.
    rng = np.random.default_rng(41)
    queries = np.asarray([7.2, 7.05, 7.05]) + rng.uniform(
        0, 1.0, (100, 3)
    ) * np.asarray([6.0, 0.8, 0.8])
    grid = build(jnp.asarray(pos), cutoff)
    assert int(grid.n) > JOIN_MAX_PARTICLES

    out, valid, ok = grid_join_reduce_auto(
        grid, jnp.asarray(queries), term=_count_term, n_out=1,
        maxj0=1, interpret=True,
    )
    assert bool(ok)
    dsq = ((queries[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    ref = (dsq <= cutoff**2).sum(1)
    v = np.asarray(valid)
    assert v.all()
    np.testing.assert_array_equal(np.asarray(out)[v, 0], ref[v])

    # the stock wrappers route through the same auto path
    c, valid_c, ok_c = count_neighbors(grid, jnp.asarray(queries),
                                       interpret=True)
    assert bool(ok_c)
    np.testing.assert_array_equal(np.asarray(c), ref)


def test_sdf_windowed_large_structure():
    """SmoothDistanceField above the residency ceiling: the windowed join
    matches the XLA gather path (values AND analytic gradients)."""
    from zelll_tpu.models.sdf import SmoothDistanceField

    n = JOIN_MAX_PARTICLES + 4000
    side = (n / 10.0) ** (1 / 3)
    pos = _cloud(n, (side, side, side), 50)
    radii = np.random.default_rng(51).uniform(1.1, 1.9, n)
    rng = np.random.default_rng(52)
    # key-local batch (x-slab strictly inside one y/z cell layer of the
    # cutoff-2 grid; see test_auto_large_grid_localized_queries)
    queries = np.asarray([9.0, 10.1, 10.1]) + rng.uniform(
        0, 1.0, (40, 3)
    ) * np.asarray([5.0, 1.6, 1.6])

    f_join = SmoothDistanceField(pos, radii, cutoff=2.0, method="join")
    f_xla = SmoothDistanceField(pos, radii, cutoff=2.0, method="xla")
    vj, gj, validj = f_join.evaluate(queries)
    vx, gx, validx = f_xla.evaluate(queries)
    np.testing.assert_array_equal(validj, validx)
    np.testing.assert_allclose(vj[validj], vx[validx], rtol=1e-9)
    np.testing.assert_allclose(gj[validj], gx[validx], rtol=1e-7, atol=1e-12)

    with pytest.raises(ValueError, match="VMEM-resident"):
        f_join.hmc_vgrad_fn()


def test_sdf_sharded_large_structure():
    """Query-sharded evaluate over the 8-device mesh with a structure
    above the residency ceiling (per-device windowed kernel + ladder)."""
    from zelll_tpu.models.sdf import SmoothDistanceField

    n = JOIN_MAX_PARTICLES + 2000
    side = (n / 10.0) ** (1 / 3)
    pos = _cloud(n, (side, side, side), 60)
    radii = np.random.default_rng(61).uniform(1.1, 1.9, n)
    rng = np.random.default_rng(62)
    # key-local x-slab; 60 queries = 8 devices x 7 + 4 exercises padding
    queries = np.asarray([9.0, 10.1, 10.1]) + rng.uniform(
        0, 1.0, (60, 3)
    ) * np.asarray([5.0, 1.6, 1.6])

    f = SmoothDistanceField(pos, radii, cutoff=2.0, method="join")
    v1, g1, ok1 = f.evaluate(queries)
    vs, gs, oks = f.evaluate_sharded(queries)
    np.testing.assert_array_equal(ok1, oks)
    defined = ok1 & ~np.isnan(v1)
    assert defined.any()
    np.testing.assert_allclose(vs[defined], v1[defined], rtol=1e-12)
    np.testing.assert_allclose(
        gs[defined], g1[defined], rtol=1e-12, atol=1e-15
    )
