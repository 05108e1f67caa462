"""Multi-chip PBC (parallel.pbc) on the 8-device virtual CPU mesh vs the
single-device ops.pbc path and a minimum-image numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.parallel import make_mesh
from zelll_tpu.parallel.pbc import (
    partition_by_slab_pbc,
    sharded_pbc_lj_energy,
    sharded_pbc_md_step,
)

ND = 8


def make_case(n=512, box=(4.1, 4.7, 30.0), cutoff=1.0, seed=0):
    """Periodic box elongated along z so slabs are meaningful; every
    axis > 2*cutoff."""
    rng = np.random.default_rng(seed)
    box = np.asarray(box, np.float64)
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    return pts, np.zeros(3), box, cutoff


def oracle_energy(pts, box, cutoff):
    d = pts[:, None, :] - pts[None, :, :]
    d -= box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = dsq < cutoff * cutoff
    t = np.where(within, 1.0 / np.where(within, dsq, 1.0), 0.0) ** 3
    return float(np.where(within, 4 * t * (t - 1), 0.0).sum() / 2)


@pytest.mark.parametrize("seed,n", [(0, 512), (1, 300)])
def test_sharded_pbc_energy_matches_oracle(seed, n):
    pts, origin, box, c = make_case(n=n, seed=seed)
    e_ref = oracle_energy(pts, box, c)

    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("z", None)),
    )
    efn = sharded_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, M=512, L=512,
        interpret=True,
    )
    e, ok = efn(pos)
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 1e-9 * abs(e_ref)


def test_sharded_pbc_energy_matches_single_device():
    from zelll_tpu.ops.pbc import pbc_lj_energy

    pts, origin, box, c = make_case(n=400, seed=2)
    e1, ok1 = pbc_lj_energy(
        jnp.asarray(pts), jnp.asarray(origin), jnp.asarray(box), c,
        M=512, L=512, interpret=True,
    )
    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("z", None)),
    )
    efn = sharded_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, M=512, L=512,
        interpret=True,
    )
    e8, ok8 = efn(pos)
    assert bool(ok1) and bool(ok8)
    assert abs(float(e8) - float(e1)) <= 1e-9 * abs(float(e1))


def test_sharded_pbc_md_matches_single_device():
    """Three sharded MD steps reproduce the single-device PBC MD
    trajectory (positions compared as lexicographically sorted sets —
    the sharded state lives in block-sorted order)."""
    from zelll_tpu.ops.pbc import md_step_pbc

    # jittered lattice: random-uniform LJ configurations explode (huge
    # overlap forces send particles beyond the wrap window within a few
    # steps); MD trajectories must be physical to compare
    rng = np.random.default_rng(3)
    spacing = 1.3
    grid = np.stack(np.meshgrid(
        np.arange(3), np.arange(3), np.arange(22), indexing="ij"
    ), -1).reshape(-1, 3).astype(np.float64)
    pts = grid * spacing + 0.5 * spacing
    pts += rng.uniform(-0.05, 0.05, size=pts.shape)
    box = np.asarray([3 * spacing, 3 * spacing, 22 * spacing])
    origin, c = np.zeros(3), 1.0
    dt = 1e-4
    vel0 = rng.normal(0, 0.05, size=pts.shape)

    # single-device trajectory (input order)
    p1, v1 = jnp.asarray(pts), jnp.asarray(vel0)
    o, bj = jnp.asarray(origin), jnp.asarray(box)
    for _ in range(3):
        p1, v1, ok = md_step_pbc(p1, v1, o, bj, c, dt, M=512, L=512,
                                 interpret=True)
        assert bool(ok)

    # sharded trajectory: velocities must follow the same partition
    # permutation as positions — recover it by matching sorted keys
    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    # partition_by_slab_pbc sorts by extended-grid keys; rebuild the
    # permutation host-side to place velocities
    perm = []
    used = set()
    for row in np.asarray(parts)[: len(pts)]:
        candidates = np.where(np.all(np.isclose(pts, row[None]), axis=1))[0]
        pick = next(i for i in candidates if i not in used)
        used.add(pick)
        perm.append(pick)
    perm = np.asarray(perm)
    vparts = np.zeros_like(parts)
    vparts[: len(pts)] = vel0[perm]

    shard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("z", None)
    )
    pos = jax.device_put(jnp.asarray(parts), shard)
    vel = jax.device_put(jnp.asarray(vparts), shard)
    step = sharded_pbc_md_step(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, dt=dt,
        M=512, L=512, interpret=True,
    )
    for _ in range(3):
        pos, vel, ok = step(pos, vel)
        assert bool(ok)

    # compare as sets: drop pad rows (outside the box), sort rows
    ref = np.asarray(p1)
    got = np.asarray(pos)
    got = got[np.all((got >= 0) & (got < np.asarray(box)), axis=1)]
    assert got.shape == ref.shape
    ref_s = ref[np.lexsort(ref.T)]
    got_s = got[np.lexsort(got.T)]
    np.testing.assert_allclose(got_s, ref_s, rtol=1e-9, atol=1e-9)


def test_sharded_pbc_capacity_flag():
    pts, origin, box, c = make_case(n=256, seed=5)
    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("z", None)),
    )
    # H=1: boundary layers cannot fit in the halo -> flag must trip
    efn = sharded_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=c, H=1, M=512, L=512,
        interpret=True,
    )
    _, ok = efn(pos)
    assert not bool(ok)


def test_repartition_pbc_restores_slab_invariant():
    """Scrambled (drifted) blocks are restored to the static-grid global
    sort; the result matches a fresh host partition as a set, and the
    sharded PBC energy on it is flag-clean and exact."""
    from zelll_tpu.parallel.pbc import repartition_pbc

    pts, origin, box, c = make_case(n=512, seed=6)
    e_ref = oracle_energy(pts, box, c)
    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    shard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("z", None)
    )
    # scramble: roll across block boundaries + unwrap some rows by a box
    scr = np.roll(np.asarray(parts), 3 * n_local + 7, axis=0)
    scr[:50] += np.asarray(box)  # out-of-box drift the wrap must fix
    pos = jax.device_put(jnp.asarray(scr), shard)
    vel = jax.device_put(jnp.zeros_like(pos), shard)

    rp = repartition_pbc(mesh, origin=origin, box=box, cutoff=c)
    pos2, vel2 = rp(pos, vel)

    got = np.asarray(pos2)
    want = np.asarray(parts)
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], want[np.lexsort(want.T)], atol=1e-9
    )

    efn = sharded_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, M=512, L=512,
        interpret=True,
    )
    e, ok = efn(pos2)
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 1e-9 * abs(e_ref)


def test_repartition_pbc_preserves_pads():
    """With n not divisible by the mesh, partitioner pads must survive a
    repartition un-wrapped (wrapping would resurrect them in the box)."""
    from zelll_tpu.parallel.pbc import repartition_pbc

    pts, origin, box, c = make_case(n=500, seed=7)  # 500 % 8 != 0
    e_ref = oracle_energy(pts, box, c)
    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    shard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("z", None)
    )
    scr = np.asarray(parts).copy()
    scr[:40] -= np.asarray(box)  # drift below the box
    pos = jax.device_put(jnp.asarray(scr), shard)
    vel = jax.device_put(jnp.zeros_like(pos), shard)

    rp = repartition_pbc(mesh, origin=origin, box=box, cutoff=c,
                         n_valid=len(pts))
    pos2, _ = rp(pos, vel)
    out = np.asarray(pos2)
    # pads (rows beyond the box) survive, count preserved
    out_of_box = np.any((out < 0) | (out >= np.asarray(box)), axis=1)
    assert out_of_box.sum() == len(parts) - len(pts)

    efn = sharded_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, M=512, L=512,
        interpret=True,
    )
    e, ok = efn(pos2)
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 1e-9 * abs(e_ref)


def test_sharded_pbc_md_run_matches_stepwise():
    """The one-dispatch scanned trajectory (`sharded_pbc_md_run`)
    reproduces K calls of `sharded_pbc_md_step` exactly, and its fused
    final energy matches `sharded_pbc_lj_energy` on the final state."""
    from zelll_tpu.parallel.pbc import sharded_pbc_md_run

    rng = np.random.default_rng(11)
    spacing = 1.3
    grid = np.stack(np.meshgrid(
        np.arange(3), np.arange(3), np.arange(22), indexing="ij"
    ), -1).reshape(-1, 3).astype(np.float64)
    pts = grid * spacing + 0.5 * spacing
    pts += rng.uniform(-0.05, 0.05, size=pts.shape)
    box = np.asarray([3 * spacing, 3 * spacing, 22 * spacing])
    origin, c, dt, steps = np.zeros(3), 1.0, 1e-4, 4
    vel0 = rng.normal(0, 0.05, size=pts.shape)

    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    # velocities follow the partition permutation (see md test above)
    perm, used = [], set()
    for row in np.asarray(parts)[: len(pts)]:
        cand = np.where(np.all(np.isclose(pts, row[None]), axis=1))[0]
        pick = next(i for i in cand if i not in used)
        used.add(pick)
        perm.append(pick)
    vparts = np.zeros_like(parts)
    vparts[: len(pts)] = vel0[np.asarray(perm)]

    shard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("z", None)
    )
    pos = jax.device_put(jnp.asarray(parts), shard)
    vel = jax.device_put(jnp.asarray(vparts), shard)

    step = sharded_pbc_md_step(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, dt=dt,
        M=512, L=512, interpret=True,
    )
    p_ref, v_ref = pos, vel
    for _ in range(steps):
        p_ref, v_ref, ok = step(p_ref, v_ref)
        assert bool(ok)
    efn = sharded_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, M=512, L=512,
        interpret=True,
    )
    e_ref, oke = efn(p_ref)
    assert bool(oke)

    run = sharded_pbc_md_run(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, steps=steps,
        dt=dt, M=512, L=512, interpret=True,
    )
    p, v, ok, e = run(pos, vel)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-12, atol=1e-12)
    assert abs(float(e) - float(e_ref)) <= 1e-9 * max(1.0, abs(float(e_ref)))


def test_sharded_pbc_energy_tile_matches_oracle():
    """use_tile=True (segment-tile kernel + ownership payload plane)
    reproduces the minimum-image oracle and the lag-path energy exactly,
    including with partitioner pads in play (n % ND != 0)."""
    pts, origin, box, c = make_case(n=500, seed=9)
    e_ref = oracle_energy(pts, box, c)
    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("z", None)),
    )
    e_lag, ok1 = sharded_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, M=512, L=512,
        interpret=True,
    )(pos)
    e_tile, ok2 = sharded_pbc_lj_energy(
        mesh, origin=origin, box=box, cutoff=c, H=n_local, use_tile=True,
        MAXJ=16, interpret=True,
    )(pos)
    assert bool(ok1) and bool(ok2)
    assert abs(float(e_tile) - e_ref) <= 1e-9 * abs(e_ref)
    assert abs(float(e_tile) - float(e_lag)) <= 1e-12 * abs(float(e_lag))


def test_sharded_pbc_md_tile_matches_lag():
    """The tile-backend sharded PBC MD step follows the lag-backend
    trajectory exactly (same halos, same ownership; only the pair kernel
    differs), and the scanned run agrees too."""
    from zelll_tpu.parallel.pbc import sharded_pbc_md_run

    rng = np.random.default_rng(13)
    spacing = 1.3
    grid = np.stack(np.meshgrid(
        np.arange(3), np.arange(3), np.arange(22), indexing="ij"
    ), -1).reshape(-1, 3).astype(np.float64)
    pts = grid * spacing + 0.5 * spacing
    pts += rng.uniform(-0.05, 0.05, size=pts.shape)
    box = np.asarray([3 * spacing, 3 * spacing, 22 * spacing])
    origin, c, dt, steps = np.zeros(3), 1.0, 1e-4, 3
    vel0 = rng.normal(0, 0.05, size=pts.shape)

    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    perm, used = [], set()
    for row in np.asarray(parts)[: len(pts)]:
        cand = np.where(np.all(np.isclose(pts, row[None]), axis=1))[0]
        pick = next(i for i in cand if i not in used)
        used.add(pick)
        perm.append(pick)
    vparts = np.zeros_like(parts)
    vparts[: len(pts)] = vel0[np.asarray(perm)]
    shard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("z", None)
    )
    pos0 = jax.device_put(jnp.asarray(parts), shard)
    vel0j = jax.device_put(jnp.asarray(vparts), shard)

    kw = dict(origin=origin, box=box, cutoff=c, H=n_local, dt=dt,
              interpret=True)
    step_lag = sharded_pbc_md_step(mesh, M=512, L=512, **kw)
    step_tile = sharded_pbc_md_step(mesh, use_tile=True, MAXJ=16, **kw)
    pl_, vl_ = pos0, vel0j
    pt_, vt_ = pos0, vel0j
    for _ in range(steps):
        pl_, vl_, ok1 = step_lag(pl_, vl_)
        pt_, vt_, ok2 = step_tile(pt_, vt_)
        assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(np.asarray(pt_), np.asarray(pl_),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vt_), np.asarray(vl_),
                               rtol=1e-12, atol=1e-12)

    run = sharded_pbc_md_run(
        mesh, steps=steps, use_tile=True, MAXJ=16, M=512, L=512, **kw
    )
    pr, vr, okr, er = run(pos0, vel0j)
    assert bool(okr)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pt_),
                               rtol=1e-12, atol=1e-12)
    assert np.isfinite(float(er))


def test_repartition_exchange_pbc_matches_allgather():
    """The distributed (ppermute) PBC repartition is bit-identical to the
    all_gather `repartition_pbc` for adjacent-slab drift (the flagged
    contract), including wrap of out-drifted rows and pad preservation."""
    from zelll_tpu.parallel.pbc import repartition_exchange_pbc, \
        repartition_pbc

    pts, origin, box, c = make_case(n=500, seed=15)  # 500 % 8 != 0: pads
    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    shard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("z", None)
    )
    rng = np.random.default_rng(16)
    scr = np.asarray(parts).copy()
    # adjacent-slab drift: nudge along the major axis by up to ~1 cell
    scr[: len(pts)] += rng.uniform(-0.5, 0.5, size=(len(pts), 3)) * c
    # a few rows drift just past the low periodic face (< cutoff beyond,
    # per the halo/wrap contract) — must wrap, unlike the pads
    scr[:10, 2] = -0.3 * c
    vel = rng.normal(size=scr.shape)

    pos_j = jax.device_put(jnp.asarray(scr), shard)
    vel_j = jax.device_put(jnp.asarray(vel), shard)

    p_ref, v_ref = repartition_pbc(
        mesh, origin=origin, box=box, cutoff=c, n_valid=len(pts)
    )(pos_j, vel_j)
    p_ex, v_ex, ok = repartition_exchange_pbc(
        mesh, origin=origin, box=box, cutoff=c
    )(pos_j, vel_j)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(p_ex), np.asarray(p_ref))
    np.testing.assert_array_equal(np.asarray(v_ex), np.asarray(v_ref))


def test_repartition_exchange_pbc_capacity_flag():
    """Out-drifting more than one slab trips the flag (never silent)."""
    from zelll_tpu.parallel.pbc import repartition_exchange_pbc

    pts, origin, box, c = make_case(n=512, seed=17)
    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    shard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("z", None)
    )
    scr = np.asarray(parts).copy()
    # teleport one first-slab row to the box middle: non-adjacent both
    # linearly AND on the periodic ring (a far-end move would be a legal
    # ring-adjacent wrap)
    scr[0, 2] = 0.5 * box[2]
    pos_j = jax.device_put(jnp.asarray(scr), shard)
    vel_j = jax.device_put(jnp.zeros_like(pos_j), shard)
    _, _, ok = repartition_exchange_pbc(
        mesh, origin=origin, box=box, cutoff=c
    )(pos_j, vel_j)
    assert not bool(ok)


# -- in-kernel minimum image across the mesh (round 9 completion) ------------


def test_sharded_pbc_minimage_energy():
    """Sharded min-image: narrow minor axes folded in-kernel per device
    (no ghost images), slab/ring axis keeps its halo machinery. Energy
    == oracle == non-mi sharded path."""
    pts, origin, box, c = make_case(n=512, box=(2.5, 2.5, 30.0), seed=10)
    e_ref = oracle_energy(pts, box, c)

    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("z", None)),
    )
    kw = dict(mesh=mesh, origin=origin, box=box, cutoff=c, H=n_local,
              M=512, L=512, interpret=True)
    e_mi, ok_mi = sharded_pbc_lj_energy(minimage="auto", **kw)(pos)
    assert bool(ok_mi)
    assert abs(float(e_mi) - e_ref) <= 1e-9 * abs(e_ref)
    e_g, ok_g = sharded_pbc_lj_energy(**kw)(pos)
    assert bool(ok_g)
    assert abs(float(e_mi) - float(e_g)) <= 1e-9 * abs(float(e_g))


def test_sharded_pbc_minimage_md_matches_ghost():
    """Sharded mi MD trajectory == sharded ghost-path trajectory (same
    physical forces, 1e-9; jittered lattice so the dynamics stay sane)."""
    rng = np.random.default_rng(11)
    k = 8
    box = np.array([2.6, 2.6, 20.8])
    cells = np.stack(np.meshgrid(np.arange(2), np.arange(2),
                                 np.arange(16), indexing="ij"), -1)
    pts = (cells.reshape(-1, 3) + 0.5) * (box / [2, 2, 16])
    pts += rng.uniform(-0.05, 0.05, pts.shape)
    c, dt = 1.0, 1e-4
    origin = np.zeros(3)

    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("z", None)),
    )
    vel = jnp.zeros_like(pos)
    kw = dict(mesh=mesh, origin=origin, box=box, cutoff=c, H=n_local,
              dt=dt, M=512, L=512, interpret=True)
    step_mi = sharded_pbc_md_step(minimage="auto", **kw)
    step_g = sharded_pbc_md_step(**kw)
    p1, v1, p2, v2 = pos, vel, pos, vel
    for _ in range(3):
        p1, v1, ok1 = step_mi(p1, v1)
        p2, v2, ok2 = step_g(p2, v2)
        assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-9, atol=1e-9)


def test_sharded_pbc_minimage_md_run():
    """Whole-trajectory scan entry point composes with minimage."""
    from zelll_tpu.parallel.pbc import sharded_pbc_md_run

    rng = np.random.default_rng(12)
    box = np.array([2.6, 2.6, 20.8])
    cells = np.stack(np.meshgrid(np.arange(2), np.arange(2),
                                 np.arange(16), indexing="ij"), -1)
    pts = (cells.reshape(-1, 3) + 0.5) * (box / [2, 2, 16])
    pts += rng.uniform(-0.05, 0.05, pts.shape)
    c, dt = 1.0, 1e-4
    origin = np.zeros(3)
    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("z", None)),
    )
    vel = jnp.zeros_like(pos)
    kw = dict(mesh=mesh, origin=origin, box=box, cutoff=c, H=n_local,
              dt=dt, M=512, L=512, interpret=True, steps=3)
    p_mi, v_mi, ok_mi, e_mi = sharded_pbc_md_run(minimage="auto", **kw)(
        pos, vel)
    p_g, v_g, ok_g, e_g = sharded_pbc_md_run(**kw)(pos, vel)
    assert bool(ok_mi) and bool(ok_g)
    np.testing.assert_allclose(np.asarray(p_mi), np.asarray(p_g),
                               rtol=1e-9, atol=1e-9)
    assert abs(float(e_mi) - float(e_g)) <= 1e-9 * abs(float(e_g))


def test_sharded_pbc_minimage_guards():
    box, c = (2.5, 2.5, 30.0), 1.0
    mesh = make_mesh(ND)
    with pytest.raises(ValueError, match="use_tile"):
        sharded_pbc_lj_energy(mesh, origin=np.zeros(3), box=box, cutoff=c,
                              H=8, minimage="auto", use_tile=True)
    with pytest.raises(ValueError, match="slab/ring"):
        sharded_pbc_lj_energy(mesh, origin=np.zeros(3), box=box, cutoff=c,
                              H=8, minimage=(False, False, True))


def oracle_stress_pbc(pts, box, cutoff):
    d = pts[:, None, :] - pts[None, :, :]
    d -= box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = np.triu(dsq < cutoff * cutoff)
    t = 1.0 / np.where(within, dsq, 1.0)
    t3 = t * t * t
    g = np.where(within, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    return np.einsum("ij,ija,ijb->ab", g, d, d)


@pytest.mark.parametrize("case,mi", [
    (dict(n=512, box=(4.1, 4.7, 30.0), seed=20), False),
    (dict(n=512, box=(2.5, 2.5, 30.0), seed=21), "auto"),
])
def test_sharded_pbc_stress_matches_oracle(case, mi):
    """Distributed PBC stress: the 0.5(o_i+o_j) ownership weight applied
    MULTIPLICATIVELY inside the stress kernel makes the psum of
    per-device tensors exactly the minimum-image global stress; minimage
    composes (folded separations feed d (x) d)."""
    from zelll_tpu.parallel import sharded_pbc_stress

    pts, origin, box, c = make_case(**case)
    sig_ref = oracle_stress_pbc(pts, box, c)

    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("z", None)),
    )
    sfn = sharded_pbc_stress(mesh, origin=origin, box=box, cutoff=c,
                             H=n_local, M=512, L=512, interpret=True,
                             minimage=mi)
    sig, ok = sfn(pos)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sig), sig_ref, rtol=1e-9,
                               atol=1e-9 * np.abs(sig_ref).max())


def test_sharded_pbc_stress_tile_matches_oracle():
    """Round 13: the tile stress kernel's multiplicative pair_weight
    lets cubic/wide periodic boxes take the segment-tile path in
    `sharded_pbc_stress` — same oracle, use_tile=True."""
    from zelll_tpu.parallel import sharded_pbc_stress

    pts, origin, box, c = make_case(n=512, box=(4.1, 4.7, 30.0), seed=20)
    sig_ref = oracle_stress_pbc(pts, box, c)

    mesh = make_mesh(ND)
    parts, n_local = partition_by_slab_pbc(pts, origin, box, c, ND)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("z", None)),
    )
    sfn = sharded_pbc_stress(mesh, origin=origin, box=box, cutoff=c,
                             H=n_local, use_tile=True, MAXJ=16,
                             interpret=True)
    sig, ok = sfn(pos)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sig), sig_ref, rtol=1e-9,
                               atol=1e-9 * np.abs(sig_ref).max())
