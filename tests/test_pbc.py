"""Periodic boundary conditions (ops.pbc) vs a minimum-image brute-force
oracle. An extension beyond the reference (zelll is free-boundary only,
more_benches/in.zelllbench.txt pins ``boundary f f f``); correctness is
defined by the standard orthorhombic minimum-image convention, valid
because the module enforces box > 2*cutoff."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.ops.pbc import (
    pbc_count_pairs,
    pbc_extend,
    pbc_lj_energy,
    pbc_lj_forces,
    suggest_pbc_capacity,
    wrap_positions,
)


def lj(dsq):
    t = 1.0 / dsq
    t3 = t * t * t
    return 4.0 * t3 * (t3 - 1.0)


def oracle(pts, box, cutoff):
    """Minimum-image energy, count, and forces (f64 numpy, O(n^2))."""
    pts = np.asarray(pts, np.float64)
    box = np.asarray(box, np.float64)
    d = pts[:, None, :] - pts[None, :, :]
    d -= box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = dsq < cutoff * cutoff
    e = lj(np.where(within, dsq, 1.0))
    energy = 0.5 * np.sum(np.where(within, e, 0.0))
    count = int(np.sum(within)) // 2
    # f_i = sum_j g(dsq) * d_ij, g = 24 t3 (2 t3 - 1) / dsq
    t = 1.0 / np.where(within, dsq, 1.0)
    t3 = t * t * t
    g = np.where(within, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    forces = (g[:, :, None] * d).sum(axis=1)
    return energy, count, forces


def make_case(n=256, box=(4.3, 5.1, 6.7), cutoff=1.0, seed=0, origin=0.0):
    rng = np.random.default_rng(seed)
    box = np.asarray(box, np.float64)
    pts = rng.uniform(0, 1, size=(n, 3)) * box + origin
    return jnp.asarray(pts), jnp.full((3,), origin), jnp.asarray(box), cutoff


@pytest.mark.parametrize("seed,box,cutoff", [
    (0, (4.3, 5.1, 6.7), 1.0),
    (1, (3.0, 3.0, 3.0), 1.2),          # dense cubic, many corner ghosts
    (2, (2.5, 2.5, 40.0), 1.0),          # thin periodic slab
])
def test_pbc_energy_count_vs_oracle(seed, box, cutoff):
    pts, origin, boxj, c = make_case(seed=seed, box=box, cutoff=cutoff)
    e_ref, n_ref, _ = oracle(pts, box, c)

    e, ok = pbc_lj_energy(
        pts, origin, boxj, c, M=512, L=512, interpret=True
    )
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 1e-9 * max(1.0, abs(e_ref))

    cnt, ok = pbc_count_pairs(
        pts, origin, boxj, c, M=512, L=512, interpret=True
    )
    assert bool(ok)
    assert cnt == n_ref


def test_pbc_forces_vs_oracle():
    pts, origin, box, c = make_case(seed=3)
    _, _, f_ref = oracle(pts, box, c)
    f, ok = pbc_lj_forces(pts, origin, box, c, M=512, L=512, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-9, atol=1e-9)


def test_pbc_wrap_invariance():
    """Shifting particles by whole box vectors changes nothing."""
    pts, origin, box, c = make_case(seed=4)
    e0, ok0 = pbc_lj_energy(pts, origin, box, c, M=512, L=512, interpret=True)
    shift = jnp.asarray([[1.0, -2.0, 1.0]]) * box
    e1, ok1 = pbc_lj_energy(
        pts + shift, origin, box, c, M=512, L=512, interpret=True
    )
    assert bool(ok0) and bool(ok1)
    assert abs(float(e0) - float(e1)) <= 1e-9 * abs(float(e0))


def test_pbc_interior_matches_open_boundary():
    """No particle near a face -> PBC energy == open-boundary energy."""
    from zelll_tpu.ops.fused import fused_lj_rebuild_energy

    rng = np.random.default_rng(5)
    box = np.asarray([6.0, 6.0, 6.0])
    c = 1.0
    # keep everything >= cutoff away from every face
    pts = jnp.asarray(c + rng.uniform(0, 1, size=(128, 3)) * (box - 2 * c))
    e_open, ok_o = fused_lj_rebuild_energy(pts, c, M=512, L=512, interpret=True)
    e_pbc, ok_p = pbc_lj_energy(
        pts, jnp.zeros(3), jnp.asarray(box), c, M=512, L=512, interpret=True
    )
    assert bool(ok_o) and bool(ok_p)
    assert abs(float(e_open) - float(e_pbc)) <= 1e-9 * abs(float(e_open))


def test_pbc_capacity_flags():
    pts, origin, box, c = make_case(seed=6)
    # B too small for the boundary population
    _, ok = pbc_lj_energy(
        pts, origin, box, c, B=8, G=64, M=512, L=512, interpret=True
    )
    assert not bool(ok)
    # box <= 2*cutoff is outside the minimum-image regime
    _, ok = pbc_lj_energy(
        pts, origin, box, jnp.asarray(3.0), M=512, L=512, interpret=True
    )
    assert not bool(ok)


def test_pbc_corner_particle_seven_images():
    """A particle in a box corner needs all 7 images; a lone pair across
    the corner has closed-form energy."""
    box = jnp.asarray([5.0, 6.0, 7.0])
    c = 1.0
    eps = 0.05
    # p0 tucked in the low corner, p1 in the high corner: min-image
    # separation (2*eps, 2*eps, 2*eps)
    pts = jnp.asarray([
        [eps, eps, eps],
        [5.0 - eps, 6.0 - eps, 7.0 - eps],
        [2.5, 3.0, 3.5],  # interior spectator
    ])
    dsq = 3 * (2 * eps) ** 2
    e_ref = float(lj(dsq))
    e, ok = pbc_lj_energy(
        pts, jnp.zeros(3), box, c, B=128, G=896, M=512, L=512, interpret=True
    )
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 1e-9 * abs(e_ref)
    cnt, ok = pbc_count_pairs(
        pts, jnp.zeros(3), box, c, B=128, G=896, M=512, L=512, interpret=True
    )
    assert bool(ok) and cnt == 1


def test_pbc_split_extension_exact():
    """Ghost (hi, lo) planes reconstruct the exact f64 image positions."""
    from zelll_tpu.ops.pallas_pairs import split_f64

    rng = np.random.default_rng(7)
    box64 = np.float32([10000.0, 10000.0, 10000.0]).astype(np.float64)
    pts64 = rng.uniform(0, 1, size=(64, 3)) * box64
    hi, lo = split_f64(jnp.asarray(pts64))
    B, G = 64, 448
    ext, ext_lo, w, valid, ok = pbc_extend(
        hi, jnp.zeros(3, jnp.float32), jnp.asarray(box64, jnp.float32),
        jnp.float32(10.0), B=B, G=G, positions_lo=lo,
    )
    assert bool(ok)
    # true f64 images: for every valid ghost row, hi+lo must equal the
    # exact f64 parent + shift*box for some parent and admissible shift
    recon = np.asarray(ext, np.float64) + np.asarray(ext_lo, np.float64)
    n = pts64.shape[0]
    ghosts = recon[n:][np.asarray(valid)[n:]]
    exact = {tuple(np.round(r, 6)) for r in pts64}
    boxf = np.asarray(box64)
    for g in ghosts:
        # subtract the implied shift (sign of out-of-box coordinate)
        shift = np.where(g < 0, -1.0, np.where(g >= boxf, 1.0, 0.0))
        parent = g - shift * boxf
        assert tuple(np.round(parent, 6)) in exact, g


def test_wrap_positions_identity_and_wrap():
    pts = jnp.asarray([[0.0, 2.5, 4.999], [-0.5, 5.1, 10.0]])
    box = jnp.asarray([5.0, 5.0, 5.0])
    w = wrap_positions(pts, jnp.zeros(3), box)
    np.testing.assert_allclose(np.asarray(w[0]), [0.0, 2.5, 4.999])
    assert np.all(np.asarray(w[1]) >= 0) and np.all(np.asarray(w[1]) < 5.0)
    np.testing.assert_allclose(np.asarray(w[1]), [4.5, 0.1, 0.0], atol=1e-12)


def test_suggest_pbc_capacity_covers():
    pts, origin, box, c = make_case(seed=8, n=512)
    B, G = suggest_pbc_capacity(512, np.asarray(box), c)
    _, _, _, _, ok = pbc_extend(pts, origin, box, c, B=B, G=G)
    assert bool(ok)


def test_pbc_forces_tile_path():
    """Cubic-box PBC forces through the segment-tile kernel (full
    mirrored bands, i-side accumulation: ghost rows never receive
    reactions, so dropping them is trivially safe)."""
    pts, origin, box, c = make_case(seed=9, box=(4.0, 4.5, 5.0))
    _, _, f_ref = oracle(pts, box, c)
    f, ok = pbc_lj_forces(
        pts, origin, box, c, path="tile", MAXJ=12, interpret=True
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-9, atol=1e-9)


def test_md_step_pbc_matches_numpy():
    """A few MD steps under PBC track a numpy minimum-image integrator."""
    from zelll_tpu.ops.pbc import md_step_pbc

    rng = np.random.default_rng(10)
    box = np.asarray([5.0, 5.5, 6.0])
    n, c, dt = 128, 1.0, 1e-5
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    vel = rng.normal(0, 0.1, size=(n, 3))

    p_np, v_np = pts.copy(), vel.copy()
    for _ in range(3):
        _, _, f = oracle(p_np, box, c)
        v_np = v_np + dt * f
        p_np = np.mod(p_np + dt * v_np, box)

    p, v = jnp.asarray(pts), jnp.asarray(vel)
    o, bj = jnp.zeros(3), jnp.asarray(box)
    for _ in range(3):
        p, v, ok = md_step_pbc(p, v, o, bj, c, dt, M=512, L=512,
                               interpret=True)
        assert bool(ok)
    np.testing.assert_allclose(np.asarray(p), p_np, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v), v_np, rtol=1e-9, atol=1e-9)


def test_pbc_energy_count_tile_path():
    """PBC energy/count through the packed tile kernel: the shift-sign
    plane rides the packed blocks' free row (D+1)."""
    pts, origin, box, c = make_case(seed=11, box=(4.0, 4.5, 5.0))
    e_ref, n_ref, _ = oracle(pts, box, c)
    e, ok = pbc_lj_energy(
        pts, origin, box, c, path="tile", MAXJ=12, interpret=True
    )
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 1e-9 * abs(e_ref)
    cnt, ok = pbc_count_pairs(
        pts, origin, box, c, path="tile", MAXJ=12, interpret=True
    )
    assert bool(ok) and cnt == n_ref


def test_pbc_energy_tile_split_plane_roundtrip():
    """Split (hi, lo) planes + payload row coexist in the packed layout
    (6 coords + key + payload = exactly 8 rows)."""
    from zelll_tpu.ops.pallas_pairs import split_f64

    rng = np.random.default_rng(12)
    box = np.asarray([4.0, 4.5, 5.0])
    pts64 = rng.uniform(0, 1, size=(256, 3)) * box
    e_ref, _, _ = oracle(pts64, box, 1.0)
    hi, lo = split_f64(jnp.asarray(pts64))
    e, ok = pbc_lj_energy(
        hi.astype(jnp.float64), jnp.zeros(3), jnp.asarray(box), 1.0,
        path="tile", MAXJ=12, interpret=True,
        positions_lo=lo.astype(jnp.float64),
    )
    assert bool(ok)
    # hi+lo reconstructs pts64; f64 interpret arithmetic -> tight parity
    assert abs(float(e) - e_ref) <= 1e-6 * abs(e_ref)


def oracle2d(pts, box, cutoff):
    pts = np.asarray(pts, np.float64)
    box = np.asarray(box, np.float64)
    d = pts[:, None, :] - pts[None, :, :]
    d -= box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = dsq < cutoff * cutoff
    t = np.where(within, 1.0 / np.where(within, dsq, 1.0), 0.0) ** 3
    e = float(np.where(within, 4 * t * (t - 1), 0.0).sum() / 2)
    g = np.where(within, 24 * t * (2 * t - 1)
                 / np.where(within, dsq, 1.0), 0.0)
    return e, int(within.sum()) // 2, (g[..., None] * d).sum(axis=1)


def test_pbc_2d():
    """2D periodic boxes route to the XLA per-particle path (the
    reference is generic over N, lib.rs:132-135)."""
    rng = np.random.default_rng(13)
    box = np.asarray([5.0, 7.0])
    pts = rng.uniform(0, 1, size=(200, 2)) * box
    c = 1.0
    e_ref, n_ref, f_ref = oracle2d(pts, box, c)

    p, o, bj = jnp.asarray(pts), jnp.zeros(2), jnp.asarray(box)
    e, ok = pbc_lj_energy(p, o, bj, c, K=32)
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 1e-9 * abs(e_ref)
    f, ok = pbc_lj_forces(p, o, bj, c, K=32)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-9, atol=1e-9)


def test_pbc_xla_path_matches_lag_3d():
    pts, origin, box, c = make_case(seed=14)
    e_lag, ok1 = pbc_lj_energy(pts, origin, box, c, M=512, L=512,
                               interpret=True)
    e_xla, ok2 = pbc_lj_energy(pts, origin, box, c, path="xla", K=48)
    assert bool(ok1) and bool(ok2)
    assert abs(float(e_lag) - float(e_xla)) <= 1e-9 * abs(float(e_lag))


@pytest.mark.parametrize("steps,skin,vscale,want_rebuild", [
    (12, 0.4, 0.05, False),   # inside the skin window: zero rebuilds
    (40, 0.08, 0.2, True),    # drift exceeds skin/2: rebuild branch runs
])
def test_md_run_skin_pbc_matches_stepwise(steps, skin, vscale, want_rebuild):
    """The Verlet-skin PBC loop reproduces the rebuild-every-step PBC
    trajectory (compared as sorted position sets: the skin loop returns
    build-sorted order) and rebuilds exactly when drift demands it."""
    from zelll_tpu.models.lj_md import MDState, md_run_skin_pbc
    from zelll_tpu.ops.pbc import md_step_pbc, suggest_pbc_capacity

    rng = np.random.default_rng(15)
    spacing = 1.3
    grid = np.stack(np.meshgrid(
        np.arange(3), np.arange(4), np.arange(5), indexing="ij"
    ), -1).reshape(-1, 3).astype(np.float64)
    pts = grid * spacing + 0.5 * spacing
    pts += rng.uniform(-0.05, 0.05, size=pts.shape)
    box = np.asarray([3 * spacing, 4 * spacing, 5 * spacing])
    c, dt = 1.0, 2e-3
    vel0 = rng.normal(0, vscale, size=pts.shape)

    p1, v1 = jnp.asarray(pts), jnp.asarray(vel0)
    o, bj = jnp.zeros(3), jnp.asarray(box)
    for _ in range(steps):
        p1, v1, ok = md_step_pbc(p1, v1, o, bj, c, dt, M=512, L=512,
                                 interpret=True)
        assert bool(ok)

    B, G = suggest_pbc_capacity(len(pts), box, c + skin)
    st, ok, energy, nrb = md_run_skin_pbc(
        MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel0)),
        o, bj, c, dt, steps=steps, B=B, G=G, skin=skin, M=512, L=512,
        interpret=True,
    )
    assert bool(ok)
    assert int(nrb) < steps  # the skin window actually skipped rebuilds
    if want_rebuild:
        assert int(nrb) >= 1  # the in-scan rebuild branch really ran
    else:
        assert int(nrb) == 0
    ref = np.asarray(p1)
    # stepwise positions may sit just outside the box (wrap happens on
    # the NEXT step's extend); normalize both sides
    ref = np.mod(ref, box)
    got = np.mod(np.asarray(st.positions), box)
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], ref[np.lexsort(ref.T)],
        rtol=1e-8, atol=1e-8,
    )
    # energy finite and consistent with a direct evaluation
    from zelll_tpu.ops.pbc import pbc_lj_energy

    e2, ok2 = pbc_lj_energy(st.positions, o, bj, c, M=512, L=512,
                            interpret=True)
    assert bool(ok2)
    assert abs(float(energy) - float(e2)) <= 1e-9 * max(1.0, abs(float(e2)))


@pytest.mark.parametrize("steps,skin,vscale,want_rebuild", [
    (10, 0.4, 0.05, False),   # inside the skin window: zero rebuilds
    (40, 0.08, 0.2, True),    # drift exceeds skin/2: rebuild branch runs
])
def test_md_run_skin_tile_pbc_matches_stepwise(steps, skin, vscale,
                                               want_rebuild):
    """The tile-kernel Verlet-skin PBC loop (cubic/wide boxes) reproduces
    the rebuild-every-step tile-path PBC trajectory and rebuilds exactly
    when drift demands it."""
    from zelll_tpu.models.lj_md import MDState, md_run_skin_tile_pbc
    from zelll_tpu.ops.pbc import md_step_pbc, suggest_pbc_capacity

    rng = np.random.default_rng(21)
    spacing = 1.3
    grid = np.stack(np.meshgrid(
        np.arange(4), np.arange(4), np.arange(4), indexing="ij"
    ), -1).reshape(-1, 3).astype(np.float64)
    pts = grid * spacing + 0.5 * spacing
    pts += rng.uniform(-0.05, 0.05, size=pts.shape)
    box = np.asarray([4 * spacing, 4 * spacing, 4 * spacing])
    c, dt = 1.0, 2e-3
    vel0 = rng.normal(0, vscale, size=pts.shape)

    p1, v1 = jnp.asarray(pts), jnp.asarray(vel0)
    o, bj = jnp.zeros(3), jnp.asarray(box)
    for _ in range(steps):
        p1, v1, ok = md_step_pbc(p1, v1, o, bj, c, dt, path="tile",
                                 MAXJ=16, interpret=True)
        assert bool(ok)

    B, G = suggest_pbc_capacity(len(pts), box, c + skin)
    st, ok, energy, nrb = md_run_skin_tile_pbc(
        MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel0)),
        o, bj, c, dt, steps=steps, B=B, G=G, skin=skin, MAXJ=16,
        interpret=True,
    )
    assert bool(ok)
    assert int(nrb) < steps  # the skin window actually skipped rebuilds
    if want_rebuild:
        assert int(nrb) >= 1  # the in-scan rebuild branch really ran
    else:
        assert int(nrb) == 0
    ref = np.mod(np.asarray(p1), box)
    got = np.mod(np.asarray(st.positions), box)
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], ref[np.lexsort(ref.T)],
        rtol=1e-8, atol=1e-8,
    )
    # energy consistent with a direct tile-path evaluation
    from zelll_tpu.ops.pbc import pbc_lj_energy

    e2, ok2 = pbc_lj_energy(st.positions, o, bj, c, path="tile", MAXJ=16,
                            interpret=True)
    assert bool(ok2)
    assert abs(float(energy) - float(e2)) <= 1e-9 * max(1.0, abs(float(e2)))


def test_pbc_count_xla_path_odd_rows():
    """Regression: `pbc_count_pairs(path="xla")` truncated every
    half-integral per-particle count (jnp.sum(dtype=int32) casts elements
    BEFORE summing), silently under-counting with ok=True (found by a
    hardware drive: 13527/21582/21963 across paths on one input). The xla
    branch must accumulate doubled integral counts and halve exactly."""
    pts, origin, boxj, c = make_case(n=700, box=(6.0, 6.0, 6.0), seed=42)
    _, n_ref, _ = oracle(pts, np.asarray(boxj), c)
    for path, kw in (
        ("xla", dict(K=48)),
        ("lag", dict(M=1024, L=1024)),
        ("tile", dict(MAXJ=24)),
    ):
        cnt, ok = pbc_count_pairs(
            pts, origin, boxj, c, path=path, interpret=True, **kw
        )
        assert bool(ok), path
        assert int(cnt) == n_ref, (path, int(cnt), n_ref)


def test_md_run_vv_pbc_matches_numpy():
    """Velocity-Verlet PBC trajectory tracks a numpy f64 minimum-image
    VV integrator exactly (one force eval per step, forces carried)."""
    from zelll_tpu.models.lj_md import MDState, md_run_vv_pbc
    from zelll_tpu.ops.pbc import suggest_pbc_capacity

    rng = np.random.default_rng(12)
    box = np.asarray([5.0, 5.5, 6.0])
    n, c, dt, steps = 128, 1.0, 1e-5, 4
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    vel = rng.normal(0, 0.1, size=(n, 3))

    p_np, v_np = pts.copy(), vel.copy()
    _, _, f_np = oracle(p_np, box, c)
    for _ in range(steps):
        vh = v_np + 0.5 * dt * f_np
        p_np = np.mod(p_np + dt * vh, box)
        _, _, f_np = oracle(p_np, box, c)
        v_np = vh + 0.5 * dt * f_np

    B, G = suggest_pbc_capacity(n, box, c)
    st, ok = md_run_vv_pbc(
        MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel)),
        jnp.zeros(3), jnp.asarray(box), c, dt, steps=steps, B=B, G=G,
        M=512, L=512, interpret=True,
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(st.positions), p_np,
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st.velocities), v_np,
                               rtol=1e-9, atol=1e-9)


# -- in-kernel minimum image (narrow axes; round 9) --------------------------


@pytest.mark.parametrize("seed,box,cutoff,mi", [
    # protocol-shaped slab: x/y are 3-cell axes -> folded, z ghost shell
    (0, (2.5, 2.5, 40.0), 1.0, "auto"),
    # near-cubic with a larger cutoff: two narrow axes folded
    (1, (4.3, 5.1, 6.7), 1.5, "auto"),
    # explicit single-axis fold (y and z keep ghost images)
    (2, (2.5, 2.5, 40.0), 1.0, (True, False, False)),
])
def test_pbc_minimage_energy_count_forces(seed, box, cutoff, mi):
    """In-kernel minimum-image fold == ghost-extension == oracle: energy
    to 1e-9 (f64 interpret), counts integer-exact, forces to 1e-9."""
    from zelll_tpu.ops.pbc import minimage_axes

    pts, origin, boxj, c = make_case(seed=seed, box=box, cutoff=cutoff)
    if mi == "auto":
        assert minimage_axes(box, c).any(), "fixture must exercise the fold"
    e_ref, n_ref, f_ref = oracle(pts, box, c)

    e, ok = pbc_lj_energy(
        pts, origin, boxj, c, M=512, L=512, interpret=True, minimage=mi
    )
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 1e-9 * max(1.0, abs(e_ref))

    cnt, ok = pbc_count_pairs(
        pts, origin, boxj, c, M=512, L=512, interpret=True, minimage=mi
    )
    assert bool(ok)
    assert cnt == n_ref

    f, ok = pbc_lj_forces(
        pts, origin, boxj, c, M=512, L=512, interpret=True, minimage=mi
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-9, atol=1e-9)


def test_pbc_minimage_wrap_invariance():
    pts, origin, box, c = make_case(seed=4, box=(2.5, 2.5, 40.0))
    kw = dict(M=512, L=512, interpret=True, minimage="auto")
    e0, ok0 = pbc_lj_energy(pts, origin, box, c, **kw)
    shift = jnp.asarray([[2.0, -3.0, 1.0]]) * box
    e1, ok1 = pbc_lj_energy(pts + shift, origin, box, c, **kw)
    assert bool(ok0) and bool(ok1)
    assert abs(float(e0) - float(e1)) <= 1e-9 * abs(float(e0))


def test_pbc_minimage_split_exact():
    """Split (hi, lo) f32 planes stay f64-grade THROUGH the in-kernel
    fold: the two-diff residual of the hi difference is carried into the
    lo term (`pallas_pairs._mi_pair_d`). Offset coordinates make plain
    f32 visibly lossy."""
    rng = np.random.default_rng(9)
    n, cutoff = 300, 1.0
    box = np.array([2.5, 2.5, 30.0])
    pts64 = rng.uniform(0, 1, (n, 3)) * box * (1 - 1e-9) + 4096.0
    origin = np.full(3, 4096.0)
    hi = pts64.astype(np.float32)
    lo = (pts64 - hi.astype(np.float64)).astype(np.float32)
    d = pts64[:, None] - pts64[None, :]
    d -= box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    m = dsq < cutoff * cutoff
    t = np.where(m, 1.0 / np.where(m, dsq, 1.0), 0.0) ** 3
    e_ref = float(np.where(m, 4 * t * (t - 1), 0.0).sum() / 2)
    e, ok = pbc_lj_energy(
        jnp.asarray(hi), jnp.asarray(origin, jnp.float32),
        jnp.asarray(box, jnp.float32), cutoff, M=512, L=512,
        interpret=True, minimage="auto", positions_lo=jnp.asarray(lo),
    )
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 2e-6 * abs(e_ref)


def test_pbc_minimage_matches_ghost_path():
    """The fold and the ghost extension are two implementations of the
    same minimum-image convention: identical energies in f64."""
    pts, origin, box, c = make_case(seed=6, box=(2.5, 2.5, 40.0))
    e_mi, ok_mi = pbc_lj_energy(
        pts, origin, box, c, M=512, L=512, interpret=True, minimage="auto"
    )
    e_gh, ok_gh = pbc_lj_energy(
        pts, origin, box, c, M=512, L=512, interpret=True
    )
    assert bool(ok_mi) and bool(ok_gh)
    assert abs(float(e_mi) - float(e_gh)) <= 1e-9 * abs(float(e_gh))


def test_md_step_pbc_minimage_matches_ghost():
    """A short MD trajectory agrees (f64) between the fold and the ghost
    extension. Lattice fixture: a uniform-random cloud has near-overlap
    pairs with ~1e14 forces, where mere f64 summation-order noise between
    the two (equally correct) paths amplifies past any fixed tolerance."""
    from zelll_tpu.ops.pbc import md_step_pbc

    rng = np.random.default_rng(7)
    k, spacing = 4, 0.9
    g = np.stack(
        np.meshgrid(*([np.arange(k)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)
    box = np.array([k * spacing, k * spacing, 4 * k * spacing])
    pts = g * spacing + 0.5 * spacing
    pts[:, 2] *= 1.0  # lattice occupies the low slab of the long axis
    pts += rng.uniform(-0.05, 0.05, pts.shape) * spacing
    c = 1.0
    ptsj = jnp.asarray(pts)
    origin = jnp.zeros(3)
    boxj = jnp.asarray(box)
    vel = jnp.zeros_like(ptsj)
    p1, v1 = ptsj, vel
    p2, v2 = ptsj, vel
    for _ in range(3):
        p1, v1, ok1 = md_step_pbc(
            p1, v1, origin, boxj, c, 1e-3, M=512, L=512, interpret=True,
            minimage=(True, True, False),
        )
        p2, v2, ok2 = md_step_pbc(
            p2, v2, origin, boxj, c, 1e-3, M=512, L=512, interpret=True,
        )
        assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=0,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=0,
                               atol=1e-8)


def test_pbc_minimage_tile_raises():
    pts, origin, box, c = make_case(seed=8, box=(2.5, 2.5, 40.0))
    with pytest.raises(ValueError, match="lag"):
        pbc_lj_energy(pts, origin, box, c, path="tile",
                      minimage=(True, True, False))


def test_pbc_minimage_sorted_extremes_path():
    """n >= 512 single-ghost-axis min-image takes the sorted-extremes
    fast path (slice + shift + tail merge, no n-row ghost sort): exact
    vs the oracle, including the non-cell-aligned top face (box/cutoff
    non-integral -> appended images share the top real cell) and the
    cell-aligned case."""
    for boxz, seed in [(40.3, 0), (40.0, 1), (37.7, 2)]:
        rng = np.random.default_rng(seed)
        n, c = 1024, 1.0
        box = np.array([2.5, 2.6, boxz])
        pts = rng.uniform(0, 1, (n, 3)) * box * (1 - 1e-9)
        e_ref, n_ref, f_ref = oracle(pts, box, c)
        kw = dict(M=512, L=512, interpret=True, minimage="auto")
        ptsj = jnp.asarray(pts)
        org = jnp.zeros(3)
        bxj = jnp.asarray(box)
        e, ok = pbc_lj_energy(ptsj, org, bxj, c, **kw)
        assert bool(ok), boxz
        assert abs(float(e) - e_ref) <= 1e-9 * max(1.0, abs(e_ref))
        cnt, ok = pbc_count_pairs(ptsj, org, bxj, c, **kw)
        assert bool(ok) and cnt == n_ref, (boxz, cnt, n_ref)
        f, ok = pbc_lj_forces(ptsj, org, bxj, c, **kw)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-9,
                                   atol=1e-9)


def test_pbc_minimage_sorted_extremes_wrap_and_empty_face():
    """Out-of-box inputs wrap first; a cloud leaving the high face empty
    still works (the suffix slice holds non-boundary rows, all its ghost
    candidates invalid)."""
    rng = np.random.default_rng(3)
    n, c = 1024, 1.0
    box = np.array([2.5, 2.5, 41.0])
    pts = rng.uniform(0, 1, (n, 3)) * np.array([2.5, 2.5, 20.0])
    e_ref, n_ref, _ = oracle(pts, box, c)
    kw = dict(M=512, L=512, interpret=True, minimage="auto")
    org = jnp.zeros(3)
    bxj = jnp.asarray(box)
    e, ok = pbc_lj_energy(jnp.asarray(pts), org, bxj, c, **kw)
    assert bool(ok)
    assert abs(float(e) - e_ref) <= 1e-9 * max(1.0, abs(e_ref))
    # wrap invariance through the fast path
    shift = jnp.asarray([[5.0, -2.0, 3.0]]) * bxj
    e2, ok = pbc_lj_energy(jnp.asarray(pts) + shift, org, bxj, c, **kw)
    assert bool(ok)
    assert abs(float(e2) - float(e)) <= 1e-9 * abs(float(e))
