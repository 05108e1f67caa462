"""Fused pair-distance histograms / RDF (interpret mode on CPU) vs
O(n^2) brute force. Hardware parity is covered by benchmarks/tpu_parity.py
(hist_* rows)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.ops.pallas_pairs import split_f64
from zelll_tpu.ops.rdf import pair_distance_histogram, rdf, rdf_normalize


def brute_hist(pts, edges):
    d = pts[:, None, :] - pts[None, :, :]
    dist = np.sqrt((d * d).sum(-1))
    iu = np.triu_indices(len(pts), 1)
    v = dist[iu]
    counts, _ = np.histogram(v, bins=np.asarray(edges))
    return counts


def brute_hist_pbc(pts, box, edges):
    d = pts[:, None, :] - pts[None, :, :]
    d = d - np.round(d / box) * box  # minimum image
    dist = np.sqrt((d * d).sum(-1))
    iu = np.triu_indices(len(pts), 1)
    counts, _ = np.histogram(dist[iu], bins=np.asarray(edges))
    return counts


@pytest.mark.parametrize("n,box,rmax", [
    (500, (6.0, 6.0, 6.0), 1.5),
    (400, (2.0, 2.0, 80.0), 2.0),   # thin (bench-like) box
    (64, (1.0, 1.0, 1.0), 0.7),     # dense clump
])
def test_hist_vs_bruteforce(n, box, rmax):
    rng = np.random.default_rng(n)
    pts = rng.uniform(0, 1, size=(n, 3)) * np.asarray(box)
    edges = np.linspace(0.0, rmax, 17)
    counts, ok = pair_distance_histogram(
        jnp.asarray(pts), edges, L=256, interpret=True
    )
    assert ok
    np.testing.assert_array_equal(np.asarray(counts), brute_hist(pts, edges))


def test_hist_2d():
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 5, size=(300, 2))
    edges = np.linspace(0.0, 1.2, 9)
    counts, ok = pair_distance_histogram(
        jnp.asarray(pts), edges, L=256, interpret=True
    )
    assert ok
    np.testing.assert_array_equal(np.asarray(counts), brute_hist(pts, edges))


def test_hist_split_precision():
    """f32 hi/lo planes put bin boundaries at f64-grade in a large box."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, size=(400, 3)) * np.array([3.0, 3.0, 9000.0])
    edges = np.linspace(0.0, 2.0, 13)
    hi, lo = split_f64(jnp.asarray(pts))
    counts, ok = pair_distance_histogram(
        hi, edges, positions_lo=lo, L=256, interpret=True
    )
    assert ok
    np.testing.assert_array_equal(np.asarray(counts), brute_hist(pts, edges))


def test_hist_nonuniform_edges_and_underflow():
    """edges[0] > 0 excludes closer pairs; uneven shells bin exactly."""
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 4, size=(350, 3))
    edges = np.array([0.3, 0.5, 1.0, 1.1, 1.7])
    counts, ok = pair_distance_histogram(
        jnp.asarray(pts), edges, L=512, interpret=True
    )
    assert ok
    np.testing.assert_array_equal(np.asarray(counts), brute_hist(pts, edges))


def test_hist_coverage_flag():
    """An undersized L trips the flag instead of silently dropping."""
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1, size=(2000, 3)) * np.array([4.0, 4.0, 4.0])
    edges = np.linspace(0.0, 2.0, 5)
    _, ok = pair_distance_histogram(
        jnp.asarray(pts), edges, L=128, interpret=True
    )
    assert not ok


def test_rdf_pbc_counts_and_normalization():
    rng = np.random.default_rng(9)
    box = np.array([8.0, 8.0, 8.0])
    n = 600
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    edges = np.linspace(0.2, 2.0, 10)

    r_mid, g, ok = rdf(
        jnp.asarray(pts), np.zeros(3), box, edges, L=512, interpret=True
    )
    assert ok
    # reconstruct counts from g to check against the minimum-image brute
    # force (rdf_normalize is invertible)
    ref_counts = brute_hist_pbc(pts, box, edges)
    _, g_ref = rdf_normalize(ref_counts, edges, n, float(box.prod()))
    np.testing.assert_allclose(g, g_ref, rtol=1e-12)
    # ideal gas: g ~ 1 (loose statistical check)
    assert 0.8 < float(np.mean(g)) < 1.2


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_hist(seed):
    """Random boxes/edges/sizes: fused histogram == numpy brute force,
    exactly (f64 on the CPU mesh)."""
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(40, 700))
    box = rng.uniform(2.0, 30.0, size=3)
    off = rng.uniform(-15.0, 15.0, size=3)
    pts = rng.uniform(0, 1, size=(n, 3)) * box + off
    K = int(rng.integers(2, 24))
    rmax = float(rng.uniform(0.5, 4.0))
    edges = np.sort(rng.uniform(0.0, rmax, size=K))
    edges[-1] = rmax
    counts, ok = pair_distance_histogram(
        jnp.asarray(pts), edges, M=1024, L=1024, interpret=True
    )
    assert ok
    np.testing.assert_array_equal(np.asarray(counts), brute_hist(pts, edges))


@pytest.mark.parametrize("boxshape", ["cubic", "thin"])
def test_hist_tile_path(boxshape):
    """Segment-tile histogram == brute force on both box classes."""
    rng = np.random.default_rng(21)
    box = (7.0, 7.0, 7.0) if boxshape == "cubic" else (2.0, 2.0, 60.0)
    pts = rng.uniform(0, 1, size=(600, 3)) * np.asarray(box)
    edges = np.linspace(0.0, 1.5, 13)
    counts, ok = pair_distance_histogram(
        jnp.asarray(pts), edges, path="tile", MAXJ=16, interpret=True
    )
    assert ok
    np.testing.assert_array_equal(np.asarray(counts), brute_hist(pts, edges))


def test_hist_tile_split_matches_lag():
    rng = np.random.default_rng(23)
    pts = rng.uniform(0, 1, size=(500, 3)) * np.array([5.0, 5.0, 400.0])
    edges = np.linspace(0.0, 2.0, 9)
    hi, lo = split_f64(jnp.asarray(pts))
    c_tile, ok1 = pair_distance_histogram(
        hi, edges, positions_lo=lo, path="tile", MAXJ=16, interpret=True
    )
    c_lag, ok2 = pair_distance_histogram(
        hi, edges, positions_lo=lo, L=512, interpret=True
    )
    assert ok1 and ok2
    np.testing.assert_array_equal(np.asarray(c_tile), np.asarray(c_lag))
    np.testing.assert_array_equal(np.asarray(c_tile), brute_hist(pts, edges))


def test_rdf_pbc_tile_path():
    rng = np.random.default_rng(29)
    box = np.array([9.0, 9.0, 9.0])
    n = 500
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    edges = np.linspace(0.3, 2.2, 8)
    r_mid, g, ok = rdf(
        jnp.asarray(pts), np.zeros(3), box, edges, path="tile", MAXJ=16,
        interpret=True,
    )
    assert ok
    ref_counts = brute_hist_pbc(pts, box, edges)
    _, g_ref = rdf_normalize(ref_counts, edges, n, float(box.prod()))
    np.testing.assert_allclose(g, g_ref, rtol=1e-12)


@pytest.mark.parametrize("path", ["lag", "tile"])
def test_hist_species_pairs(path):
    """Partial histograms: species pair masks on both kernel paths."""
    rng = np.random.default_rng(31)
    n = 400
    pts = rng.uniform(0, 5, size=(n, 3))
    sp = rng.integers(0, 3, n)
    edges = np.linspace(0.0, 1.3, 9)
    d = pts[:, None] - pts[None]
    dist = np.sqrt((d * d).sum(-1))
    iu = np.triu_indices(n, 1)
    for a, b in [(0, 1), (2, 2)]:
        m = ((sp[iu[0]] == a) & (sp[iu[1]] == b)) | (
            (sp[iu[0]] == b) & (sp[iu[1]] == a)
        )
        want, _ = np.histogram(dist[iu][m], bins=edges)
        kw = dict(path="tile", MAXJ=16) if path == "tile" else dict(L=256)
        got, ok = pair_distance_histogram(
            jnp.asarray(pts), edges, species=sp, pair=(a, b),
            interpret=True, **kw,
        )
        assert ok
        np.testing.assert_array_equal(np.asarray(got), want)


def test_rdf_pbc_partial():
    from zelll_tpu.ops.rdf import rdf_normalize_partial

    rng = np.random.default_rng(37)
    box = np.array([8.0, 8.0, 8.0])
    n = 500
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    sp = rng.integers(0, 2, n)
    edges = np.linspace(0.3, 2.0, 8)

    r_mid, g, ok = rdf(
        jnp.asarray(pts), np.zeros(3), box, edges, L=512,
        species=sp, pair=(0, 1), interpret=True,
    )
    assert ok
    d = pts[:, None] - pts[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d * d).sum(-1))
    iu = np.triu_indices(n, 1)
    m = sp[iu[0]] != sp[iu[1]]
    want, _ = np.histogram(dist[iu][m], bins=edges)
    na, nb = int((sp == 0).sum()), int((sp == 1).sum())
    _, g_ref = rdf_normalize_partial(want, edges, na, nb,
                                     float(box.prod()), same=False)
    np.testing.assert_allclose(g, g_ref, rtol=1e-12)


def test_rdf_minimage_matches_ghost_and_bruteforce():
    """In-kernel min-image fold on narrow axes: binned distances are
    image distances, integer-exact vs brute force and vs the
    ghost-extension path."""
    rng = np.random.default_rng(50)
    box = np.array([2.2, 2.2, 40.0])
    n = 400
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    edges = np.linspace(0.2, 1.0, 9)

    from zelll_tpu.ops.pbc import minimage_axes
    assert minimage_axes(box, edges[-1]).any()

    r_mid, g, ok = rdf(
        jnp.asarray(pts), np.zeros(3), box, edges, M=512, L=512,
        interpret=True, minimage="auto",
    )
    assert ok
    ref_counts = brute_hist_pbc(pts, box, edges)
    _, g_ref = rdf_normalize(ref_counts, edges, n, float(box.prod()))
    np.testing.assert_allclose(g, g_ref, rtol=1e-12)

    r2, g2, ok2 = rdf(
        jnp.asarray(pts), np.zeros(3), box, edges, M=512, L=512,
        interpret=True,
    )
    assert ok2
    np.testing.assert_allclose(g, g2, rtol=1e-12)


def test_rdf_minimage_full_fold():
    """Every axis narrow -> no ghost extension at all."""
    rng = np.random.default_rng(51)
    box = np.array([3.1, 3.3, 3.7])
    n = 300
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    edges = np.linspace(0.3, 1.2, 7)
    r_mid, g, ok = rdf(
        jnp.asarray(pts), np.zeros(3), box, edges, M=512, L=512,
        interpret=True, minimage="auto",
    )
    assert ok
    ref_counts = brute_hist_pbc(pts, box, edges)
    _, g_ref = rdf_normalize(ref_counts, edges, n, float(box.prod()))
    np.testing.assert_allclose(g, g_ref, rtol=1e-12)


@pytest.mark.parametrize("box", [
    (2.2, 2.2, 40.0),   # partial fold: z keeps its ghost shell
    (2.2, 2.4, 2.6),    # full fold: no ghost rows at all
])
def test_rdf_minimage_species_partial(box):
    """Species-resolved partial RDF composes with the in-kernel fold:
    species ride `_minimage_bins` extras (ghosts inherit the parent's
    species on any remaining ghost axes)."""
    from zelll_tpu.ops.rdf import rdf_normalize_partial

    rng = np.random.default_rng(52)
    box = np.array(box)
    n = 300
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    sp = rng.integers(0, 2, n)
    edges = np.linspace(0.2, 1.0, 7)

    r_mid, g, ok = rdf(
        jnp.asarray(pts), np.zeros(3), box, edges, M=512, L=512,
        interpret=True, species=sp, pair=(0, 1), minimage="auto",
    )
    assert ok
    d = pts[:, None] - pts[None]
    d -= box * np.round(d / box)
    dist = np.sqrt((d * d).sum(-1))
    iu = np.triu_indices(n, 1)
    m = sp[iu[0]] != sp[iu[1]]
    want, _ = np.histogram(dist[iu][m], bins=edges)
    na, nb = int((sp == 0).sum()), int((sp == 1).sum())
    _, g_ref = rdf_normalize_partial(want, edges, na, nb,
                                     float(box.prod()), same=False)
    np.testing.assert_allclose(g, g_ref, rtol=1e-12)
    # and the ghost path agrees bit-for-bit on counts (explicit
    # capacities: ~every particle is boundary on this box, the known
    # ghost-blowup regime the fold exists to avoid)
    r2, g2, ok2 = rdf(
        jnp.asarray(pts), np.zeros(3), box, edges, M=1024, L=1024,
        interpret=True, species=sp, pair=(0, 1), B=n, G=7 * n,
    )
    assert ok2
    np.testing.assert_allclose(g, g2, rtol=1e-12)
