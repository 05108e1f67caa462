"""End-to-end surface-sampling workload: PDB I/O, batched HMC, NUTS."""

import numpy as np
import pytest

from zelll_tpu.models.nuts import hmc_sample_batched, nuts_sample
from zelll_tpu.models.psssh import eval_grid, sample_surface
from zelll_tpu.models.sdf import SmoothDistanceField
from zelll_tpu.utils.pdb import read_pdb, write_points_pdb

PDB_SNIPPET = """\
HEADER    TEST
ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00  0.00           N
ATOM      2  CA  ALA A   1       1.458   0.000   0.000  1.00  0.00           C
ATOM      3  C   ALA A   1       2.009   1.420   0.000  1.00  0.00           C
ATOM      4  O   ALA A   1       1.251   2.390   0.000  1.00  0.00           O
ATOM      5  CB  ALA A   1       1.988  -0.773  -1.199  1.00  0.00           C
HETATM    6 FE   HEM A   2       5.000   5.000   5.000  1.00  0.00          FE
ATOM      7  H   ALA A   1       0.500   0.900   0.100  1.00  0.00           H
END
"""


def test_pdb_roundtrip(tmp_path):
    p = tmp_path / "t.pdb"
    p.write_text(PDB_SNIPPET)
    pos, radii, elems = read_pdb(p)
    # FE is unsupported and skipped (reference io.rs:14-24 Err branch)
    assert len(pos) == 6
    assert elems == ["N", "C", "C", "O", "C", "H"]
    np.testing.assert_allclose(pos[1], [1.458, 0.0, 0.0])
    np.testing.assert_allclose(radii[:2], [1.55, 1.70])

    out = tmp_path / "o.pdb"
    write_points_pdb(out, pos)
    pos2, _, _ = read_pdb(out)
    np.testing.assert_allclose(pos2, pos, atol=1e-3)


def _toy_sdf():
    rng = np.random.default_rng(0)
    # small clump of "atoms"
    atoms = rng.normal(0, 1.0, (20, 3))
    return SmoothDistanceField(atoms, cutoff=4.0, surface_radius=1.05)


def test_batched_hmc_samples_near_isosurface():
    import jax

    sdf = _toy_sdf()
    pts = sample_surface(sdf, chains=16, burnin=100, draws=10, seed=1)
    assert pts.shape == (160, 3)
    vals, _, ok = sdf.evaluate(pts)
    assert ok.mean() > 0.95
    # harmonic potential with k=10 concentrates sdf values near 1.05
    good = vals[ok]
    assert np.median(np.abs(good - 1.05)) < 0.5


def test_gaussian_hmc_statistics():
    import jax
    import jax.numpy as jnp

    def logp(x):
        return -0.5 * jnp.sum(x * x)

    key = jax.random.PRNGKey(0)
    q0 = jnp.zeros((64, 3)) + 2.0
    samples, accept = hmc_sample_batched(
        logp, q0, key, num_warmup=200, num_samples=300, num_leapfrog=8
    )
    s = np.asarray(samples).reshape(-1, 3)
    assert float(np.asarray(accept).mean()) > 0.5
    assert abs(s.mean()) < 0.15
    assert abs(s.std() - 1.0) < 0.15


def test_hmc_mass_matrix_adapts_to_anisotropic_scales():
    """Scales spanning 100x: without the adapted diagonal mass matrix a
    shared step size cannot traverse the wide axis while resolving the
    narrow one, and the wide-axis sample std collapses far below truth."""
    import jax
    import jax.numpy as jnp

    scales = jnp.asarray([10.0, 1.0, 0.1])

    def logp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    key = jax.random.PRNGKey(3)
    q0 = jnp.zeros((64, 3))
    samples, accept = hmc_sample_batched(
        logp, q0, key, num_warmup=500, num_samples=500, num_leapfrog=16
    )
    s = np.asarray(samples).reshape(-1, 3)
    assert float(np.asarray(accept).mean()) > 0.5
    got = s.std(axis=0)
    np.testing.assert_allclose(got, np.asarray(scales), rtol=0.25)


def test_nuts_gaussian():
    def vg(q):
        return -0.5 * float(q @ q), -q

    samples, acc = nuts_sample(
        vg, np.array([3.0, -3.0]), num_warmup=150, num_samples=400, seed=2
    )
    assert abs(samples.mean()) < 0.25
    assert abs(samples.std() - 1.0) < 0.25
    assert acc.mean() > 0.4


def test_eval_grid_runs():
    sdf = _toy_sdf()
    grid, vals, grads, dt = eval_grid(sdf, l=8)
    assert grid.shape == (512, 3)
    assert np.isfinite(vals).any()


def test_cli_sample_and_eval(tmp_path, capsys):
    """CLI surface parity (cli.rs:19-61): positional optional out path
    defaulting to input + .psssh.pdb, -n total samples, reference-named
    flags, and the eval CSV columns (cli.rs:183-195)."""
    from zelll_tpu.models.psssh import main

    p = tmp_path / "toy.pdb"
    p.write_text(PDB_SNIPPET)
    main([
        "sample", str(p), "-n", "48", "-b", "10", "--chains", "16",
        "--sampler", "hmc", "-c", "10.0", "-l", "1.05", "-f", "10.0",
    ])
    out = tmp_path / "toy.psssh.pdb"
    assert out.exists()
    pts, _, _ = read_pdb(out)
    assert len(pts) == 48  # -n caps the total across chains

    main(["eval", str(p), "-l", "4", "-c", "5.0"])
    lines = capsys.readouterr().out.strip().splitlines()
    header = lines[-2]
    row = lines[-1].split(",")
    assert header == "name,atoms,vol,cutoff,queries,ns_total"
    assert row[0] == "toy" and row[1] == "6" and row[4] == "64"
