"""Checkpoint round-trip and profiling helper smoke tests."""

import numpy as np

from zelll_tpu.utils.checkpoint import load, save


def test_checkpoint_roundtrip(tmp_path):
    pts = np.random.default_rng(0).random((50, 3))
    vel = np.random.default_rng(1).random((50, 3))
    p = tmp_path / "ck.npz"
    save(p, pts, 1.5, velocities=vel)
    pos2, cutoff, extras = load(p)
    np.testing.assert_array_equal(pos2, pts)
    assert cutoff == 1.5
    np.testing.assert_array_equal(extras["velocities"], vel)


def test_orbax_roundtrip(tmp_path):
    import jax.numpy as jnp

    from zelll_tpu.utils.checkpoint import load_orbax, save_orbax

    tree = {"a": jnp.arange(10.0), "b": {"c": jnp.ones((3, 3))}}
    path = tmp_path / "orbax_ck"
    save_orbax(str(path), tree)
    got = load_orbax(str(path))
    np.testing.assert_array_equal(np.asarray(got["a"]), np.arange(10.0))
    np.testing.assert_array_equal(np.asarray(got["b"]["c"]), np.ones((3, 3)))
