"""Per-particle payload through the lag kernel: species-dependent LJ."""

import jax.numpy as jnp
import numpy as np

from zelll_tpu.core.binning import bin_and_sort
from zelll_tpu.ops.pallas_pairs import pair_lag_reduce


def test_mixed_sigma_lj_matches_bruteforce():
    rng = np.random.default_rng(0)
    n, cutoff = 400, 1.5
    pts = rng.uniform(0, 1, size=(n, 3)) * np.array([4.0, 4.0, 20.0])
    sigma = rng.choice([0.3, 0.5], n)  # two species

    stacked = jnp.asarray(np.hstack([pts, sigma[:, None]]))
    bins, cols = bin_and_sort(stacked, cutoff, max_cells=1)
    spos, spay = cols[:, :3], cols[:, 3:]

    def mixed_lj(dsq, si, sj):
        s = 0.5 * (si + sj)
        t = (s * s) / dsq
        t3 = t * t * t
        return 4.0 * t3 * (t3 - 1.0)

    e = pair_lag_reduce(
        spos, bins.sorted_keys, bins.info.strides, cutoff**2,
        None, spay, M=256, L=256, term=mixed_lj, interpret=True,
    )

    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    iu = np.triu_indices(n, 1)
    v = dsq[iu]
    s = 0.5 * (sigma[:, None] + sigma[None, :])[iu]
    sel = v < cutoff**2
    t3 = ((s[sel] ** 2) / v[sel]) ** 3
    want = (4 * t3 * (t3 - 1)).sum()
    np.testing.assert_allclose(float(e), want, rtol=1e-11)


def test_payload_with_split_and_ownership():
    """Payload + split precision + min_islot compose."""
    import numpy as np
    from zelll_tpu.ops.pallas_pairs import pair_lag_reduce

    rng = np.random.default_rng(3)
    n, cutoff = 300, 1.0
    pts = rng.uniform(0, 1, size=(n, 3)) * np.array([3.0, 3.0, 3000.0])
    q = rng.choice([1.0, -1.0], n)  # "charges"

    stacked = jnp.asarray(np.hstack([pts, q[:, None]]))
    bins, cols = bin_and_sort(stacked, cutoff, max_cells=1)
    spos64, spay = cols[:, :3], cols[:, 3:]
    hi = jnp.asarray(np.asarray(spos64, np.float64).astype(np.float32))
    lo = jnp.asarray(
        (np.asarray(spos64, np.float64) - np.asarray(hi, np.float64)).astype(
            np.float32
        )
    )

    def qq(dsq, qi, qj):
        return qi * qj / dsq

    got = pair_lag_reduce(
        hi, bins.sorted_keys, bins.info.strides, cutoff**2,
        lo, spay.astype(jnp.float32),
        M=256, L=256, term=qq, interpret=True, min_islot=0,
    )

    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    iu = np.triu_indices(n, 1)
    v = dsq[iu]
    qprod = (q[:, None] * q[None, :])[iu]
    sel = v < cutoff**2
    want = (qprod[sel] / v[sel]).sum()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
