"""Host-sequential chunked split-precision energy (the comparison
harness's 1e8 "splitchunk" variant, benchmarks/run_comparison_r5.py):
major-axis slab chunks with one-cell halos and min_islot ownership on a
single device must reproduce the f64 oracle to 1e-6 — the pattern that
puts an f64-grade engine row at n = 1e8 into the comparison CSV
(matching /root/reference/scripts/more_benches.sh exact-f64 coverage)."""

import numpy as np
import jax
import jax.numpy as jnp

from zelll_tpu.api import _pad_far
from zelll_tpu.core.binning import bin_and_sort
from zelll_tpu.core.geometry import Aabb, GridInfo
from zelll_tpu.ops.pallas_pairs import (
    lag_coverage_ok, lj_term, pair_lag_reduce, suggest_lag)
from zelll_tpu.utils.datagen import generate_points_random, lj_box


def _brute_energy(pts, cutoff):
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    w = np.triu(dsq < cutoff * cutoff)
    t = 1.0 / np.where(w, dsq, 1.0)
    t3 = t ** 3
    return float(np.where(w, 4.0 * t3 * (t3 - 1.0), 0.0).sum())


def test_chunked_split_energy_matches_oracle():
    n, cutoff, K = 8000, 10.0, 4
    pts = generate_points_random(n, lj_box(n, cutoff))
    pos64 = np.asarray(pts, np.float64)
    e_ref = _brute_energy(pos64, cutoff)

    hi = pos64.astype(np.float32)
    lo = (pos64 - hi.astype(np.float64)).astype(np.float32)
    inf32, sup32 = hi.min(axis=0), hi.max(axis=0)
    info = GridInfo.create(
        Aabb(jnp.asarray(inf32), jnp.asarray(sup32)), cutoff,
        auto_order=True)
    major = int(np.argmax(sup32 - inf32))
    zc = np.floor(
        (hi[:, major] - inf32[major]) / np.float32(cutoff)).astype(np.int32)
    order = np.argsort(zc, kind="stable")
    hi, lo, zc = hi[order], lo[order], zc[order]
    bcells = np.unique(zc[np.arange(1, K) * (n // K)])
    starts = np.unique(np.concatenate(
        [[0], np.searchsorted(zc, bcells, side="left"), [n]]))
    halos = np.searchsorted(zc, zc[starts[:-1]] - 1, side="left")
    assert len(starts) - 1 >= 3, "fixture must actually chunk"
    cap = int(np.max(starts[1:] - halos))
    cap = -(-(cap + 8) // 1024) * 1024
    csq = jnp.float32(cutoff) ** 2
    b0, _ = bin_and_sort(jnp.asarray(hi[halos[0]:starts[1]]), cutoff,
                         max_cells=1, need_perm=False, info=info)
    L = suggest_lag(np.asarray(b0.sorted_keys), np.asarray(info.strides))
    M = max(1024, min(16384, L))

    @jax.jit
    def chunk_energy(chi, clo, valid, mis):
        bins, cols = bin_and_sort(
            jnp.concatenate([chi, clo], axis=1), cutoff, max_cells=1,
            need_perm=False, info=info, valid=valid)
        e = pair_lag_reduce(
            cols[:, :3], bins.sorted_keys, info.strides, csq,
            cols[:, 3:], M=M, L=L, term=lj_term, min_islot=mis,
            interpret=True)
        return e, lag_coverage_ok(bins.sorted_keys, info.strides, L)

    e_total, all_ok = 0.0, True
    for c in range(len(starts) - 1):
        h0, s0, s1 = int(halos[c]), int(starts[c]), int(starts[c + 1])
        m = s1 - h0
        chi = _pad_far(hi[h0:s1], cap)
        clo = np.zeros((cap, 3), np.float32)
        clo[:m] = lo[h0:s1]
        valid = np.arange(cap) < m
        ev, ok = chunk_energy(jnp.asarray(chi), jnp.asarray(clo),
                              jnp.asarray(valid), jnp.int32(s0 - h0))
        e_total += float(ev)
        all_ok = all_ok and bool(ok)
    assert all_ok
    assert abs(e_total - e_ref) / abs(e_ref) < 1e-6
