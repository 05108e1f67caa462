#!/usr/bin/env python
"""Real-hardware parity sweep: every kernel path vs the exact-f64 C++
oracle, ON THE REAL TPU BACKEND (no interpret mode).

Motivation: interpret mode computes full f32 on the CPU and cannot see
hardware-only behavior — Mosaic's default one-bf16-pass matmul silently
destroyed a forces-kernel variant (~0.5 rel err) while every
interpret-mode test passed (see CLAUDE.md "Mosaic f32 matmul" rule).
This sweep is the regression net for that class of bug: run it after
touching any kernel.

Prints one line per (path, box) with the relative error vs the oracle
and a PASS/FAIL verdict; exits nonzero on any FAIL. Writes a CSV when
OUT is set. Sizes are small (PARITY_N=2500 default) so every path
compiles quickly and the sweep stays under ~10 min cold / ~1 min warm
(compilation cache).

Thresholds: plain-f32 paths inherit the coordinate-cancellation bound
(~|coord| * 2^-24 per separation, amplified by LJ stiffness), split
(f32x2) paths must reach ~1e-6, pair counts must be integer-exact.
"""

import os
import sys

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zelll_tpu import oracle
from zelll_tpu.core import build
from zelll_tpu.core.binning import bin_and_sort
from zelll_tpu.core.pairs import pair_sum
from zelll_tpu.ops.fused import fused_lj_rebuild_energy
from zelll_tpu.ops.lj import lj
from zelll_tpu.ops.pallas_pairs import (
    combine_count,
    count_term,
    lag_coverage_ok,
    pair_lag_forces,
)
from zelll_tpu.ops.tile_pairs import (
    tile_count_pairs,
    tile_lj_rebuild_energy,
    tile_pair_forces,
)

N = int(os.environ.get("PARITY_N", "2500"))
CUTOFF = 10.0
BOXES = {
    # thin: the lag kernel's home turf
    "thin": (30.0, 30.0, N / 0.01 / 900.0),
    # cubic: the tile kernel's home turf
    "cubic": ((N / 0.01) ** (1 / 3),) * 3,
}

results = []


def check(name, rel_err, tol, extra=""):
    ok = rel_err <= tol
    results.append((name, rel_err, tol, ok))
    print(f"{'PASS' if ok else 'FAIL'}  {name:28s} rel_err={rel_err:.3e} "
          f"(tol {tol:.0e}) {extra}", flush=True)


def brute_ref(pts64, cutoff):
    d = pts64[:, None] - pts64[None, :]
    dsq = (d * d).sum(-1)
    m = (dsq < cutoff**2) & np.tri(len(pts64), k=-1, dtype=bool)
    inv = np.where(m, 1.0 / np.where(m, dsq, 1.0), 0.0)
    t = inv**3
    return float((4 * t * (t - 1)).sum()), int(m.sum())


def ref_forces(spos64, cutoff):
    if oracle.available():
        return oracle.forces(np.ascontiguousarray(spos64), cutoff)
    d = spos64[:, None] - spos64[None, :]
    dsq = (d * d).sum(-1)
    m = (dsq < cutoff**2) & ~np.eye(len(spos64), dtype=bool)
    inv = np.where(m, 1.0 / np.where(m, dsq, 1.0), 0.0)
    t = inv**3
    gf = np.where(m, 24 * t * (2 * t - 1) * inv, 0.0)
    return (d * gf[..., None]).sum(axis=1)


def main():
    print(f"backend={jax.default_backend()} n={N} cutoff={CUTOFF}",
          flush=True)
    rng = np.random.default_rng(42)
    for boxname, box in BOXES.items():
        pts64 = rng.uniform(0, 1, (N, 3)) * np.asarray(box)
        if oracle.available():
            e_ref, n_ref = oracle.lj_energy(pts64, CUTOFF)
        else:
            e_ref, n_ref = brute_ref(pts64, CUTOFF)

        hi = jnp.asarray(pts64, jnp.float32)
        lo = jnp.asarray(pts64 - np.asarray(hi, np.float64), jnp.float32)

        # sorted planes: hi keys drive the binning, lo rides as payload
        bins, cols = bin_and_sort(
            jnp.concatenate([hi, lo], axis=1), CUTOFF, max_cells=1,
            need_perm=False,
        )
        shi, slo = cols[:, :3], cols[:, 3:6]
        skeys, strides = bins.sorted_keys, bins.info.strides
        spos64 = np.asarray(shi, np.float64) + np.asarray(slo, np.float64)
        f_ref = ref_forces(spos64, CUTOFF)
        fscale = np.abs(f_ref).max() + 1e-30
        f_ref32 = ref_forces(np.asarray(shi, np.float64), CUTOFF)

        # |coord|-cancellation bound for plain-f32 paths in this box
        f32_tol = max(np.max(box) * 2**-24 / CUTOFF * 300, 3e-5)
        csq = CUTOFF**2

        e, ok = fused_lj_rebuild_energy(hi, CUTOFF, M=4096, L=1024)
        assert bool(ok)
        check(f"lag_energy_f32[{boxname}]",
              abs(float(e) - e_ref) / abs(e_ref), f32_tol)

        e, ok = fused_lj_rebuild_energy(hi, CUTOFF, lo, M=4096, L=1024)
        assert bool(ok)
        check(f"lag_energy_split[{boxname}]",
              abs(float(e) - e_ref) / abs(e_ref), 2e-6)

        packed, ok = fused_lj_rebuild_energy(
            hi, CUTOFF, lo, M=4096, L=1024, term=count_term,
            out_dtype=jnp.int32)
        assert bool(ok)
        check(f"lag_count_split[{boxname}]",
              abs(combine_count(packed) - n_ref) / n_ref, 1e-6)

        assert bool(lag_coverage_ok(skeys, strides, 1024))
        f = pair_lag_forces(shi, skeys, strides, csq, slo, M=4096, L=1024)
        check(f"lag_forces_split[{boxname}]",
              np.abs(np.asarray(f, np.float64) - f_ref).max() / fscale,
              2e-6)

        f = pair_lag_forces(shi, skeys, strides, csq, M=4096, L=1024)
        check(f"lag_forces_f32[{boxname}]",
              np.abs(np.asarray(f, np.float64) - f_ref32).max() / fscale,
              f32_tol)

        packed, ok = tile_count_pairs(shi, skeys, strides, csq, MAXJ=24)
        assert bool(ok)
        check(f"tile_count[{boxname}]",
              abs(combine_count(np.asarray(packed)) - n_ref) / n_ref, 0.0,
              extra="(integer-exact)")

        e, ok = tile_lj_rebuild_energy(hi, CUTOFF, MAXJ=24)
        assert bool(ok)
        check(f"tile_energy_f32[{boxname}]",
              abs(float(e) - e_ref) / abs(e_ref), f32_tol)

        e, ok = tile_lj_rebuild_energy(hi, CUTOFF, lo, MAXJ=24)
        assert bool(ok)
        check(f"tile_energy_split[{boxname}]",
              abs(float(e) - e_ref) / abs(e_ref), 2e-6)

        f, ok = tile_pair_forces(shi, skeys, strides, csq, MAXJ=24)
        assert bool(ok)
        check(f"tile_forces_f32[{boxname}]",
              np.abs(np.asarray(f, np.float64) - f_ref32).max() / fscale,
              f32_tol)

        f, ok = tile_pair_forces(shi, skeys, strides, csq, slo, MAXJ=24)
        assert bool(ok)
        check(f"tile_forces_split[{boxname}]",
              np.abs(np.asarray(f, np.float64) - f_ref).max() / fscale,
              2e-6)

        # per-band MAXJ capacities (round 5): must agree with the shared
        # scalar capacity on hardware, not just in interpret mode
        from zelll_tpu.ops.pallas_pairs import _pad_and_desentinel
        from zelll_tpu.ops.segments import CHUNK, segment_bands, suggest_maxj

        C = max(-(-N // (CHUNK * 8)) * 8, 8) * CHUNK
        keys_p = _pad_and_desentinel(skeys, C)
        mj_h = suggest_maxj(keys_p, segment_bands(strides), per_band=True)
        mj_f = suggest_maxj(keys_p, segment_bands(strides, full=True),
                            half=False, per_band=True)
        packed, ok = tile_count_pairs(shi, skeys, strides, csq, MAXJ=mj_h)
        assert bool(ok), f"per-band count coverage MAXJ={mj_h}"
        check(f"tile_count_perband[{boxname}]",
              abs(combine_count(np.asarray(packed)) - n_ref) / n_ref, 0.0,
              extra=f"(integer-exact, MAXJ={mj_h})")
        f, ok = tile_pair_forces(shi, skeys, strides, csq, slo, MAXJ=mj_f)
        assert bool(ok), f"per-band forces coverage MAXJ={mj_f}"
        check(f"tile_forces_perband[{boxname}]",
              np.abs(np.asarray(f, np.float64) - f_ref).max() / fscale,
              2e-6)

        # round-3 maskless tile body (bandmask=False: distance filter
        # only over disjoint-trimmed windows) — the bench-mode fast
        # path, which interpret mode cannot vouch for (Mosaic lowering)
        packed, ok = tile_count_pairs(shi, skeys, strides, csq, MAXJ=24,
                                      bandmask=False)
        assert bool(ok)
        check(f"tile_count_maskless[{boxname}]",
              abs(combine_count(np.asarray(packed)) - n_ref) / n_ref, 0.0,
              extra="(integer-exact)")
        e, ok = tile_lj_rebuild_energy(hi, CUTOFF, MAXJ=24, bandmask=False,
                                       safe_term=False, kahan="program")
        assert bool(ok)
        check(f"tile_energy_maskless[{boxname}]",
              abs(float(e) - e_ref) / abs(e_ref), f32_tol)
        e, ok = tile_lj_rebuild_energy(hi, CUTOFF, lo, MAXJ=24,
                                       bandmask=False)
        assert bool(ok)
        check(f"tile_energy_maskless_split[{boxname}]",
              abs(float(e) - e_ref) / abs(e_ref), 2e-6)
        f, ok = tile_pair_forces(shi, skeys, strides, csq, MAXJ=24,
                                 bandmask=False, safe_term=False)
        assert bool(ok)
        check(f"tile_forces_maskless[{boxname}]",
              np.abs(np.asarray(f, np.float64) - f_ref32).max() / fscale,
              f32_tol)


        # differentiable potential: jax.grad == -forces ON HARDWARE
        from zelll_tpu.ops.autodiff import make_pair_potential

        f_ref_in32 = ref_forces(np.asarray(hi, np.float64), CUTOFF)
        for pname, pkw in [("lag", dict(M=4096, L=1024)),
                           ("tile", dict(MAXJ=24))]:
            pot = make_pair_potential(CUTOFF, path=pname, **pkw)
            (e, okp), g = jax.value_and_grad(pot, has_aux=True)(hi)
            assert bool(okp)
            check(f"pot_grad_{pname}[{boxname}]",
                  np.abs(np.asarray(g, np.float64) + f_ref_in32).max()
                  / fscale, f32_tol)

        grid = build(hi, CUTOFF)
        e = pair_sum(grid, lj, K=64, cutoff_sq=csq)
        check(f"xla_pair_sum[{boxname}]",
              abs(float(e) - e_ref) / abs(e_ref), f32_tol)

        if boxname == "thin":
            # mixed-species LJ through the payload kernels (round 10:
            # payload-parameterized gfn in the forces kernel) — f64
            # Lorentz-Berthelot brute force on the rounded coordinates
            from zelll_tpu.core.binning import bin_and_sort as _bas
            from zelll_tpu.ops.pallas_pairs import (
                pair_lag_forces as _plf,
                pair_lag_reduce as _plr,
            )
            from zelll_tpu.ops.potentials import lennard_jones_mixed

            mpot = lennard_jones_mixed((1.0, 0.5), (1.0, 1.2))
            spec = rng.integers(0, 2, N).astype(np.float32)
            mbins, mcols = _bas(
                jnp.concatenate([hi, jnp.asarray(spec)[:, None]], axis=1),
                CUTOFF, max_cells=1, need_perm=False,
            )
            msp, mpay = mcols[:, :3], mcols[:, 3:]
            me = _plr(msp, mbins.sorted_keys, mbins.info.strides, csq,
                      sorted_payload=mpay, term=mpot.term, M=4096, L=1024)
            mf = _plf(msp, mbins.sorted_keys, mbins.info.strides, csq,
                      sorted_payload=mpay, gfn=mpot.gfn, M=4096, L=1024)
            mp = np.asarray(msp, np.float64)
            ms = np.asarray(mpay[:, 0]).astype(int)
            md = mp[:, None] - mp[None]
            mdsq = (md * md).sum(-1)
            np.fill_diagonal(mdsq, np.inf)
            mm = mdsq < csq
            me_i = np.asarray([1.0, 0.5])[ms]
            msg_i = np.asarray([1.0, 1.2])[ms]
            me_ij = np.sqrt(me_i[:, None] * me_i[None])
            msg_ij = 0.5 * (msg_i[:, None] + msg_i[None])
            mx = np.where(mm, msg_ij**2 / np.where(mm, mdsq, 1.0), 0.0)
            mt = mx**3
            me_ref = float(np.where(np.triu(mm), 4 * me_ij * mt * (mt - 1),
                                    0.0).sum())
            mg = np.where(mm, 24 * me_ij * mt * (2 * mt - 1)
                          / np.where(mm, mdsq, 1.0), 0.0)
            mf_ref = (mg[..., None] * md).sum(axis=1)
            check(f"mixed_lj_energy[{boxname}]",
                  abs(float(me) - me_ref) / max(abs(me_ref), 1e-30),
                  f32_tol)
            check(f"mixed_lj_forces[{boxname}]",
                  np.abs(np.asarray(mf, np.float64) - mf_ref).max()
                  / (np.abs(mf_ref).max() + 1e-30), f32_tol)

        # virial (scalar pair term on both kernels) + fused stress
        # (one forces pass + r(x)f contraction) vs f64 brute force
        from zelll_tpu.ops.tile_pairs import tile_lj_rebuild_energy as _tre
        from zelll_tpu.ops.virial import (
            fused_stress_open,
            lj_virial_term,
            virial_rebuild,
        )

        # TWO oracles: f32 rows compare against the virial/stress of the
        # ROUNDED coordinates (hi promoted to f64 — coordinate rounding
        # cancels, isolating kernel error), split rows against the TRUE
        # f64 coordinates (the split planes reconstruct pts64, so an
        # hi-only oracle would misreport coordinate rounding as kernel
        # error — the round-1 virial_lag_split "failure" was exactly
        # this harness bug, not a kernel bug).
        def virial_stress_oracle(p64):
            d_o = p64[:, None] - p64[None, :]
            dsq_o = (d_o * d_o).sum(-1)
            np.fill_diagonal(dsq_o, np.inf)
            w_o = dsq_o < csq
            t_o = np.where(w_o, 1.0 / np.where(w_o, dsq_o, 1.0), 0.0) ** 3
            gv_o = np.where(w_o, 24 * t_o * (2 * t_o - 1), 0.0)  # g * dsq
            w_ref = float(gv_o.sum() / 2)
            vsc = max(abs(w_ref), np.abs(gv_o).sum() / 2, 1e-30)
            g_o = gv_o / np.where(w_o, dsq_o, 1.0)
            sig = np.einsum("ij,ija,ijb->ab", g_o, d_o, d_o) / 2
            return w_ref, vsc, sig, np.abs(sig).max() + 1e-30

        hi64 = np.asarray(hi, np.float64)
        w_ref_v, vscale, sig_ref, sscale = virial_stress_oracle(hi64)
        w_ref_v64, vscale64, sig_ref64, sscale64 = virial_stress_oracle(pts64)

        w, ok = virial_rebuild(hi, CUTOFF, M=4096, L=1024)
        assert bool(ok)
        check(f"virial_lag_f32[{boxname}]",
              abs(float(w) - w_ref_v) / vscale, f32_tol)

        w, ok = virial_rebuild(hi, CUTOFF, lo, M=4096, L=1024)
        assert bool(ok)
        check(f"virial_lag_split[{boxname}]",
              abs(float(w) - w_ref_v64) / vscale64, 2e-6)

        w, ok = _tre(hi, CUTOFF, MAXJ=24, term=lj_virial_term)
        assert bool(ok)
        check(f"virial_tile_f32[{boxname}]",
              abs(float(w) - w_ref_v) / vscale, f32_tol)

        w, ok = _tre(hi, CUTOFF, lo, MAXJ=24, term=lj_virial_term)
        assert bool(ok)
        check(f"virial_tile_split[{boxname}]",
              abs(float(w) - w_ref_v64) / vscale64, 2e-6)

        for spath, skw in [("lag", dict(M=4096, L=1024)),
                           ("tile", dict(MAXJ=24))]:
            # round 9: direct pair-sum stress kernels — terms bounded by
            # |g|*cutoff^2, so f32 rows inherit the coordinate bound and
            # split rows the 2e-6 split bound (the former forces-pass +
            # r (x) f contraction floored at ~3e-6 from box-scale
            # cancellation; its stress_tol is retired)
            sig, ok = fused_stress_open(hi, CUTOFF, path=spath, **skw)
            assert bool(ok)
            check(f"stress_{spath}_f32[{boxname}]",
                  np.abs(np.asarray(sig, np.float64) - sig_ref).max()
                  / sscale, f32_tol)

            sig, ok = fused_stress_open(
                hi, CUTOFF, path=spath, positions_lo=lo, **skw
            )
            assert bool(ok)
            check(f"stress_{spath}_split[{boxname}]",
                  np.abs(np.asarray(sig, np.float64) - sig_ref64).max()
                  / sscale64, 2e-6)

        # fused pair-distance histogram (split): cumulative counts vs the
        # f64 brute force. Bin-boundary ties under f32x2 distance rounding
        # can flip a handful of pairs between adjacent shells, so the
        # check is on the max cumulative deviation relative to the total,
        # not exact equality (Mosaic-class bugs are wholesale, not ±ulp).
        from zelll_tpu.ops.rdf import pair_distance_histogram

        edges = np.linspace(0.0, CUTOFF, 17)
        dall = spos64[:, None] - spos64[None, :]
        dist = np.sqrt((dall * dall).sum(-1))
        hist_ref, _ = np.histogram(
            dist[np.triu_indices(N, 1)], bins=edges
        )
        counts, ok = pair_distance_histogram(
            hi, edges, positions_lo=lo, M=4096, L=1024
        )
        assert bool(ok)
        cum = np.cumsum(np.asarray(counts, np.float64))
        cum_ref = np.cumsum(hist_ref.astype(np.float64))
        check(f"hist_split[{boxname}]",
              float(np.abs(cum - cum_ref).max()) / max(cum_ref[-1], 1),
              1e-4, extra=f"(total {int(cum_ref[-1])})")

        counts, ok = pair_distance_histogram(
            hi, edges, positions_lo=lo, path="tile", MAXJ=24
        )
        assert bool(ok)
        cum = np.cumsum(np.asarray(counts, np.float64))
        check(f"hist_tile_split[{boxname}]",
              float(np.abs(cum - cum_ref).max()) / max(cum_ref[-1], 1),
              1e-4)

        # PBC (ops.pbc): ghost-image extension over the unchanged lag
        # kernel — energy/count masked via the shift-sign payload plane,
        # forces via dropped ghost rows. Oracle: f64 minimum image.
        from zelll_tpu.ops.pbc import (
            pbc_count_pairs, pbc_lj_energy, pbc_lj_forces,
        )

        # the device's periodic length is the f32 box; the oracle must use
        # the same value, and points must sit strictly inside it (wrap of
        # an out-of-box particle is mod-rounded and not split-exact)
        boxa = np.asarray(box, np.float32).astype(np.float64)
        pts_p = rng.uniform(0, 1, (N, 3)) * boxa * (1 - 1e-6)
        hi_p = jnp.asarray(pts_p, jnp.float32)
        lo_p = jnp.asarray(pts_p - np.asarray(hi_p, np.float64), jnp.float32)
        dmi = pts_p[:, None] - pts_p[None, :]
        dmi -= boxa * np.round(dmi / boxa)
        dsq_mi = (dmi * dmi).sum(-1)
        np.fill_diagonal(dsq_mi, np.inf)
        wmi = dsq_mi < csq
        tmi = np.where(wmi, 1.0 / np.where(wmi, dsq_mi, 1.0), 0.0) ** 3
        e_mi = float(np.where(wmi, 4 * tmi * (tmi - 1), 0.0).sum() / 2)
        n_mi = int(wmi.sum()) // 2
        g_mi = np.where(wmi, 24 * tmi * (2 * tmi - 1)
                        / np.where(wmi, dsq_mi, 1.0), 0.0)
        f_mi = (g_mi[..., None] * dmi).sum(axis=1)
        fscale_mi = np.abs(f_mi).max() + 1e-30
        boxj = jnp.asarray(boxa, jnp.float32)
        org = jnp.zeros(3, jnp.float32)

        e, ok = pbc_lj_energy(hi_p, org, boxj, CUTOFF, M=4096, L=1024)
        assert bool(ok)
        check(f"pbc_energy_f32[{boxname}]",
              abs(float(e) - e_mi) / abs(e_mi), f32_tol)

        e, ok = pbc_lj_energy(hi_p, org, boxj, CUTOFF, M=4096, L=1024,
                              positions_lo=lo_p)
        assert bool(ok)
        check(f"pbc_energy_split[{boxname}]",
              abs(float(e) - e_mi) / abs(e_mi), 2e-6)

        cnt, ok = pbc_count_pairs(hi_p, org, boxj, CUTOFF, M=4096, L=1024,
                                  positions_lo=lo_p)
        assert bool(ok)
        check(f"pbc_count_split[{boxname}]",
              abs(cnt - n_mi) / n_mi, 1e-6)

        f, ok = pbc_lj_forces(hi_p, org, boxj, CUTOFF, M=4096, L=1024,
                              positions_lo=lo_p)
        assert bool(ok)
        check(f"pbc_forces_split[{boxname}]",
              np.abs(np.asarray(f, np.float64) - f_mi).max() / fscale_mi,
              2e-6)

        # PBC histogram: the shift-sign payload mask composes with the
        # hist kernel exactly like the energy term
        from zelll_tpu.ops.rdf import rdf, rdf_normalize

        edges_p = np.linspace(0.2, CUTOFF, 15)
        hmi, _ = np.histogram(
            np.sqrt(dsq_mi[np.triu_indices(N, 1)]), bins=edges_p
        )
        _, g_hw, ok = rdf(hi_p, org, boxj, edges_p, positions_lo=lo_p,
                          M=4096, L=1024)
        assert bool(ok)
        _, g_mi_ref = rdf_normalize(hmi, edges_p, N, float(boxa.prod()))
        cum_hw = np.cumsum(g_hw * np.diff(edges_p**3))
        cum_mi = np.cumsum(g_mi_ref * np.diff(edges_p**3))
        check(f"pbc_rdf_split[{boxname}]",
              float(np.abs(cum_hw - cum_mi).max())
              / max(abs(cum_mi[-1]), 1e-30), 1e-4)

        _, g_hw, ok = rdf(hi_p, org, boxj, edges_p, positions_lo=lo_p,
                          path="tile", MAXJ=24)
        assert bool(ok)
        cum_hw = np.cumsum(g_hw * np.diff(edges_p**3))
        check(f"pbc_rdf_tile_split[{boxname}]",
              float(np.abs(cum_hw - cum_mi).max())
              / max(abs(cum_mi[-1]), 1e-30), 1e-4)

        # tile path: payload plane on the packed blocks' free row
        e, ok = pbc_lj_energy(hi_p, org, boxj, CUTOFF, path="tile",
                              MAXJ=24, positions_lo=lo_p)
        assert bool(ok)
        check(f"pbc_energy_tile_split[{boxname}]",
              abs(float(e) - e_mi) / abs(e_mi), 2e-6)

        f, ok = pbc_lj_forces(hi_p, org, boxj, CUTOFF, path="tile",
                              MAXJ=24, positions_lo=lo_p)
        assert bool(ok)
        check(f"pbc_forces_tile_split[{boxname}]",
              np.abs(np.asarray(f, np.float64) - f_mi).max() / fscale_mi,
              2e-6)

        # in-kernel minimum image (round 9): narrow axes folded in the
        # lag kernel, no ghost rows for them — same oracle as the ghost
        # rows above. Only exercised where the box has narrow axes.
        from zelll_tpu.ops.pbc import minimage_axes

        if minimage_axes(boxa, CUTOFF).any():
            e, ok = pbc_lj_energy(hi_p, org, boxj, CUTOFF, M=4096, L=1024,
                                  minimage="auto")
            assert bool(ok)
            check(f"pbc_mi_energy_f32[{boxname}]",
                  abs(float(e) - e_mi) / abs(e_mi), f32_tol)
            e, ok = pbc_lj_energy(hi_p, org, boxj, CUTOFF, M=4096, L=1024,
                                  minimage="auto", positions_lo=lo_p)
            assert bool(ok)
            check(f"pbc_mi_energy_split[{boxname}]",
                  abs(float(e) - e_mi) / abs(e_mi), 2e-6)
            cnt, ok = pbc_count_pairs(hi_p, org, boxj, CUTOFF, M=4096,
                                      L=1024, minimage="auto",
                                      positions_lo=lo_p)
            assert bool(ok)
            check(f"pbc_mi_count_split[{boxname}]",
                  abs(cnt - n_mi) / n_mi, 1e-6)
            f, ok = pbc_lj_forces(hi_p, org, boxj, CUTOFF, M=4096, L=1024,
                                  minimage="auto", positions_lo=lo_p)
            assert bool(ok)
            check(f"pbc_mi_forces_split[{boxname}]",
                  np.abs(np.asarray(f, np.float64) - f_mi).max()
                  / fscale_mi, 2e-6)

        # PBC virial (sign-masked scalar term) + one-pass fused stress
        # (round 9: direct pair-sum stress kernel with the shift-sign
        # mask — same f32/split oracle split as the open-boundary rows)
        from zelll_tpu.ops.virial import pbc_stress_fused, pbc_virial

        def pbc_virial_stress_oracle(p64):
            dmo = p64[:, None] - p64[None, :]
            dmo -= boxa * np.round(dmo / boxa)
            dsqo = (dmo * dmo).sum(-1)
            np.fill_diagonal(dsqo, np.inf)
            wmo = dsqo < csq
            tmo = np.where(wmo, 1.0 / np.where(wmo, dsqo, 1.0), 0.0) ** 3
            gvo = np.where(wmo, 24 * tmo * (2 * tmo - 1), 0.0)
            w_ref = float(gvo.sum() / 2)
            vsc = max(abs(w_ref), np.abs(gvo).sum() / 2, 1e-30)
            go = gvo / np.where(wmo, dsqo, 1.0)
            sig = np.einsum("ij,ija,ijb->ab", go, dmo, dmo) / 2
            return w_ref, vsc, sig, np.abs(sig).max() + 1e-30

        hp64 = np.asarray(hi_p, np.float64)
        w_mi_ref, vscale_mi, sig_mi, sscale_mi = pbc_virial_stress_oracle(hp64)
        w_mi64, vscale_mi64, sig_mi64, sscale_mi64 = (
            pbc_virial_stress_oracle(pts_p)
        )

        for vpath, vkw in [("lag", dict(M=4096, L=1024)),
                           ("tile", dict(MAXJ=24))]:
            w, ok = pbc_virial(hi_p, org, boxj, CUTOFF, path=vpath, **vkw)
            assert bool(ok)
            check(f"pbc_virial_{vpath}_f32[{boxname}]",
                  abs(float(w) - w_mi_ref) / vscale_mi, f32_tol)
            w, ok = pbc_virial(hi_p, org, boxj, CUTOFF, path=vpath,
                               positions_lo=lo_p, **vkw)
            assert bool(ok)
            check(f"pbc_virial_{vpath}_split[{boxname}]",
                  abs(float(w) - w_mi64) / vscale_mi64, 2e-6)
            sig, ok = pbc_stress_fused(
                hi_p, org, boxj, CUTOFF, path=vpath, **vkw
            )
            assert bool(ok)
            check(f"pbc_stress_{vpath}_f32[{boxname}]",
                  np.abs(np.asarray(sig, np.float64) - sig_mi).max()
                  / sscale_mi, f32_tol)
            sig, ok = pbc_stress_fused(
                hi_p, org, boxj, CUTOFF, path=vpath, positions_lo=lo_p,
                **vkw
            )
            assert bool(ok)
            check(f"pbc_stress_{vpath}_split[{boxname}]",
                  np.abs(np.asarray(sig, np.float64) - sig_mi64).max()
                  / sscale_mi64, 2e-6)

        # min-image stress + RDF (round 9 completion: the folded
        # separation feeds the d_a d_b outer product / the bin compare)
        if minimage_axes(boxa, CUTOFF).any():
            sig, ok = pbc_stress_fused(
                hi_p, org, boxj, CUTOFF, M=4096, L=1024, minimage="auto",
            )
            assert bool(ok)
            check(f"pbc_mi_stress_f32[{boxname}]",
                  np.abs(np.asarray(sig, np.float64) - sig_mi).max()
                  / sscale_mi, f32_tol)
            sig, ok = pbc_stress_fused(
                hi_p, org, boxj, CUTOFF, M=4096, L=1024, minimage="auto",
                positions_lo=lo_p,
            )
            assert bool(ok)
            check(f"pbc_mi_stress_split[{boxname}]",
                  np.abs(np.asarray(sig, np.float64) - sig_mi64).max()
                  / sscale_mi64, 2e-6)
            _, g_hw, ok = rdf(hi_p, org, boxj, edges_p, positions_lo=lo_p,
                              M=4096, L=1024, minimage="auto")
            assert bool(ok)
            cum_hw = np.cumsum(g_hw * np.diff(edges_p**3))
            check(f"pbc_mi_rdf_split[{boxname}]",
                  float(np.abs(cum_hw - cum_mi).max())
                  / max(abs(cum_mi[-1]), 1e-30), 1e-4)

        if boxname == "cubic":
            # Verlet-skin PBC MD on the tile kernel vs the rebuild-every-
            # step trajectory, both ON HARDWARE: catches Mosaic-only
            # divergence in the composed loop (ghost parent tracking +
            # packed forces on reused grids). Lattice workload so the
            # trajectory is physical.
            from zelll_tpu.models.lj_md import MDState, md_run_skin_tile_pbc
            from zelll_tpu.ops.pbc import md_step_pbc, suggest_pbc_capacity

            k = max(2, int(round(N ** (1 / 3))))
            spacing = np.float32(boxa[0] / k)
            gl = np.stack(np.meshgrid(*([np.arange(k)] * 3),
                                      indexing="ij"), -1).reshape(-1, 3)
            pts_l = (gl * spacing + 0.5 * spacing).astype(np.float64)
            pts_l += rng.uniform(-0.03, 0.03, pts_l.shape) * spacing
            vel_l = rng.normal(0, 0.02 * spacing, pts_l.shape)
            box_l = np.asarray([k * spacing] * 3, np.float64)
            cut_l = float(spacing) * 1.2  # nearest neighbors interact
            dt_l, steps_l, skin_l = 1e-4, 6, 0.3 * float(spacing)
            p1 = jnp.asarray(pts_l, jnp.float32)
            v1 = jnp.asarray(vel_l, jnp.float32)
            orgl = jnp.zeros(3, jnp.float32)
            bxl = jnp.asarray(box_l, jnp.float32)
            for _ in range(steps_l):
                p1, v1, ok = md_step_pbc(p1, v1, orgl, bxl, cut_l, dt_l,
                                         path="tile", MAXJ=16)
                assert bool(ok)
            Bl, Gl = suggest_pbc_capacity(len(pts_l), box_l, cut_l + skin_l)
            st, ok, e_loop, nrb = md_run_skin_tile_pbc(
                MDState(positions=jnp.asarray(pts_l, jnp.float32),
                        velocities=jnp.asarray(vel_l, jnp.float32)),
                orgl, bxl, cut_l, dt_l, steps=steps_l, B=Bl, G=Gl,
                skin=skin_l, MAXJ=16,
            )
            assert bool(ok)
            ref_t = np.mod(np.asarray(p1, np.float64), box_l)
            got_t = np.mod(np.asarray(st.positions, np.float64), box_l)
            ref_t = ref_t[np.lexsort(ref_t.T)]
            got_t = got_t[np.lexsort(got_t.T)]
            check("pbc_skin_tile_md[cubic]",
                  float(np.abs(got_t - ref_t).max() / box_l[0]), 1e-6,
                  extra=f"rebuilds={int(nrb)}/{steps_l}")

    # SDF join kernel (ops.sdf_join) vs f64 numpy brute force: the
    # psssh-batch query path. Uses exps + rsqrt + the join windows —
    # a hardware-only failure here (e.g. a transcendental or dynamic-
    # slice lowering bug) is invisible to interpret mode.
    from zelll_tpu.models.sdf import SmoothDistanceField

    rngq = np.random.default_rng(7)
    natoms = 400
    r = 8.0 * rngq.random(natoms) ** (1 / 3)
    th = np.arccos(2 * rngq.random(natoms) - 1)
    ph = 2 * np.pi * rngq.random(natoms)
    apos = np.stack([r * np.sin(th) * np.cos(ph),
                     r * np.sin(th) * np.sin(ph), r * np.cos(th)], -1)
    radii = rngq.choice([1.7, 1.55, 1.52, 1.09], natoms)
    queries = rngq.uniform(-9, 9, (500, 3))
    sdf_cut = 4.0

    sdf = SmoothDistanceField(apos, radii, cutoff=sdf_cut, method="join")
    v, g, valid = sdf.evaluate(queries)

    dvec = queries[:, None, :] - apos[None, :, :]
    dsq = (dvec**2).sum(-1)
    within = dsq <= sdf_cut**2
    d = np.sqrt(np.where(within, dsq, 1.0))
    e1 = np.where(within, np.exp(-d / radii), 0.0)
    e3 = np.where(within, np.exp(-d), 0.0)
    S1 = e1.sum(1)
    S2 = (e3 * radii).sum(1)
    S3 = e3.sum(1)
    # guard empty queries (S1 = S3 = 0): masked out via `defined` below
    S1s = np.where(S1 > 0, S1, 1.0)
    S3s = np.where(S3 > 0, S3, 1.0)
    sig = S2 / S3s
    logS1 = np.log(S1s)
    v_ref = -sig * logS1
    u = dvec / d[..., None]
    A1 = ((e1 / radii)[..., None] * u).sum(1)
    A2 = ((e3 * radii)[..., None] * u).sum(1)
    A3 = (e3[..., None] * u).sum(1)
    g_ref = (logS1[:, None] * (A2 * S3[:, None] - S2[:, None] * A3)
             / (S3s**2)[:, None] + (sig / S1s)[:, None] * A1)

    defined = valid & (S3 > 0)
    # tolerance is set by the TPU's f32 transcendental approximations,
    # not the kernel: measured (round 6 diag) join == xla gather path ==
    # 3.43e-5 max rel, while an all-numpy f32 replica of the formula is
    # 1.6e-7 — the gap is exp/log lowering on hardware
    check("sdf_join_value",
          np.abs(v[defined] - v_ref[defined]).max()
          / np.abs(v_ref[defined]).max(), 1e-4)
    check("sdf_join_grad",
          np.abs(g[defined] - g_ref[defined]).max()
          / (np.abs(g_ref[defined]).max() + 1e-30), 1e-4)

    # generic join kernel (ops.join): counts must be integer-exact and
    # the min-reduce nearest distance must match f64 numpy brute force
    from zelll_tpu.core.grid import build as build_grid
    from zelll_tpu.ops.join import count_neighbors, nearest_dsq

    jgrid = build_grid(jnp.asarray(apos, jnp.float32), sdf_cut)
    cj, validj, okj = count_neighbors(jgrid, jnp.asarray(queries))
    ndj, _, okn = nearest_dsq(jgrid, jnp.asarray(queries))
    assert bool(okj) and bool(okn)
    # f32 coordinates can flip exact cutoff-boundary ties: bracket the
    # exact count between margins instead of requiring equality
    csq_j = sdf_cut**2
    ref_lo = (dsq <= csq_j * (1 - 1e-5)).sum(1)
    ref_hi = (dsq <= csq_j * (1 + 1e-5)).sum(1)
    cjn = np.asarray(cj)
    check("join_count",
          float(np.maximum(ref_lo - cjn, cjn - ref_hi).max()), 0.5)
    nd_ref = np.where(within, dsq, np.inf).min(1)
    has = np.isfinite(nd_ref)
    check("join_nearest",
          np.abs(np.sqrt(np.asarray(ndj)[has]) - np.sqrt(nd_ref[has])).max()
          / np.sqrt(nd_ref[has]).max(), 1e-5)

    # windowed join kernel (MAXJ DMA windows instead of VMEM residency):
    # must reproduce the resident kernel bit-for-bit on the same data —
    # covers the manual-DMA path, which has its own Mosaic failure modes
    from zelll_tpu.ops.join import grid_join_reduce

    def _cnt_term(dsq_t, d_t, p_t, within_t):
        return [within_t.astype(dsq_t.dtype)]

    MAXJ, okw = 4, False
    while not okw:
        cw, _, okw = grid_join_reduce(
            jgrid, jnp.asarray(queries), term=_cnt_term, n_out=1,
            MAXJ=MAXJ)
        okw, MAXJ = bool(okw), MAXJ * 2
        assert MAXJ <= 256, "windowed ladder failed to converge"
    check("join_count_windowed",
          float(np.abs(np.asarray(cw)[:, 0] - cjn).max()), 0.0,
          extra="(== resident)")

    n_fail = sum(1 for *_, ok in results if not ok)
    print(f"{len(results) - n_fail}/{len(results)} PASS", flush=True)
    out = os.environ.get("OUT")
    if out:
        with open(out, "w") as fh:
            fh.write("path,rel_err,tol,pass\n")
            for name, err, tol, ok in results:
                fh.write(f"{name},{err:.6e},{tol:.1e},{int(ok)}\n")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
