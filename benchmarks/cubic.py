#!/usr/bin/env python
"""Cubic-box benchmark: full rebuild + LJ over a 100^3-cell cube.

The geometry where plain sorted-order windows degenerate (a full z-layer
between partner rows); runs the segment-tile kernel (ops/tile_pairs.py,
default) or the column decomposition (ops/columns.py, CUBIC_PATH=columns)
at the headline density (10 particles per cutoff^3).

Usage: python benchmarks/cubic.py [n=1e7]
Env: CUBIC_PATH=tile|columns, CUBIC_MAXJ, CUBIC_T/M/L (columns path)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    path = os.environ.get("CUBIC_PATH", "tile")
    cutoff = 10.0
    side = (n / 0.01) ** (1 / 3)

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    import jax.numpy as jnp

    from zelll_tpu.ops.pallas_pairs import combine_count, count_term
    from zelll_tpu.utils.profiling import device_time, measure_rtt

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, side, (n, 3))
    pos = jax.device_put(jnp.asarray(pts, jnp.float32))
    rtt = measure_rtt()

    if path == "tile":
        mj_env = os.environ.get("CUBIC_MAXJ", "12")
        CBK = int(os.environ.get("CUBIC_CB", "8"))
        from zelll_tpu.ops.tile_pairs import tile_lj_rebuild_energy

        if mj_env == "auto":
            # per-band capacities measured on this data (host sync once;
            # the bands' needs differ ~6x, so this cuts DMA bytes vs one
            # shared worst-case window)
            from zelll_tpu.core.binning import bin_and_sort
            from zelll_tpu.ops.pallas_pairs import _pad_and_desentinel
            from zelll_tpu.ops.segments import (
                CHUNK, segment_bands, suggest_maxj,
            )

            bins, _ = bin_and_sort(
                pos, cutoff, max_cells=1, need_perm=False, auto_order=True
            )
            C = max(-(-n // (CHUNK * CBK)) * CBK, CBK) * CHUNK
            MAXJ = suggest_maxj(
                _pad_and_desentinel(bins.sorted_keys, C),
                segment_bands(bins.info.strides), per_band=True,
            )
            del bins
        else:
            MAXJ = int(mj_env)


        # round-3 tile-body knobs (defaults = the fast maskless path;
        # set CUBIC_BANDMASK=1 to restore the key-band compare). The
        # round-4 halfpack kernel family was pruned in round 13
        # (measured loss; write-up in DESIGN_NOTES round 12).
        bandmask = os.environ.get("CUBIC_BANDMASK", "0") == "1"
        safe_term = os.environ.get("CUBIC_SAFE", "0") == "1"
        kah = os.environ.get("CUBIC_KAHAN", "0")
        kah = {"0": False, "1": True, "program": "program"}[kah]

        c, ok = tile_lj_rebuild_energy(
            pos, cutoff, MAXJ=MAXJ, CB=CBK,
            term=count_term, out_dtype=jnp.int32,
        )
        npairs = combine_count(np.asarray(c))
        assert bool(ok), "tile coverage failed — raise CUBIC_MAXJ"
        if not bandmask:
            # maskless precondition + hardware cross-check: pair count
            # must match the masked all-tile kernel
            c2, ok2 = tile_lj_rebuild_energy(
                pos, cutoff, MAXJ=MAXJ, CB=CBK,
                term=count_term, out_dtype=jnp.int32, bandmask=False,
            )
            assert bool(ok2), "maskless coverage failed"
            n2 = combine_count(np.asarray(c2))
            assert n2 == npairs, (npairs, n2)

        from zelll_tpu.ops.pallas_pairs import lj_term, lj_term_fast

        fterm = (lj_term_fast if os.environ.get("CUBIC_FAST_TERM", "1") == "1"
                 else lj_term)

        def f(p, i):
            e, _ = tile_lj_rebuild_energy(
                p + (i % 2).astype(p.dtype) * 1e-6, cutoff,
                MAXJ=MAXJ, CB=CBK, kahan=kah, term=fterm,
                bandmask=bandmask, safe_term=safe_term,
            )
            return e

        mj_json = list(MAXJ) if isinstance(MAXJ, tuple) else MAXJ
        extra = (f'"MAXJ": {mj_json}, "CB": {CBK}, '
                 f'"bandmask": {int(bandmask)}, "safe": {int(safe_term)}')
    else:
        T = int(os.environ.get("CUBIC_T", "3"))
        M = int(os.environ.get("CUBIC_M", "16384"))
        L = int(os.environ.get("CUBIC_L", "1024"))
        from zelll_tpu.ops.columns import column_pair_sum

        c, ok = column_pair_sum(
            pos, cutoff, T=T, M=M, L=L, term=count_term, out_dtype=jnp.int32
        )
        npairs = combine_count(c)
        assert bool(ok), "column coverage failed"

        def f(p, i):
            e, _ = column_pair_sum(
                p + (i % 2).astype(p.dtype) * 1e-6, cutoff, T=T, M=M, L=L
            )
            return e

        extra = f'"T": {T}, "M": {M}, "L": {L}'

    dt = device_time(f, pos, reps=5, rtt=rtt)
    print(
        f'{{"metric": "cubic_lj_pairs_per_sec_full_rebuild_n{n:.0e}", '
        f'"value": {npairs / dt:.6g}, "unit": "pairs/s", '
        f'"step_ms": {dt * 1e3:.1f}, "pairs": {npairs}, '
        f'"box_cells": {int(side / cutoff)}, "path": "{path}", {extra}}}'
    )


if __name__ == "__main__":
    main()
