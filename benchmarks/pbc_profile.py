#!/usr/bin/env python
"""Stage profile of cubic-box PBC (tile path) at bench scale: where does
the 1.6x-over-open overhead live? Times (a) pbc_extend alone, (b)
extend + bin sort, (c) the full energy in both tile-body modes.

Env: PBC_N (default 1e7), PBC_REPS (default 3), PBC_MAXJ (default 12).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
import jax.numpy as jnp

from zelll_tpu.core.binning import bin_and_sort
from zelll_tpu.ops.pbc import pbc_extend, pbc_lj_energy, suggest_pbc_capacity
from zelll_tpu.utils.profiling import device_time, measure_rtt

N = int(float(os.environ.get("PBC_N", "1e7")))
REPS = int(os.environ.get("PBC_REPS", "3"))
MAXJ = int(os.environ.get("PBC_MAXJ", "12"))
CUTOFF = 10.0


def main():
    side = (N / 0.01) ** (1 / 3)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, side, (N, 3)).astype(np.float32)
    pos = jax.device_put(jnp.asarray(pts))
    box = np.full(3, side, np.float32)
    origin = np.zeros(3, np.float32)
    B, G, BE = suggest_pbc_capacity(N, box, CUTOFF, with_multi=True)
    print(f"n={N} B={B} G={G} BE={BE} ({G/N:.3f} n)")
    rtt = measure_rtt()

    if os.environ.get("PBC_MICRO", "0") == "1":
        # micro-breakdown inside pbc_extend: where do the 79 ms live?
        from zelll_tpu.ops.pbc import wrap_positions

        def wrap_s(p, i):
            pp = p + (i % 2).astype(p.dtype) * 1e-6
            pos2 = wrap_positions(pp, origin, box)
            s = ((pos2 >= origin) & (pos2 < origin + CUTOFF)).astype(
                jnp.int32
            ) - (
                (pos2 >= origin + box - CUTOFF) & (pos2 < origin + box)
            ).astype(jnp.int32)
            return pos2.sum() + s.sum()

        t = device_time(wrap_s, pos, reps=REPS, rtt=rtt)
        print(f"wrap + boundary classify: {t*1e3:.1f} ms")

        def stage1(p, i):
            pp = p + (i % 2).astype(p.dtype) * 1e-6
            near = jnp.any(
                (pp < origin + CUTOFF) | (pp >= origin + box - CUTOFF),
                axis=1,
            )
            key1 = (~near).astype(jnp.int32)
            iota = jnp.arange(N, dtype=jnp.int32)
            out = jax.lax.sort((key1, iota), num_keys=1, is_stable=False)
            return out[1][:B].sum()

        t = device_time(stage1, pos, reps=REPS, rtt=rtt)
        print(f"stage-1 2-op n-sort alone: {t*1e3:.1f} ms")

    def ext_only(p, i):
        ext, _, w, valid, ok = pbc_extend(
            p + (i % 2).astype(p.dtype) * 1e-6, origin, box, CUTOFF,
            B=B, G=G, BE=BE,
        )
        return ext.sum() + w.sum()

    t = device_time(ext_only, pos, reps=REPS, rtt=rtt)
    print(f"pbc_extend: {t*1e3:.1f} ms")

    def ext_bin(p, i):
        ext, _, w, valid, ok = pbc_extend(
            p + (i % 2).astype(p.dtype) * 1e-6, origin, box, CUTOFF,
            B=B, G=G, BE=BE,
        )
        bins, sc = bin_and_sort(
            jnp.concatenate([ext, w[:, None]], axis=1), CUTOFF,
            max_cells=1, need_perm=False, valid=valid, auto_order=True,
        )
        return sc.sum()

    t = device_time(ext_bin, pos, reps=REPS, rtt=rtt)
    print(f"pbc_extend + bin sort: {t*1e3:.1f} ms")

    for bm in (True, False):
        def full(p, i, bm=bm):
            e, ok = pbc_lj_energy(
                p + (i % 2).astype(p.dtype) * 1e-6, origin, box, CUTOFF,
                B=B, G=G, BE=BE, path="tile", MAXJ=MAXJ, bandmask=bm,
                kahan=False,
            )
            return e

        t = device_time(full, pos, reps=REPS, rtt=rtt)
        print(f"full energy (bandmask={int(bm)}): {t*1e3:.1f} ms")
        e, ok = pbc_lj_energy(pos, origin, box, CUTOFF, B=B, G=G, BE=BE,
                              path="tile", MAXJ=MAXJ, bandmask=bm)
        print(f"  ok={bool(ok)} e={float(e):.6g}")


if __name__ == "__main__":
    main()
