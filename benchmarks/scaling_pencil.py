#!/usr/bin/env python
"""Pencil-vs-slab scaling on the virtual CPU mesh (round 4; the
multi-chip analogue of the reference's 1..16-thread rayon sweep,
benches/iters.rs:80-103).

CPU wall time through interpret-mode kernels is meaningless as a TPU
proxy; the quantity that IS exact on the virtual mesh — and the reason
pencils exist — is the COMMUNICATION VOLUME: the number of particle rows
within one cutoff of an internal domain boundary, which each step must
ship over ICI. On a cubic box, slabs cut (d-1) full cross-sections
(boundary rows ~ (d-1) * n^(2/3)-ish per cut growing with n), while an
(a x b) pencil mesh cuts (a-1) z-planes + b-1 y-column boundaries per
slab with smaller total area once d is large.

Emits CSV: devices, decomp, shape, n, halo_rows (exact, both sides of
every internal boundary), halo_bytes (16 B/row: 3 f32 coords + key),
frac_of_n, step_ms (one interpret-mode MD step on the virtual mesh at
the SMALL n only — sanity that both paths run, not a perf claim).

Usage: python benchmarks/scaling_pencil.py [out.csv] [n_volume=1000000]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def halo_rows_slab(pts, cutoff, d, major):
    """Rows within cutoff of the d-1 internal slab boundaries (slot-
    granular split of the major-sorted order -> boundary values are the
    split rows' major coordinates)."""
    import numpy as np

    z = np.sort(pts[:, major])
    n = len(z)
    cuts = [z[(-(-n * i // d)) - 1] for i in range(1, d)]
    total = 0
    for c in cuts:
        total += int(((z >= c - cutoff) & (z <= c + cutoff)).sum())
    return total


def halo_rows_pencil(pts, cutoff, shape, major, mid):
    """Rows within cutoff of internal pencil boundaries: (a-1) z-planes
    (full cross sections) + per z-slab, (b-1) y-column cell boundaries
    (cell-granular, shared across slabs like partition_by_pencil)."""
    import numpy as np

    a, b = shape
    n = len(pts)
    order = np.argsort(pts[:, major], kind="stable")
    z = pts[order, major]
    y = pts[order, mid]
    zsplit = [(-(-n * i // a)) for i in range(1, a)]
    total = 0
    for s in zsplit:
        c = z[s - 1]
        total += int(((z >= c - cutoff) & (z <= c + cutoff)).sum())
    # global y-cell split points at ~equal counts (partition_by_pencil)
    y0 = y.min()
    ycell = np.floor((y - y0) / cutoff).astype(int)
    nyc = ycell.max() + 1
    hist = np.bincount(ycell, minlength=nyc)
    cum = np.cumsum(hist)
    for j in range(1, b):
        split_cell = int(np.searchsorted(cum, j * n / b) + 1)
        edge = y0 + split_cell * cutoff
        total += int(((y >= edge - cutoff) & (y <= edge + cutoff)).sum())
    return total


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "benchmarks/scaling_virtual_r4.csv"
    n_vol = int(float(sys.argv[2])) if len(sys.argv) > 2 else 1_000_000

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import time

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    cutoff = 10.0
    rows = ["devices,decomp,shape,n,halo_rows,halo_bytes,frac_of_n,step_ms"]
    rng = np.random.default_rng(0)

    # ---- exact halo volumes on a big cubic cloud (host-side) ----
    side = (n_vol / 0.01) ** (1 / 3)
    pts = rng.uniform(0, side, (n_vol, 3))
    major, mid = 2, 1  # cubic: any; match auto-order's stable argsort
    configs = [
        (2, "slab", (2,)), (2, "pencil", (2, 1)),
        (4, "slab", (4,)), (4, "pencil", (2, 2)),
        (8, "slab", (8,)), (8, "pencil", (4, 2)),
        (8, "pencil", (2, 4)),
    ]
    for d, decomp, shape in configs:
        if decomp == "slab":
            hr = halo_rows_slab(pts, cutoff, d, major)
        else:
            hr = halo_rows_pencil(pts, cutoff, shape, major, mid)
        rows.append(
            f"{d},{decomp},{'x'.join(map(str, shape))},{n_vol},{hr},"
            f"{hr * 16},{hr / n_vol:.4f},"
        )
        print(rows[-1], flush=True)

    # ---- one wall-time sanity leg per path (interpret mode, small n) --
    n_small = 48_000
    side_s = (n_small / 0.01) ** (1 / 3)
    pts_s = rng.uniform(0, side_s, (n_small, 3)).astype(np.float32)

    from zelll_tpu.parallel import (
        make_mesh, partition_by_slab, sharded_md_step,
    )
    from zelll_tpu.parallel.pencil import (
        make_pencil_mesh, partition_by_pencil, sharded_pencil_md_step,
    )

    mesh = make_mesh(8)
    parts, n_local = partition_by_slab(pts_s, cutoff, 8)
    pos = jax.device_put(jnp.asarray(parts),
                         NamedSharding(mesh, P("z", None)))
    vel = jax.device_put(jnp.zeros_like(pos),
                         NamedSharding(mesh, P("z", None)))
    step = sharded_md_step(mesh, cutoff=cutoff, H=min(4500, n_local),
                           K=64, chunk=64, dt=1e-6)
    o = step(pos, vel)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = step(pos, vel)
    jax.block_until_ready(o)
    t_slab = (time.perf_counter() - t0) * 1e3
    assert bool(o[3]), "slab coverage failed"
    hr = halo_rows_slab(pts_s.astype(np.float64), cutoff, 8, major)
    rows.append(f"8,slab,8,{n_small},{hr},{hr * 16},{hr / n_small:.4f},"
                f"{t_slab:.1f}")
    print(rows[-1], flush=True)

    pmesh = make_pencil_mesh((4, 2))
    pparts, pn_local, mb, nr = partition_by_pencil(pts_s, cutoff, (4, 2))
    ppos = jax.device_put(jnp.asarray(pparts),
                          NamedSharding(pmesh, P(("z", "y"), None)))
    pvel = jax.device_put(jnp.zeros_like(ppos),
                          NamedSharding(pmesh, P(("z", "y"), None)))
    # cubic boxes degenerate the lag window: use the segment-tile
    # backend across the mesh (round-12 use_tile)
    pstep = sharded_pencil_md_step(
        pmesh, cutoff=cutoff, HZ=min(4500, pn_local), HY=8192, dt=1e-6,
        MAXJ=32, use_tile=True, interpret=True,
    )
    o = pstep(ppos, pvel, mb, nr)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = pstep(ppos, pvel, mb, nr)
    jax.block_until_ready(o)
    t_pen = (time.perf_counter() - t0) * 1e3
    assert bool(o[3]), "pencil coverage failed"
    hr = halo_rows_pencil(pts_s.astype(np.float64), cutoff, (4, 2),
                          major, mid)
    rows.append(f"8,pencil,4x2,{n_small},{hr},{hr * 16},"
                f"{hr / n_small:.4f},{t_pen:.1f}")
    print(rows[-1], flush=True)

    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
