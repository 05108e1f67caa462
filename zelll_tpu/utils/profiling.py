"""Profiling harness: the TPU analogue of the reference's cache-miss and
criterion instrumentation (examples/cachemisses.rs, scripts/cachemisses.sh).

Instead of valgrind cache counters, the meaningful hardware counters on TPU
are wall time per pipeline stage, achieved HBM bandwidth and FLOP rates.
`stage_report` times each stage of the build -> reduce pipeline device-side
(amortizing the dispatch tunnel RTT) and emits CSV; `trace` wraps
`jax.profiler` for deep dives (view with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["device_time", "stage_report", "trace",
           "device_memory_peak", "hbm_row"]


def measure_rtt():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    float(f(x)[0])
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(f(x)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def device_time(fn, *args, reps: int = 10, rtt: float | None = None):
    """Median per-iteration device time of ``fn(*args, i)`` run ``reps``
    times inside one jitted fori_loop (defeats per-dispatch RTT; the
    callable receives the loop index so it can perturb inputs against
    loop-invariant hoisting)."""
    import jax
    import jax.numpy as jnp

    if rtt is None:
        rtt = measure_rtt()

    @jax.jit
    def loop(*args):
        def body(i, acc):
            r = fn(*args, i)
            leaf = jax.tree_util.tree_leaves(r)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))
    return max(time.perf_counter() - t0 - rtt, 0.0) / reps


def stage_report(n: int = 1_000_000, cutoff: float = 10.0, reps: int = 10):
    """Per-stage timing CSV for the benchmark workload at size n.

    Stages: keys (AABB + flat cell keys), sort (multi-operand), table
    (occupied-cell CSR scatter), fused LJ (lag kernel), full step.
    """
    import jax
    import jax.numpy as jnp

    from ..core.binning import bin_and_sort, build_bins, compute_keys
    from ..core.geometry import GridInfo, aabb_from_positions
    from ..ops.fused import fused_lj_rebuild_energy
    from .datagen import generate_points_random, lj_box

    pts = generate_points_random(n, lj_box(n, cutoff))
    pos = jax.device_put(jnp.asarray(pts, jnp.float32))
    rtt = measure_rtt()

    def jitter(p, i):
        return p + (i % 2).astype(p.dtype) * 1e-6

    def keys_stage(p, i):
        p = jitter(p, i)
        info = GridInfo.create(aabb_from_positions(p), cutoff)
        return compute_keys(p, info)

    def sort_stage(p, i):
        p = jitter(p, i)
        bins, sp = bin_and_sort(p, cutoff, max_cells=1)
        return sp

    def table_stage(p, i):
        p = jitter(p, i)
        return build_bins(p, cutoff).cell_counts

    M = 8192 if n >= 1_000_000 else 1024

    def full_stage(p, i):
        p = jitter(p, i)
        e, ok = fused_lj_rebuild_energy(p, cutoff, M=M, L=256)
        return e

    rows = [("stage", "ms")]
    for name, fn in [
        ("keys", keys_stage),
        ("keys+sort", sort_stage),
        ("keys+sort+table", table_stage),
        ("full_rebuild_lj", full_stage),
    ]:
        dt = device_time(fn, pos, reps=reps, rtt=rtt)
        rows.append((name, f"{dt * 1e3:.3f}"))
        print(f"{name},{dt * 1e3:.3f}", flush=True)

    # derived estimates
    bytes_sorted = 5 * 4 * n  # key + 3 coords + id
    print(f"# n={n} sort payload ~{bytes_sorted / 1e6:.0f} MB", flush=True)
    return rows


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/zelll_tpu_trace"):
    """jax.profiler trace context (open with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_peak():
    """Peak live HBM bytes on device 0 (the massif/Mbytes analogue of the
    reference's memory instrumentation, README.md:100-103 and the
    more_benches.sh Mbytes column). Returns -1 when the backend does not
    expose memory_stats (e.g. the CPU interpreter)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("peak_bytes_in_use", -1))
    except Exception:
        return -1


def hbm_row(stage: str, n: int, variant: str, seconds: float,
            logical_bytes: int, extra: str = "", live_bytes: int = -1):
    """One CSV row of the HBM report (the cachemisses.sh analogue): the
    logical operand traffic of the stage (bytes read + written at the
    jit boundary, the TPU translation of the Dr/Dw counters) and the
    achieved bandwidth logical_bytes / time. XLA's internal passes
    (sort rounds, fusion temporaries) move more than the logical bytes;
    the logical number is the lower bound a perfect fusion would hit,
    so achieved-GB/s close to HBM peak means the stage is memory-bound
    and fused well, far below peak means compute-bound (the pair
    kernels) or pass-dominated (the sort).

    Rows whose time is below ~4 dispatch-quantum microseconds are
    latency-bound (the reference's small-n repeats measure the same
    effect); their bandwidth column is left empty rather than printing
    an absurd number. ``live_bytes`` is the ANALYTIC peak working set
    (arrays alive at once); the axon PJRT plugin does not expose
    memory_stats, so `device_memory_peak` returns -1 through the tunnel
    and the analytic column is the massif/Mbytes analogue."""
    if seconds * 1e3 < 0.02:
        gb = ""
    else:
        gb = f"{logical_bytes / max(seconds, 1e-12) / 1e9:.2f}"
    peak = device_memory_peak()
    return (f"{stage},{n},{variant},{seconds * 1e3:.3f},"
            f"{logical_bytes},{gb},{peak},{live_bytes},{extra}")
