"""Pair enumeration over the cell grid: the hot path.

The reference enumerates candidate pairs lazily per cell (zelll
`src/cellgrid/iters.rs:218-241`): triangular pairs within each cell plus the
cartesian product with the 13-cell *half-space* stencil, each unordered pair
emitted exactly once. On TPU the same candidate set is produced as masked
dense blocks:

* cells are processed in fixed-size chunks (a `lax.scan` over the occupied-
  cell table) so peak memory never materializes the full pair list — the
  blockwise analogue of the reference's lazy iterators;
* each cell contributes a padded *bucket* of up to K particles. Because
  particles are sorted by cell key, a bucket is a contiguous window
  ``sorted_pos[start : start + K]`` — no bucket array is ever materialized;
* neighbor cells are found by vectorized binary search (`searchsorted`) of
  ``cell_key + offset`` in the ascending occupied-cell table — the TPU
  equivalent of the reference's 13 hashmap lookups per cell
  (iters.rs:197-214);
* uniqueness: intra-cell pairs are the k1 < k2 triangle, inter-cell pairs
  use the half stencil; every unordered pair appears exactly once, mirroring
  iters.rs:29-37 and :58-63.

`pair_sum` / `pair_forces` fuse the user interaction into the enumeration so
pair lists never hit HBM; `materialize_pairs` exists for API parity and
testing.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .geometry import full_stencil, half_stencil
from .grid import CellGridData

__all__ = [
    "PairBlock",
    "QueryResult",
    "scan_cell_chunks",
    "pair_sum",
    "pair_forces",
    "pair_stress",
    "count_pairs",
    "materialize_pairs",
    "query_neighbors",
]


def _dsq(a, b):
    """Squared distance with the spatial axis unrolled.

    XLA:TPU lowers ``((a - b) ** 2).sum(-1)`` over a minor dim of 3 by
    materializing the full difference tensor (measured ~8x slower at
    scale); per-axis accumulation fuses cleanly.
    """
    dim = a.shape[-1]
    d0 = a[..., 0] - b[..., 0]
    total = d0 * d0
    for ax in range(1, dim):
        d = a[..., ax] - b[..., ax]
        total = total + d * d
    return total


def _gather_window(grid: CellGridData, starts, counts, K: int):
    """Padded bucket gather: contiguous K-window per cell slice.

    Returns (pos, slots, mask) with shapes (..., K, N), (..., K), (..., K).
    Masked slots point at `n` (dropped by scatter) and their coordinates are
    garbage — callers must apply `mask`.
    """
    n = grid.n
    k_iota = jnp.arange(K, dtype=jnp.int32)
    slots = starts[..., None] + k_iota
    mask = k_iota < counts[..., None]
    gslots = jnp.where(mask, slots, 0)
    pos = grid.sorted_pos[gslots]
    slots = jnp.where(mask, slots, n)
    return pos, slots, mask


def _neighbor_rows(grid: CellGridData, rows, stencil):
    """Occupied-cell table rows of stencil neighbors, or max_cells if empty.

    Vectorized binary search over the ascending ``cell_keys`` table — the
    analogue of the reference's per-cell hashmap lookups (iters.rs:197-214).
    """
    b = grid.bins
    mc = b.max_cells
    qkeys = b.cell_keys[rows][..., None] + stencil
    pos = jnp.searchsorted(b.cell_keys, qkeys).astype(jnp.int32)
    cpos = jnp.clip(pos, 0, mc - 1)
    found = b.cell_keys[cpos] == qkeys
    return jnp.where(found, cpos, mc)


@dataclasses.dataclass
class PairBlock:
    """One chunk of candidate-pair structure handed to reduction bodies.

    Shapes: B = cells per chunk, K = bucket capacity, S = stencil size.
    ``own_*``: (B, K, ...) the chunk cells' own particles.
    ``nb_*``: (B, S*K, ...) particles of the stencil neighbor cells.
    ``row_valid``: (B,) whether the row is a real occupied cell.
    """

    own_pos: jax.Array
    own_slots: jax.Array
    own_mask: jax.Array
    nb_pos: jax.Array
    nb_slots: jax.Array
    nb_mask: jax.Array
    row_valid: jax.Array

    def intra_dsq(self):
        """(B, K, K) squared distances + unique-pair mask (k1 < k2)."""
        dsq = _dsq(self.own_pos[:, :, None, :], self.own_pos[:, None, :, :])
        K = self.own_mask.shape[-1]
        tri = jnp.tril(jnp.ones((K, K), jnp.bool_), -1).T  # strictly upper
        mask = (
            tri
            & self.own_mask[:, :, None]
            & self.own_mask[:, None, :]
            & self.row_valid[:, None, None]
        )
        return dsq, mask

    def inter_dsq(self):
        """(B, K, S*K) squared distances own x neighbors + mask."""
        dsq = _dsq(self.own_pos[:, :, None, :], self.nb_pos[:, None, :, :])
        mask = (
            self.own_mask[:, :, None]
            & self.nb_mask[:, None, :]
            & self.row_valid[:, None, None]
        )
        return dsq, mask


def scan_cell_chunks(
    grid: CellGridData,
    body: Callable,
    init,
    *,
    K: int,
    chunk: int = 256,
    half: bool = True,
    dense: "DenseTable | None" = None,
):
    """Scan ``body(carry, PairBlock) -> carry`` over occupied-cell chunks.

    This is the blockwise streaming skeleton: VMEM-sized chunks of the pair
    structure are produced and consumed without materializing the whole
    candidate set (the long-context analogue noted in SURVEY §5).

    ``dense`` switches neighbor-cell lookup from binary search to the
    dense key-indexed table (`core.dense.DenseTable`) — the wired form of
    the reference's sparse-vs-dense `GridStorage` axis (storage.rs:172-302).
    Check ``dense.fits`` alongside the usual capacity flags.
    """
    b = grid.bins
    mc = b.max_cells
    stencil = half_stencil(grid.info) if half else full_stencil(grid.info)
    S = stencil.shape[0]
    nchunks = math.ceil(mc / chunk)

    def step(carry, ci):
        rows = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
        row_valid = rows < b.num_cells
        rows = jnp.minimum(rows, mc - 1)

        own_starts = b.cell_starts[rows]
        own_counts = jnp.where(row_valid, b.cell_counts[rows], 0)
        own_pos, own_slots, own_mask = _gather_window(grid, own_starts, own_counts, K)

        if dense is not None:
            from .dense import dense_rows_for_keys

            qkeys = b.cell_keys[rows][..., None] + stencil
            nrows = dense_rows_for_keys(dense, qkeys, mc)  # (B, S)
        else:
            nrows = _neighbor_rows(grid, rows, stencil)  # (B, S)
        nb_found = nrows < mc
        gn = jnp.where(nb_found, nrows, 0)
        nb_starts = b.cell_starts[gn]
        nb_counts = jnp.where(nb_found, b.cell_counts[gn], 0)
        nb_pos, nb_slots, nb_mask = _gather_window(grid, nb_starts, nb_counts, K)

        block = PairBlock(
            own_pos=own_pos,
            own_slots=own_slots,
            own_mask=own_mask,
            nb_pos=nb_pos.reshape(chunk, S * K, -1),
            nb_slots=nb_slots.reshape(chunk, S * K),
            nb_mask=nb_mask.reshape(chunk, S * K),
            row_valid=row_valid,
        )
        return body(carry, block), None

    carry, _ = jax.lax.scan(step, init, jnp.arange(nchunks, dtype=jnp.int32))
    return carry


def pair_sum(
    grid: CellGridData,
    fn: Callable,
    *,
    K: int,
    chunk: int = 256,
    cutoff_sq=None,
    accum_dtype=None,
    dense=None,
):
    """Sum ``fn(dsq)`` over all unique candidate pairs (optionally distance
    filtered) without materializing a pair list.

    The fused equivalent of ``cg.particle_pairs().filter(dist).map(fn).sum()``
    in the reference's LJ benchmark (benches/lj.rs:81-93).
    """
    dtype = accum_dtype or grid.sorted_pos.dtype

    def term(dsq, mask):
        if cutoff_sq is not None:
            mask = mask & (dsq < cutoff_sq)
        safe = jnp.where(mask, dsq, jnp.ones_like(dsq))
        vals = fn(safe).astype(dtype)
        return jnp.sum(jnp.where(mask, vals, 0))

    def body(acc, blk: PairBlock):
        dsq_a, m_a = blk.intra_dsq()
        dsq_e, m_e = blk.inter_dsq()
        return acc + term(dsq_a, m_a) + term(dsq_e, m_e)

    return scan_cell_chunks(
        grid, body, jnp.zeros((), dtype), K=K, chunk=chunk, half=True,
        dense=dense,
    )


def pair_forces(
    grid: CellGridData,
    gfn: Callable,
    *,
    K: int,
    chunk: int = 256,
    cutoff_sq=None,
    dense=None,
):
    """Per-particle pairwise forces, input particle order.

    For each unique pair (i, j): ``f_i += (p_i - p_j) * gfn(dsq)`` and
    ``f_j -= ...`` (Newton's third law — half-space enumeration sees each
    pair once). ``gfn(dsq)`` must return the scalar factor such that the
    force is that factor times the separation vector, e.g. ``-2 dV/d(dsq)``.
    """
    n, dim = grid.sorted_pos.shape
    dtype = grid.sorted_pos.dtype

    def masked_g(dsq, mask):
        if cutoff_sq is not None:
            mask = mask & (dsq < cutoff_sq)
        safe = jnp.where(mask, dsq, jnp.ones_like(dsq))
        return jnp.where(mask, gfn(safe), 0)

    def body(forces, blk: PairBlock):
        # spatial axis unrolled (see _dsq) to keep TPU lowering fused
        def axis_pairs(a_pos, b_pos):
            return [
                a_pos[..., ax][:, :, None] - b_pos[..., ax][:, None, :]
                for ax in range(dim)
            ]

        # intra-cell
        ds = axis_pairs(blk.own_pos, blk.own_pos)
        dsq = sum(d * d for d in ds)
        Kb = blk.own_mask.shape[-1]
        tri = jnp.tril(jnp.ones((Kb, Kb), jnp.bool_), -1).T
        m = tri & blk.own_mask[:, :, None] & blk.own_mask[:, None, :]
        m = m & blk.row_valid[:, None, None]
        g = masked_g(dsq, m).astype(dtype)
        f_i = jnp.stack([jnp.sum(d * g, axis=2) for d in ds], axis=-1)
        f_j = jnp.stack([-jnp.sum(d * g, axis=1) for d in ds], axis=-1)
        forces = forces.at[blk.own_slots].add(f_i + f_j)

        # inter-cell
        ds = axis_pairs(blk.own_pos, blk.nb_pos)
        dsq = sum(d * d for d in ds)
        m = blk.own_mask[:, :, None] & blk.nb_mask[:, None, :]
        m = m & blk.row_valid[:, None, None]
        g = masked_g(dsq, m).astype(dtype)
        forces = forces.at[blk.own_slots].add(
            jnp.stack([jnp.sum(d * g, axis=2) for d in ds], axis=-1)
        )
        forces = forces.at[blk.nb_slots].add(
            jnp.stack([-jnp.sum(d * g, axis=1) for d in ds], axis=-1)
        )
        return forces

    # one extra dump row at index n swallows masked scatters
    forces = jnp.zeros((n + 1, dim), dtype)
    forces = scan_cell_chunks(
        grid, body, forces, K=K, chunk=chunk, half=True, dense=dense
    )
    return grid.unsort(forces[:n])


def pair_stress(
    grid: CellGridData,
    gfn: Callable,
    *,
    K: int,
    chunk: int = 256,
    cutoff_sq=None,
    slot_weights: jax.Array | None = None,
    dense=None,
):
    """Configurational stress (pair-virial) tensor, summed over unique pairs:

        sigma_ab = sum_pairs w_pair * gfn(dsq) * dx_a * dx_b

    with ``dx = p_i - p_j`` and ``gfn`` the force factor (force on i from j
    is ``gfn(dsq) * dx``, as in `pair_forces`). The trace recovers the
    scalar virial ``sum f_ij . r_ij``; divide by volume (and add the
    kinetic term) for the pressure tensor. The reference exposes raw pair
    iteration (`src/cellgrid.rs:338-340`) from which users fold such sums;
    here the fold is fused so the pair list never materializes.

    ``slot_weights``: optional (n,) per-SORTED-slot weights;
    ``w_pair = 0.5 * (w_i + w_j)``. With 1 on real rows and 0 on periodic
    ghost images, each minimum-image cross pair (i, j_ghost) plus its
    mirror (j, i_ghost) sums to weight 1 and ghost-ghost pairs vanish —
    the PBC ownership rule for global tensor sums. Default weight 1.

    Returns a symmetric (dim, dim) tensor.
    """
    dim = grid.sorted_pos.shape[1]
    dtype = grid.sorted_pos.dtype
    if slot_weights is not None:
        # masked slots point at n (see _gather_window): a zero dump row
        w_ext = jnp.concatenate(
            [slot_weights.astype(dtype), jnp.zeros((1,), dtype)]
        )

    def masked_g(dsq, mask):
        if cutoff_sq is not None:
            mask = mask & (dsq < cutoff_sq)
        safe = jnp.where(mask, dsq, jnp.ones_like(dsq))
        return jnp.where(mask, gfn(safe), 0).astype(dtype)

    def accumulate(acc, ds, g, slots_a, slots_b):
        if slot_weights is not None:
            g = g * (0.5 * (w_ext[slots_a][:, :, None] + w_ext[slots_b][:, None, :]))
        for a in range(dim):
            gda = g * ds[a]
            for b in range(a, dim):
                acc[a][b] = acc[a][b] + jnp.sum(gda * ds[b])
        return acc

    def body(acc, blk: PairBlock):
        def axis_pairs(a_pos, b_pos):
            return [
                a_pos[..., ax][:, :, None] - b_pos[..., ax][:, None, :]
                for ax in range(dim)
            ]

        # intra-cell (strictly-upper triangle = each unordered pair once)
        ds = axis_pairs(blk.own_pos, blk.own_pos)
        dsq_a, m_a = blk.intra_dsq()
        acc = accumulate(
            acc, ds, masked_g(dsq_a, m_a), blk.own_slots, blk.own_slots
        )
        # inter-cell (half stencil = each unordered pair once)
        ds = axis_pairs(blk.own_pos, blk.nb_pos)
        dsq_e, m_e = blk.inter_dsq()
        acc = accumulate(
            acc, ds, masked_g(dsq_e, m_e), blk.own_slots, blk.nb_slots
        )
        return acc

    zero = jnp.zeros((), dtype)
    init = [
        {b: zero for b in range(a, dim)} for a in range(dim)
    ]
    acc = scan_cell_chunks(
        grid, body, init, K=K, chunk=chunk, half=True, dense=dense
    )
    out = jnp.zeros((dim, dim), dtype)
    for a in range(dim):
        for b in range(a, dim):
            out = out.at[a, b].set(acc[a][b])
            if b != a:
                out = out.at[b, a].set(acc[a][b])
    return out


def pair_energy_per_particle(
    grid: CellGridData,
    fn: Callable,
    *,
    K: int,
    chunk: int = 256,
    cutoff_sq=None,
    dense=None,
):
    """Per-particle half-energies e_i = 1/2 sum_j fn(dsq_ij), input order.

    Each unique pair contributes fn/2 to both endpoints, so summing e_i over
    any subset S counts pairs inside S once and boundary pairs half — the
    building block for halo-correct distributed energy sums (sum only the
    owned rows, psum across devices).
    """
    n, dim = grid.sorted_pos.shape
    dtype = grid.sorted_pos.dtype

    def half(dsq, mask):
        if cutoff_sq is not None:
            mask = mask & (dsq < cutoff_sq)
        safe = jnp.where(mask, dsq, jnp.ones_like(dsq))
        return jnp.where(mask, 0.5 * fn(safe).astype(dtype), 0)

    def body(acc, blk: PairBlock):
        dsq, m = blk.intra_dsq()
        v = half(dsq, m)
        acc = acc.at[blk.own_slots].add(jnp.sum(v, axis=2))
        acc = acc.at[blk.own_slots].add(jnp.sum(v, axis=1))
        dsq, m = blk.inter_dsq()
        v = half(dsq, m)
        acc = acc.at[blk.own_slots].add(jnp.sum(v, axis=2))
        acc = acc.at[blk.nb_slots].add(jnp.sum(v, axis=1))
        return acc

    acc = jnp.zeros((n + 1,), dtype)
    acc = scan_cell_chunks(
        grid, body, acc, K=K, chunk=chunk, half=True, dense=dense
    )
    return grid.unsort(acc[:n])


def count_pairs(grid: CellGridData, *, K: int, chunk: int = 256, cutoff_sq=None,
                dense=None):
    """Number of unique candidate (or distance-filtered) pairs."""
    return pair_sum(
        grid,
        lambda dsq: jnp.ones_like(dsq, jnp.int64)
        if jax.config.jax_enable_x64
        else jnp.ones_like(dsq, jnp.int32),
        K=K,
        chunk=chunk,
        cutoff_sq=cutoff_sq,
        accum_dtype=jnp.int64 if jax.config.jax_enable_x64 else jnp.int32,
        dense=dense,
    )


def materialize_pairs(
    grid: CellGridData,
    *,
    K: int,
    max_pairs: int,
    chunk: int = 256,
    cutoff_sq=None,
    dense=None,
):
    """Materialize unique candidate pairs as original-particle-id arrays.

    Returns ``(i, j, count, overflow)``; rows past ``count`` are n (padding).
    Pair order is deterministic (cell-table order) but unspecified, like the
    reference (iters.rs:251). Device-side compaction via running cumsum so a
    single transfer yields the whole pair list — the API-parity path backing
    the Python iterator protocol (python/src/lib.rs:262-345).
    """
    n = grid.n
    ids_i = jnp.full((max_pairs,), n, jnp.int32)
    ids_j = jnp.full((max_pairs,), n, jnp.int32)

    def emit(state, dsq, mask, slots_a, slots_b):
        ids_i, ids_j, offset = state
        if cutoff_sq is not None:
            mask = mask & (dsq < cutoff_sq)
        flat = mask.reshape(-1)
        a = jnp.broadcast_to(slots_a, mask.shape).reshape(-1)
        b = jnp.broadcast_to(slots_b, mask.shape).reshape(-1)
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1 + offset
        tgt = jnp.where(flat & (pos < max_pairs), pos, max_pairs)
        ids_i = ids_i.at[tgt].set(jnp.where(flat, a, n), mode="drop")
        ids_j = ids_j.at[tgt].set(jnp.where(flat, b, n), mode="drop")
        return ids_i, ids_j, offset + jnp.sum(flat, dtype=jnp.int32)

    def body(state, blk: PairBlock):
        dsq_a, m_a = blk.intra_dsq()
        state = emit(
            state, dsq_a, m_a, blk.own_slots[:, :, None], blk.own_slots[:, None, :]
        )
        dsq_e, m_e = blk.inter_dsq()
        state = emit(
            state, dsq_e, m_e, blk.own_slots[:, :, None], blk.nb_slots[:, None, :]
        )
        return state

    ids_i, ids_j, total = scan_cell_chunks(
        grid,
        body,
        (ids_i, ids_j, jnp.zeros((), jnp.int32)),
        K=K,
        chunk=chunk,
        half=True,
        dense=dense,
    )
    # map sorted slots -> original particle ids (padding slot n -> n)
    sid = jnp.concatenate([grid.sorted_ids, jnp.full((1,), n, jnp.int32)])
    return sid[ids_i], sid[ids_j], total, total > max_pairs


class QueryResult(NamedTuple):
    """Batched neighborhood query result (all padded to S1K = 3^N * K).

    ids: (Q, S1K) original particle indices (padding -> n)
    slots: (Q, S1K) sorted-slot indices (padding -> n)
    pos: (Q, S1K, N) neighbor coordinates (garbage where masked)
    mask: (Q, S1K) validity
    valid: (Q,) query-location validity (None analogue, util.rs:245-256)
    """

    ids: jax.Array
    slots: jax.Array
    pos: jax.Array
    mask: jax.Array
    valid: jax.Array


def query_neighbors(
    grid: CellGridData, points: jax.Array, *, K: int, dense=None
) -> QueryResult:
    """Batched point queries: full-space neighborhood of each query point.

    Vmapped analogue of `CellGrid::query_neighbors` (cellgrid.rs:391-401):
    the query cell's own slice followed by all 3^N - 1 full-space neighbor
    slices, padded to K per cell.
    """
    b = grid.bins
    mc = b.max_cells
    idx, ok = grid.info.try_cell_index(points)
    keys = grid.info.flatten_index(idx)

    stencil = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), full_stencil(grid.info)]
    )  # own cell first, then neighbors in stencil order
    qkeys = keys[:, None] + stencil
    if dense is not None:
        from .dense import dense_rows_for_keys

        drows = dense_rows_for_keys(dense, qkeys, mc)
        found = (drows < mc) & ok[:, None]
        rows = jnp.where(found, drows, 0)
    else:
        pos = jnp.searchsorted(b.cell_keys, qkeys).astype(jnp.int32)
        cpos = jnp.clip(pos, 0, mc - 1)
        found = (b.cell_keys[cpos] == qkeys) & ok[:, None]
        rows = jnp.where(found, cpos, 0)
    starts = b.cell_starts[rows]
    counts = jnp.where(found, b.cell_counts[rows], 0)

    ppos, slots, mask = _gather_window(grid, starts, counts, K)
    Q = points.shape[0]
    S1K = stencil.shape[0] * K
    slots = slots.reshape(Q, S1K)
    sid = jnp.concatenate([grid.sorted_ids, jnp.full((1,), grid.n, jnp.int32)])
    return QueryResult(
        ids=sid[slots],
        slots=slots,
        pos=ppos.reshape(Q, S1K, -1),
        mask=mask.reshape(Q, S1K),
        valid=ok,
    )
