"""Checkpoint / resume helpers.

The reference's persistence story is serde derives on the full grid state
plus bincode-based pickling (SURVEY §5; python/src/lib.rs:243-259). The
grid is cheap to rebuild by construction, so checkpointing here saves the
*inputs* (positions, optional velocities/payload, cutoff) and rebuilds on
load — the same contract the Python pickle path of the reference satisfies
(round-trips grid params + positions).

`save`/`load` use a single .npz; `save_orbax`/`load_orbax` persist an
arbitrary pytree (e.g. a full MDState) via orbax for large-scale,
sharding-aware checkpoints.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save", "load", "save_orbax", "load_orbax"]


def save(path, positions, cutoff: float, **arrays) -> None:
    np.savez_compressed(
        path, positions=np.asarray(positions), cutoff=cutoff, **arrays
    )


def load(path):
    """Returns (positions, cutoff, extras dict)."""
    with np.load(path) as z:
        positions = z["positions"]
        cutoff = float(z["cutoff"])
        extras = {k: z[k] for k in z.files if k not in ("positions", "cutoff")}
    return positions, cutoff, extras


def save_orbax(path, pytree) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, pytree, force=True)


def load_orbax(path, abstract_pytree=None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_pytree)
