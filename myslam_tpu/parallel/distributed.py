"""Multi-host initialization and cross-host synchronization.

The reference has no multi-node capability at all (SURVEY §5.8: two OS
processes + shared memory on one GPU).  Here the multi-host story is the
standard JAX one:

  * ``init_distributed()`` wires the hosts into one runtime
    (jax.distributed.initialize); afterwards jax.devices() spans the
    slice and every Mesh built from it can cross hosts — the same
    ray-DP / map-shard code paths then run with ICI collectives inside a
    slice and DCN across slices, chosen by XLA from the mesh layout.
  * each host feeds its own shard of the pixel batch (make_host_batch
    slices the per-host portion) — per-host data loading, one process
    per host, no sea of CPython workers;
  * ``barrier()`` is the tracker/mapper handoff fence where the
    single-host scheduler relies on dispatch order.

Scaling expectation (why ray-DP scales): one mapping iteration moves
~1 GB of gather/scatter traffic per 4k rays but only ~12 MB of gradients
(atlases' dense grads are sharded or psum'd once per iteration, and the
psum payload is tiny next to local HBM traffic), so the per-iteration
collective is far off the critical path on ICI.
"""

from __future__ import annotations

import jax
import numpy as np


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (no-op on a single process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)


def host_shard(n: int) -> tuple[int, int]:
    """This host's [start, end) share of a batch of n items."""
    p = jax.process_count()
    i = jax.process_index()
    per = -(-n // p)
    return i * per, min((i + 1) * per, n)


def barrier(name: str = "sync") -> None:
    """Cross-host fence (tracker/mapper handoff on multi-host)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
