"""Trustworthy device-completion barriers for timing.

`jax.block_until_ready` has been observed returning in ~5 ms through
the axon remote-TPU backend while a ~400 ms program was still executing
— every wall-clock measurement that used it as a barrier silently read
only dispatch time (this inflated one round's throughput 4x and a
profiler's achieved bandwidth past the physical HBM roofline).

Fetching VALUE BYTES is the only barrier that provably requires the
producing program — and everything queued before it on that device — to
have finished.  `barrier` fetches one element per array (a tiny slice
program + one ~90 ms round-trip through the tunnel); time SPANS of many
iterations against it so the round-trip amortizes.
"""

from __future__ import annotations

import jax
import numpy as np


def barrier(*pytrees) -> None:
    """Block until every array in the given pytrees has been computed,
    by fetching one element of each leaf."""
    for tree in pytrees:
        for a in jax.tree_util.tree_leaves(tree):
            if isinstance(a, jax.Array):
                np.asarray(a.ravel()[:1] if a.ndim else a)
