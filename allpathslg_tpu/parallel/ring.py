"""Cross-shard segmented scans for position-sharded sequence arrays.

The assembler's sequence-parallel analog (SURVEY.md §5.7 / §2.7 P9): genome-
length coordinate arrays (per-position coverage, unipath condensation runs,
consensus columns) are sharded along the position axis; segmented scans must
flow across shard boundaries. Only the boundary aggregate crosses chips:
each shard publishes (tail-run aggregate, has-any-start) via all_gather and
applies the combined incoming carry to its open head run — the inter-chip
cost is O(n_shards), independent of sequence length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from allpathslg_tpu.ops import segmented
from allpathslg_tpu.parallel.mesh import AXIS


def _ring_body(values, starts):
    n = lax.axis_size(AXIS)
    i = lax.axis_index(AXIS)
    # shard 0's first element is an implicit start
    starts = starts.at[0].set(jnp.where(i == 0, True, starts[0]))
    local = segmented.segment_cumsum(values, starts)

    idx = jnp.arange(values.shape[0], dtype=jnp.int32)
    has_start = jnp.any(starts)
    # the trailing run restarts at the last start, so local[-1] IS its sum
    # (and the whole-shard sum when the shard has no start at all)
    tail_sum = local[-1]

    tails = lax.all_gather(tail_sum, AXIS)   # [n]
    hs = lax.all_gather(has_start, AXIS)     # [n]

    # incoming carry: walk left, accumulating tails until (and including)
    # the nearest shard that contains a start
    def body(j, acc):
        total, blocked = acc
        k = i - 1 - j
        use = (k >= 0) & ~blocked
        ks = jnp.maximum(k, 0)
        total = total + jnp.where(use, tails[ks], jnp.zeros((), values.dtype))
        blocked = blocked | ((k >= 0) & hs[ks])
        return total, blocked

    init = (jnp.zeros((), values.dtype), jnp.zeros((), jnp.bool_))
    # the carry depends on axis_index → mark it axis-varying for shard_map
    init = tuple(lax.pcast(x, (AXIS,), to="varying") for x in init)
    carry, _ = lax.fori_loop(0, n, body, init)

    first_start = jnp.min(jnp.where(starts, idx, values.shape[0]))
    open_head = idx < first_start
    return jnp.where(open_head, local + carry, local)


def ring_segmented_cumsum(mesh: Mesh, values, starts):
    """Inclusive segmented cumsum of a position-sharded array.

    values: [T] sharded over AXIS; starts: bool [T] run-start flags
    (replicating single-device ops.segmented.segment_cumsum semantics)."""
    fn = jax.shard_map(_ring_body, mesh=mesh,
                       in_specs=(P(AXIS), P(AXIS)), out_specs=P(AXIS))
    return fn(values, starts)
