"""Ring segmented scan on the 8-device mesh vs single-device reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from allpathslg_tpu.ops import segmented
from allpathslg_tpu.parallel import mesh as pmesh
from allpathslg_tpu.parallel.ring import ring_segmented_cumsum


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ring_segmented_cumsum_matches_reference(seed):
    rng = np.random.default_rng(seed)
    T = 8 * 1000
    values = rng.integers(0, 10, T).astype(np.int32)
    starts = rng.random(T) < (0.002 if seed == 0 else 0.05)
    starts[0] = True
    # seed 2: shards with no starts at all (runs crossing many shards)
    if seed == 2:
        starts[:] = False
        starts[0] = True
        starts[T // 2 + 7] = True

    ref = np.asarray(segmented.segment_cumsum(jnp.asarray(values),
                                              jnp.asarray(starts)))
    m = pmesh.make_mesh()
    got = ring_segmented_cumsum(m, jnp.asarray(values), jnp.asarray(starts))
    assert (np.asarray(got) == ref).all()


def test_chain_sums_ring_matches_host_cumsum():
    """P9 product consumption: build_unipaths' mesh coverage path uses the
    ring scan; per-chain totals must equal the host csum-difference exactly
    (pipeline mesh artifacts are byte-identical to 1-device)."""
    from allpathslg_tpu.graph.unipath import _chain_sums_ring

    rng = np.random.default_rng(11)
    T = 1003  # deliberately NOT divisible by 8 (pad path)
    counts = rng.integers(1, 255, T).astype(np.int64)
    starts = rng.random(T) < 0.03
    starts[0] = True
    m = pmesh.make_mesh()
    seg = _chain_sums_ring(m, counts, starts)

    chain_starts = np.nonzero(starts)[0]
    lens = np.diff(np.append(chain_starts, T))
    csum = np.concatenate([[0], np.cumsum(counts)])
    ref = csum[chain_starts + lens] - csum[chain_starts]
    assert (seg[chain_starts + lens - 1] == ref).all()
