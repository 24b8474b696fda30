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
