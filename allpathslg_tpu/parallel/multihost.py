"""Multi-host runtime setup and sharded-input conventions.

The reference's scaling story is "buy a bigger machine" (SURVEY.md §5.8);
ours is the standard JAX multi-controller runtime: every host runs the same
pipeline binary, calls `initialize()` once, owns 1/n of the input files, and
participates in the global mesh. All cross-host data movement happens
through the collectives already used by the kernels (all_to_all kmer
routing, psum spectra, all_gather boundary aggregates) — there is no
bespoke socket layer.

Per-host input sharding contract: read files are assigned round-robin by
index; every host feeds its local batches into the shared `shard_map`
programs, which see one global batch dimension laid out over
(host, local_device).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np

from allpathslg_tpu.parallel.mesh import make_mesh


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed when launched across hosts.

    No-ops in single-process runs. Arguments default from the standard env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), so pod
    launchers only export env vars."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh():
    """1-D mesh over every chip of every host (axis 'x'); the kmer table
    shards by hash over this axis, read batches data-parallel over it."""
    return make_mesh()


def my_file_shard(paths: Sequence[str]) -> List[str]:
    """Round-robin assignment of input files to this host."""
    pid = jax.process_index()
    n = jax.process_count()
    return [p for i, p in enumerate(paths) if i % n == pid]


def host_batch_to_global(local_batch: np.ndarray, mesh) -> jax.Array:
    """Assemble a process-local batch into a globally sharded array
    (jax.make_array_from_process_local_data handles the host boundary)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("x"))
    return jax.make_array_from_process_local_data(sharding, local_batch)
