"""Multi-host corpus decode: process bootstrap, manifest sharding, metrics.

The reference is single-process (SURVEY §2.3); the rebuild's distributed
story is deliberately thin because corpus decode is embarrassingly parallel
across files: each host decodes its static shard of the manifest on its
local devices, and the only cross-host communication is summary-metric
reduction. All communication rides XLA collectives (ICI within a slice,
DCN across hosts) — there is no hand-built NCCL/MPI analog.
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax
import numpy as np

from .corpus import CorpusSummary

logger = logging.getLogger("libacm_tpu.distributed")


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bootstrap (no-op if already initialized).

    With no arguments, relies on the environment/cluster autodetection
    exactly like jax.distributed.initialize does, and a failure is
    treated as a solo run. With explicit arguments the caller wants
    multi-process — failures then PROPAGATE (a silently-degraded
    "distributed" job that decodes only its own shard is worse than a
    crash). Must run before any JAX computation touches the backend
    (do not call jax.process_count()/jax.devices() first).
    """
    if jax.distributed.is_initialized():
        return  # already initialized
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:
        # single-process run (tests, one host): fine
        logger.debug("jax.distributed.initialize skipped: %s", e)


def shard_manifest(paths: Sequence, process_index: int | None = None,
                   process_count: int | None = None) -> list:
    """Static round-robin shard of a corpus manifest for this process.

    Round-robin (not contiguous) so size-correlated orderings spread evenly.
    Deterministic given the manifest order — every process computes its own
    shard with no communication.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [p for i, p in enumerate(paths) if i % pc == pi]


def allreduce_summary(local: CorpusSummary) -> CorpusSummary:
    """Sum per-host corpus summaries across all hosts.

    Uses a tiny jitted psum over the data-parallel device mesh; on a single
    process this is the identity.
    """
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    vec = np.array(
        [local.n_files, local.n_ok, local.n_failed, local.n_partial,
         local.samples],
        dtype=np.int64,
    )
    total = multihost_utils.process_allgather(vec).sum(axis=0)
    out = CorpusSummary(
        n_files=int(total[0]), n_ok=int(total[1]), n_failed=int(total[2]),
        n_partial=int(total[3]), samples=int(total[4]),
        wall_s=local.wall_s, scan_s=local.scan_s,
    )
    return out
