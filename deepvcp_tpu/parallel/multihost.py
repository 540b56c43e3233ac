"""Multi-host setup (SURVEY.md parallelism table: the reference's
DataParallel has no multi-host analogue; ours is jax.distributed +
per-host disjoint data shards + the same pjit train step).

On a pod slice, call `initialize_multihost()` once at program start; the
mesh from parallel.make_mesh then spans all hosts' devices and the jitted
train step is unchanged (GSPMD handles cross-host collectives over
ICI/DCN). Data loading uses `host_shard_info()` with
`data.batch_iterator(..., host_id=..., num_hosts=...)` so each host reads
a disjoint stride of the index stream.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    No-ops (returns False) in single-process settings — so the same entry
    point works on one chip, one host, or a pod slice. TPU pods usually
    need no explicit arguments (the runtime discovers peers).
    """
    if jax.process_count() > 1:
        return True  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return jax.process_count() > 1
    except Exception:
        return False


def host_shard_info() -> Tuple[int, int]:
    """(host_id, num_hosts) for per-host data sharding."""
    return jax.process_index(), jax.process_count()


def is_primary_host() -> bool:
    """Checkpoint/metrics writers should run on one host only."""
    return jax.process_index() == 0
