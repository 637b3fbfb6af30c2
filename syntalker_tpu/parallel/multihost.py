"""Multi-host initialization for pod-scale training.

The reference's multi-process story was mp.spawn + NCCL rendezvous with a
hardcoded 127.0.0.1 master (train.py:304-317) — single-host only, never
tested beyond it (SURVEY.md §4). On TPU pods the runtime handles discovery:
call :func:`init_multihost` once per process before any jax call, then build
the mesh over `jax.devices()` (all hosts' chips) exactly like single-host —
XLA routes collectives over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import logging
from typing import Optional

log = logging.getLogger("syntalker")


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed when running multi-process; no-op for a
    single process. Returns a topology summary."""
    import jax

    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    log.info(f"topology: {info}")
    return info


def is_primary() -> bool:
    """Rank-0 gate for host-side side effects (cache building, logging,
    checkpoint writes) — the role of the reference's `rank == 0` checks."""
    import jax

    return jax.process_index() == 0
