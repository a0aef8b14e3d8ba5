"""Multi-host runtime initialization.

The reference bootstraps multi-process training with MASTER_ADDR/PORT env
vars and a gloo process group (``/root/reference/nerfplusplus/
ddp_train_nerf.py:296-302``). The TPU-native equivalent is a single call to
``jax.distributed.initialize`` (coordinator discovery is automatic on TPU
pods); afterwards ``jax.devices()`` spans all hosts and the same mesh code
(``distributed/mesh.py``) scales from 1 chip to a pod slice over ICI/DCN.
"""
from __future__ import annotations

import jax


def initialize_runtime(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize the global JAX runtime for multi-host execution.

    No-ops gracefully on single-host (the common dev case). Returns a summary
    dict of the resulting topology.
    """
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.process_count() == 1 and num_processes not in (None, 1):
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # already initialized or single-host
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_coordinator() -> bool:
    """Rank-0 check (the reference's ``rank == 0`` logging/ckpt gates)."""
    return jax.process_index() == 0
