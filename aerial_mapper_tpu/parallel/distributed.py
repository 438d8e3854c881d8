"""Multi-host initialization and rank-0 artifact merging.

The reference is strictly single-process (SURVEY.md §5 "Distributed
communication backend: none"). The scale-out story here is the standard
JAX one: one process per host, ``jax.distributed.initialize``, a global
mesh over the pod slice; collectives ride ICI, host I/O stays per-process
with a rank-0 merge (this module).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np

logger = logging.getLogger("aerial_mapper_tpu")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    With no arguments, relies on the TPU environment auto-detection
    (GKE/TPU-VM metadata). Returns True when a multi-process runtime is
    active afterwards.
    """
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.process_count() == 1:
            # attempt env auto-detection; harmless single-process otherwise
            try:
                jax.distributed.initialize()
            except Exception:  # noqa: BLE001 — not a multi-host environment
                pass
    except RuntimeError as e:
        # already initialized
        logger.debug("jax.distributed: %s", e)
    multi = jax.process_count() > 1
    logger.info(
        "distributed: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return multi


def is_rank0() -> bool:
    return jax.process_index() == 0


def gather_row_bands_to_host(
    array: jax.Array, mesh, axis_name: str = "tiles"
) -> Optional[np.ndarray]:
    """Assemble a row-band-sharded raster on rank 0 (None elsewhere).

    For GeoTiff export: each process holds its addressable shards;
    ``jax.experimental.multihost_utils`` moves the full array to every
    host, and only rank 0 materializes it.
    """
    from jax.experimental import multihost_utils

    global_np = multihost_utils.process_allgather(array, tiled=True)
    if is_rank0():
        return np.asarray(global_np)
    return None


def pad_to_multiple(n: int, k: int) -> int:
    """Observations/pairs padding helper for even sharding."""
    return (-n) % k


def shard_sequence_indices(num_items: int, num_shards: int,
                           shard: int) -> Sequence[int]:
    """Contiguous block partition of item indices (the parFor partition,
    utils-common.h:40-58, applied across hosts for host-side I/O)."""
    block = -(-num_items // num_shards)
    return range(shard * block, min(num_items, (shard + 1) * block))
