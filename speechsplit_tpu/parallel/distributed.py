"""Multi-host initialization.

The reference has no distributed runtime of any kind (SURVEY.md §2.6).
On TPU pods, JAX's runtime provides the communication backend: call
:func:`initialize` once per host before touching devices, then build a
global mesh with :func:`speechsplit_tpu.parallel.make_mesh` — XLA's
collectives ride ICI within a slice and DCN across slices with no
framework-level networking code.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op on a single host).

    With no arguments, JAX auto-detects the TPU pod topology from the
    environment; arguments override for bring-your-own clusters.
    """
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            # single-process environment (tests, one-chip dev)
            pass
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host should load.

    Per-host data loading: each host feeds only its shard of the 'data'
    axis; device_put with a NamedSharding assembles the global array.
    """
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
