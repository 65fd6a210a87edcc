"""Multi-host initialization and per-host RNG.

``jax.distributed.initialize()`` + sharded global arrays replace the
reference's (commented-out) SubprocVecEnv process pool; DCN only carries the
initial rendezvous and host-side metrics, while the env batch and gradient
collectives ride ICI (SURVEY.md §2.3 mapping).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX. No-op on a single process.

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU multi-process tests.
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except ValueError:
        if kwargs:
            raise  # explicit arguments that don't form a valid cluster
        # bare call outside any cluster (nothing auto-detectable): the
        # documented single-process no-op
        return


def fold_host_key(key, process_index: Optional[int] = None):
    """Derive a host-unique PRNG key (per-host env randomization)."""
    idx = jax.process_index() if process_index is None else process_index
    return jax.random.fold_in(key, idx)
