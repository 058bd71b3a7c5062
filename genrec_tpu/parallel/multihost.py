"""Multi-host bring-up helpers.

Replaces the reference's ``accelerate launch`` process-group bootstrap
(SURVEY.md §2.5): on TPU pods ``jax.distributed.initialize()`` discovers
peers from the TPU metadata; every trainer calls
:func:`maybe_initialize_distributed` once at startup, which is a no-op in
single-process runs. Host barriers use ``multihost_utils`` (the reference's
``accelerator.wait_for_everyone``).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize_distributed() -> None:
    """Initialize JAX distributed when running under a multi-process launch.

    Triggers on the standard coordinator env vars (set by TPU pod launchers
    or manually): ``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS`` +
    ``JAX_NUM_PROCESSES``/``NUM_PROCESSES`` + process id.
    """
    global _initialized
    if _initialized:
        return
    # env vars FIRST: jax.process_count() itself initialises the XLA
    # backend, after which jax.distributed.initialize() raises — this is
    # why the guard must not touch jax before deciding to initialise
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or \
        os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES") or \
        os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID") or os.environ.get("PROCESS_ID")
    if coord and nproc and pid is not None:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    _initialized = True


def host_barrier(name: str = "barrier") -> None:
    """Cross-host sync point (reference ``wait_for_everyone``)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
