"""Multi-host (multi-slice) initialisation helpers.

The reference's multi-process story is Lightning DDP over NCCL; the TPU-native
equivalent is ``jax.distributed`` over ICI/DCN with GSPMD handling all collectives.
Host-side python-object gathers for metrics live in eval/metrics.py."""

from __future__ import annotations

import os
from typing import Optional

import jax

_DID_INIT = False  # fallback record when jax's internal state is unavailable


def _already_initialized() -> bool:
    try:
        from jax._src import distributed as _dist  # no public accessor in this jax

        return getattr(_dist.global_state, "client", None) is not None
    except Exception:  # noqa: BLE001 - internal layout changed; use our record
        return _DID_INIT


def initialize_if_needed(coordinator: Optional[str] = None) -> bool:
    """Initialise jax.distributed when launched across hosts (no-op single-host).

    Must run before anything touches the backend (`jax.devices()`,
    `jax.process_count()`, ...) — those calls initialise the local backend and make
    a later ``jax.distributed.initialize`` ineffective. So the decision is taken
    from the environment alone: with no coordinator address configured this returns
    immediately without initialising anything. Returns True iff distributed
    initialisation was performed by this call."""
    global _DID_INIT
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False  # single-host launch: never touch the backend
    # Idempotence by STATE, not by matching error text (a gRPC 'Address
    # already in use' from a stale coordinator must NOT be classified as
    # already-initialised): jax.distributed tracks its client globally.
    if _already_initialized():
        return False  # repeated call
    # Any failure here (unreachable coordinator, misconfigured cluster)
    # propagates — swallowing it would silently run every host as its own
    # single-host job (duplicate training, clobbered checkpoints).
    # num_processes/process_id come from the environment when the launcher is
    # not one jax auto-detects (TPU pod metadata / SLURM / OMPI are detected by
    # jax.distributed itself; plain multi-process launches — e.g. the CPU
    # multi-process tests — must export JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator, **kwargs)
    _DID_INIT = True
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def global_max_int(value: int) -> int:
    """Max of a host-side int across processes (single-process: identity).
    Used where ranks must agree on a data-dependent static-ish quantity —
    e.g. the global batch's longest prompt width, so every rank's stripe
    tokenizes to the width the single-process run would use."""
    if jax.process_count() == 1:
        return int(value)
    import numpy as np
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray([value], np.int64))
    return int(gathered.max())
