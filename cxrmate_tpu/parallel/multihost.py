"""Multi-host (multi-slice) initialisation helpers.

The reference's multi-process story is Lightning DDP over NCCL; the TPU-native
equivalent is ``jax.distributed`` over ICI/DCN with GSPMD handling all collectives.
Host-side python-object gathers for metrics live in eval/metrics.py."""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_if_needed(coordinator: Optional[str] = None) -> bool:
    """Initialise jax.distributed when launched across hosts (no-op single-host).

    Must run before anything touches the backend (`jax.devices()`,
    `jax.process_count()`, ...) — those calls initialise the local backend and make
    a later ``jax.distributed.initialize`` ineffective. So the decision is taken
    from the environment alone: with no coordinator address configured this returns
    immediately without initialising anything. Returns True iff distributed
    initialisation was performed by this call."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False  # single-host launch: never touch the backend
    try:
        jax.distributed.initialize(coordinator_address=coordinator)
    except RuntimeError as e:
        # Idempotence only: a repeated initialize is fine, but a real failure
        # (unreachable coordinator, misconfigured cluster) must propagate —
        # swallowing it would silently run every host as its own single-host
        # job (duplicate training, clobbered checkpoints).
        msg = str(e).lower()
        if "already" in msg or "once" in msg:
            return False
        raise
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0
