"""Multi-host (multi-slice) initialisation helpers.

The reference's multi-process story is Lightning DDP over NCCL; the TPU-native
equivalent is ``jax.distributed`` over ICI/DCN with GSPMD handling all collectives.
Host-side python-object gathers for metrics live in eval/metrics.py."""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_if_needed(coordinator: Optional[str] = None) -> None:
    """Initialise jax.distributed when launched across hosts (no-op single-host).

    Reads the standard JAX cluster envs (or TPU metadata) like `jax.distributed`
    itself; safe to call unconditionally at program start."""
    if jax.process_count() > 1:
        return  # already initialised
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)


def is_main_process() -> bool:
    return jax.process_index() == 0
