"""Worker process for the multi-process (multi-host analogue) tests.

Each worker is one "host" of a jax.distributed cluster: N CPU devices forced via
XLA_FLAGS (set by the spawning test), platform forced to CPU (the axon TPU plugin
ignores the JAX_PLATFORMS env var), cross-process collectives over Gloo. The test
spawns `--num-processes` of these against one coordinator port and compares the
training/test artifacts with a single-process run over the same global devices —
the TPU-world analogue of a multi-host pod slice (SPMD over ICI/DCN), per
SURVEY.md §2.2-2.3 (reference: Lightning DDP over NCCL).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# run as a script from tests/: python puts tests/ on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dummy_reward(preds, labels):
    """Deterministic length-based SCST reward (the shared e2e-test stand-in for
    CXR-BERT; tests/test_multiprocess.py uses the identical function for its
    single-process reference run)."""
    import numpy as np

    return np.asarray([min(len(p), 20) / 20.0 for p in preds], np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--stage", choices=["fit", "fit_scst", "test"], required=True)
    ap.add_argument("--task-json", required=True)
    args = ap.parse_args()

    import jax

    # before anything touches the backend; env JAX_PLATFORMS is ignored by the
    # tpu plugin (DEVNOTES.md)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from cxrmate_tpu.cli import stages
    from cxrmate_tpu.cli.config import TaskConfig

    task = TaskConfig(**json.loads(args.task_json))
    if args.stage == "fit":
        stages.fit(task)
    elif args.stage == "fit_scst":
        stages.fit_scst(task, dummy_reward)
    else:
        scores = stages.test(task)
        if jax.process_index() == 0:
            print("SCORES_JSON=" + json.dumps({k: float(v) for k, v in scores.items()}),
                  flush=True)
    print(f"WORKER_OK process={jax.process_index()}/{jax.process_count()} "
          f"devices={len(jax.devices())}", flush=True)


if __name__ == "__main__":
    main()
