"""Orbax checkpointing + best-k selection.

Replaces the reference's Lightning ModelCheckpoint (+ ``resume_from_ckpt_path`` /
best-checkpoint resolution in `tools/stages.py:52-112`): checkpoints are saved per
epoch under the trial directory, tracked by a monitored metric
(``val_report_chexbert_f1_macro``, mode max in the reference configs), and the best
checkpoint is resolvable for testing/warm starts."""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax


def _ckpt_dir(exp_dir_trial: str, tag: str) -> str:
    return os.path.join(exp_dir_trial, "checkpoints", tag)


def save_checkpoint(
    exp_dir_trial: str,
    state: Any,
    epoch: int,
    monitor_value: Optional[float] = None,
    monitor: str = "val_report_chexbert_f1_macro",
    keep_top_k: int = 1,
    mode: str = "max",
    step: Optional[int] = None,
    n_batches: Optional[int] = None,
    global_step: Optional[int] = None,
    extra_files: Optional[Dict[str, str]] = None,
    mbatch_size: Optional[int] = None,
    world_size: Optional[int] = None,
    global_schedule: bool = False,
) -> str:
    """Save ``state`` for ``epoch``; prune to the top-k by the monitored metric.
    ``step`` tags mid-epoch saves (Lightning's ``epoch=0-step=1567`` naming,
    produced by ``val_check_interval`` < 1).

    Every checkpoint also carries a ``MARKER.json`` with the trainer position
    (epoch, global step, in-epoch batch count) so resume can restart a mid-epoch
    save INSIDE the same epoch with the loader fast-forwarded — Lightning's
    ``trainer.fit(ckpt_path=...)`` semantics (reference `tools/stages.py:88`).
    ``extra_files`` (name → text) are written alongside (e.g. the SCST
    generated-prompt history)."""
    import orbax.checkpoint as ocp

    tag = f"epoch={epoch}"
    if step is not None:
        tag += f"-step={step}"
    if monitor_value is not None:
        tag += f"-{monitor}={monitor_value:.6f}"
    path = os.path.abspath(_ckpt_dir(exp_dir_trial, tag))
    marker = {"epoch": epoch, "step": step, "n_batches": n_batches,
              "global_step": global_step if global_step is not None else step,
              # the loader schedule the in-epoch position is measured in; a
              # mid-epoch resume is only well-defined under the same schedule.
              # global_schedule marks mesh runs, whose position is counted in
              # GLOBAL batches — world_size may change across such a resume
              "mbatch_size": mbatch_size, "world_size": world_size,
              "global_schedule": global_schedule}

    # multi-process: EVERY process must enter ckptr.save (orbax coordinates
    # internally with cross-process barriers and only the primary host writes
    # host/replicated data); the plain-file metadata ops are rank-0's alone.
    # extra_files names are rank-distinct by construction (the SCST history
    # sidecars), so every rank writes its own.
    rank0 = jax.process_index() == 0

    def _write_meta(ckpt_path: str) -> None:
        if rank0:
            with open(os.path.join(ckpt_path, "MARKER.json"), "w") as f:
                json.dump(marker, f)
        for name, content in (extra_files or {}).items():
            with open(os.path.join(ckpt_path, name), "w") as f:
                f.write(content)

    def _sync(name: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    _write_meta(path)
    # every rank's sidecar must land before rank 0 may prune any checkpoint
    # (a worse-scoring mid-epoch save can be its own prune victim)
    _sync("ckpt-meta")
    last_path = _ckpt_dir(exp_dir_trial, "last")
    if rank0:
        # the index is rank-0's alone: read, score, prune, rewrite
        import shutil

        index_path = os.path.join(exp_dir_trial, "checkpoints", "index.json")
        index = {}
        if os.path.exists(index_path):
            with open(index_path) as f:
                index = json.load(f)
        index[tag] = {"epoch": epoch, "monitor": monitor, "value": monitor_value}
        if monitor_value is not None and keep_top_k > 0:
            scored = [(k, v) for k, v in index.items() if v.get("value") is not None]
            reverse = mode == "max"
            scored.sort(key=lambda kv: kv[1]["value"], reverse=reverse)
            for k, _ in scored[keep_top_k:]:
                victim = _ckpt_dir(exp_dir_trial, k)
                if os.path.exists(victim):
                    shutil.rmtree(victim)
                index.pop(k, None)
        with open(index_path, "w") as f:
            json.dump(index, f, indent=1)
        # also maintain a Lightning-style "last" checkpoint for resume_last
        if os.path.exists(last_path):
            shutil.rmtree(last_path)
    # rank 0's rmtree of last/ must finish before any rank re-saves it
    _sync("ckpt-prune")
    ckptr.save(os.path.abspath(last_path), state, force=True)
    ckptr.wait_until_finished()
    if rank0:
        with open(os.path.join(last_path, "EPOCH"), "w") as f:
            f.write(str(epoch))
    _write_meta(last_path)
    return path


def best_checkpoint(exp_dir_trial: str, mode: str = "max") -> Optional[str]:
    """Resolve the best checkpoint path by the monitored metric, mirroring
    ``get_test_ckpt_path`` semantics (epoch=N-...metric=V in the name)."""
    index_path = os.path.join(exp_dir_trial, "checkpoints", "index.json")
    if not os.path.exists(index_path):
        return None
    with open(index_path) as f:
        index = json.load(f)
    scored = [(k, v) for k, v in index.items() if v.get("value") is not None]
    if not scored:
        scored = list(index.items())
        if not scored:
            return None
        tag = max(scored, key=lambda kv: kv[1]["epoch"])[0]
        return _ckpt_dir(exp_dir_trial, tag)
    pick = (max if mode == "max" else min)(scored, key=lambda kv: kv[1]["value"])
    return _ckpt_dir(exp_dir_trial, pick[0])


def last_checkpoint(exp_dir_trial: str) -> Optional[str]:
    """The most recent checkpoint: the dedicated 'last' save if present, else the
    newest indexed one."""
    last_path = _ckpt_dir(exp_dir_trial, "last")
    if os.path.exists(last_path):
        return last_path
    index_path = os.path.join(exp_dir_trial, "checkpoints", "index.json")
    if not os.path.exists(index_path):
        return None
    with open(index_path) as f:
        index = json.load(f)
    if not index:
        return None
    tag = max(index.items(), key=lambda kv: kv[1]["epoch"])[0]
    return _ckpt_dir(exp_dir_trial, tag)


def checkpoint_for_epoch(exp_dir_trial: str, epoch: int) -> Optional[str]:
    """Resolve the checkpoint saved for a specific epoch (dlhpcstarter's
    ``resume_epoch``/``test_epoch`` semantics: pick `epoch=N-...` by number).

    With ``val_check_interval`` an epoch can hold several saves
    (`epoch=N-step=S-...`); pick the LATEST one by step number — the epoch-end
    save carries no step suffix and sorts last. A lexicographic sort would pick
    `step=10` before `step=2`."""
    ckpt_root = os.path.join(exp_dir_trial, "checkpoints")
    if not os.path.isdir(ckpt_root):
        return None

    def sort_key(tag: str):
        m = re.search(r"step=(\d+)", tag)
        step = int(m.group(1)) if m else float("inf")  # epoch-end save wins
        # tie-break equal steps (e.g. two epoch-end saves after a re-run of
        # the same epoch) by save recency
        return (step, os.path.getmtime(_ckpt_dir(exp_dir_trial, tag)))

    best = None
    for tag in sorted(os.listdir(ckpt_root)):
        m = re.match(r"epoch=(\d+)(-|$)", tag)
        if m and int(m.group(1)) == epoch:
            if best is None or sort_key(tag) > sort_key(best):
                best = tag
    return _ckpt_dir(exp_dir_trial, best) if best else None


def resolve_resume(
    exp_dir_trial: str,
    resume_last: bool = False,
    resume_epoch: Optional[int] = None,
    resume_ckpt_path: Optional[str] = None,
) -> Optional[str]:
    """dlhpcstarter ``resume_from_ckpt_path`` analogue (reference
    `tools/stages.py:88`): explicit path > specific epoch > latest."""
    if resume_ckpt_path:
        if not os.path.exists(resume_ckpt_path):
            raise FileNotFoundError(f"resume_ckpt_path not found: {resume_ckpt_path}")
        return resume_ckpt_path
    if resume_epoch is not None:
        path = checkpoint_for_epoch(exp_dir_trial, resume_epoch)
        if path is None:
            raise FileNotFoundError(
                f"no checkpoint for resume_epoch={resume_epoch} under {exp_dir_trial}"
            )
        return path
    if resume_last:
        return last_checkpoint(exp_dir_trial)
    return None


def get_test_ckpt_path(
    exp_dir_trial: str,
    monitor_mode: str = "max",
    test_epoch: Optional[int] = None,
    test_ckpt_path: Optional[str] = None,
) -> Optional[str]:
    """dlhpcstarter ``get_test_ckpt_path`` analogue (reference
    `tools/stages.py:103-105` and the warm-start-from-other-experiment mode at
    `tools/stages.py:66-72`): explicit path > specific epoch > best by monitor."""
    if test_ckpt_path:
        if not os.path.exists(test_ckpt_path):
            raise FileNotFoundError(f"test_ckpt_path not found: {test_ckpt_path}")
        return test_ckpt_path
    if test_epoch is not None:
        path = checkpoint_for_epoch(exp_dir_trial, test_epoch)
        if path is None:
            raise FileNotFoundError(
                f"no checkpoint for test_epoch={test_epoch} under {exp_dir_trial}"
            )
        return path
    return best_checkpoint(exp_dir_trial, monitor_mode)


def checkpoint_resume_info(path: str) -> Dict[str, Optional[int]]:
    """Trainer position of a checkpoint: ``{'epoch', 'step', 'n_batches',
    'global_step', 'mbatch_size', 'world_size'}`` from its ``MARKER.json``;
    legacy checkpoints (pre-marker) fall back to tag parsing
    (``epoch=E[-step=S]``) with the other fields unknown."""
    marker_path = os.path.join(path, "MARKER.json")
    if os.path.exists(marker_path):
        with open(marker_path) as f:
            info = json.load(f)
        return {k: info.get(k) for k in (
            "epoch", "step", "n_batches", "global_step", "mbatch_size", "world_size",
            "global_schedule")}
    base = os.path.basename(os.path.normpath(path))
    e = re.search(r"epoch=(\d+)", base)
    s = re.search(r"step=(\d+)", base)
    return {
        "epoch": int(e.group(1)) if e else None,
        "step": int(s.group(1)) if s else None,
        "n_batches": None,
        "global_step": int(s.group(1)) if s else None,
        "mbatch_size": None,
        "world_size": None,
        "global_schedule": False,
    }


def checkpoint_extra_file(path: str, name: str) -> Optional[str]:
    """Read an ``extra_files`` sidecar written by ``save_checkpoint`` (None when
    absent, e.g. legacy checkpoints)."""
    p = os.path.join(path, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read()


def checkpoint_epoch_from_path(path: str) -> Optional[int]:
    """Parse the epoch number out of a checkpoint directory name."""
    m = re.search(r"epoch=(\d+)", os.path.basename(os.path.normpath(path)))
    return int(m.group(1)) if m else None


def last_checkpoint_epoch(exp_dir_trial: str) -> Optional[int]:
    last_path = _ckpt_dir(exp_dir_trial, "last")
    marker = os.path.join(last_path, "EPOCH")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read().strip())
    return None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure/shardings of ``target``. With no target,
    restore to host numpy: target-less restores must be topology-independent
    (a dp8-mesh checkpoint tested under 2 processes × 4 devices, a pod
    checkpoint inspected on one host) — orbax would otherwise rebuild the
    SAVING run's device shardings and fail on any other topology."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if target is None:
        import numpy as np

        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
        )
        return ckptr.restore(path, restore_args=restore_args)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def load_torch_checkpoint(path: str) -> Dict:
    """Load a torch .ckpt/.pth/.bin state dict (Lightning checkpoints keep it under
    'state_dict'; CheXbert under 'model_state_dict')."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model_state_dict"):
        if isinstance(blob, dict) and key in blob:
            return blob[key]
    return blob


def load_hf_pretrained_dir(path: str) -> Dict:
    """Load an HF checkpoint directory (pytorch_model.bin or model.safetensors)."""
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(bin_path):
        return load_torch_checkpoint(bin_path)
    st_path = os.path.join(path, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors import safe_open

        out = {}
        with safe_open(st_path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    raise FileNotFoundError(f"no weights found under {path}")
