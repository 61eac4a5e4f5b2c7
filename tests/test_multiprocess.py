"""Multi-process (multi-host analogue) data parallelism.

The reference trains DDP over NCCL processes (`config/train/single_tf.yaml:8`,
SURVEY.md §2.2). The TPU-native counterpart is a GLOBAL mesh spanning every
process's devices: each process loads its row stripe of the global batch
(`local_row_range` + the loader's `row_shard`), `place_batch` assembles the
global array with `make_array_from_process_local_data`, and the gradient
reduction is the GSPMD psum — over Gloo here (2 CPU processes × 4 devices), over
ICI/DCN on a real pod.

These tests spawn REAL separate processes with `jax.distributed.initialize`
(tests/mp_worker.py) and compare against a single-process run over the same 8
global devices: training losses, validation scores, checkpoint parameters, and
test-stage outputs must match.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

import jax

from cxrmate_tpu.ckpt import orbax_io
from cxrmate_tpu.cli.config import TaskConfig
from cxrmate_tpu.cli import stages
from cxrmate_tpu.data.synthetic import build_synthetic_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(num_processes: int, stage: str, task_kwargs: dict, devices_per_proc: int = 4,
           timeout: int = 1500):
    """Run `num_processes` mp_worker.py processes to completion; returns their
    stdouts (rank order)."""
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices_per_proc}"
    env["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
    env.setdefault("TOKENIZERS_PARALLELISM", "false")
    import tempfile

    logs = [tempfile.NamedTemporaryFile("w+", suffix=f".rank{p}.log", delete=False)
            for p in range(num_processes)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--process-id", str(p),
             "--num-processes", str(num_processes), "--port", str(port),
             "--stage", stage, "--task-json", json.dumps(task_kwargs)],
            env=env, cwd=REPO, stdout=logs[p], stderr=subprocess.STDOUT,
        )
        for p in range(num_processes)
    ]
    import time

    deadline = time.time() + timeout
    # poll so one crashed worker (its peers would block in collectives forever)
    # fails the test promptly instead of waiting out the full timeout
    while any(p.poll() is None for p in procs):
        if any(p.poll() not in (None, 0) for p in procs) or time.time() > deadline:
            for q in procs:
                if q.poll() is None:
                    q.kill()
            break
        time.sleep(1.0)
    outs = []
    for p, proc in enumerate(procs):
        proc.wait(timeout=60)
        logs[p].flush()
        logs[p].seek(0)
        outs.append(logs[p].read())
        logs[p].close()
        os.unlink(logs[p].name)  # content is captured in outs (and assert msgs)
    for p, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"worker {p} failed:\n{out}"
        assert "WORKER_OK" in out, f"worker {p} did not report OK:\n{out}"
    return outs


def _task_kwargs(root, exp_name, **kw):
    base = dict(
        variant="multi",
        exp_dir=os.path.join(str(root), exp_name),
        dataset_dir=os.path.join(str(root), "datasets"),
        ckpt_zoo_dir=os.path.join(str(root), "checkpoints"),
        mbatch_size=8,
        accumulated_mbatch_size=8,
        max_epochs=1,
        decoder_max_len=24,
        num_test_beams=2,
        max_images_per_study=1,
        model_preset="tiny",
        image_size=32,
        monitor="val_report_nlg_bleu_1",
        num_workers=0,
        # the single-process reference must tokenize to the same static widths
        # the multi-process run is forced to (bit-inert padding either way)
        static_tf_pad=True,
    )
    base.update(kw)
    return base


def _metric_records(exp_dir_trial: str):
    with open(os.path.join(exp_dir_trial, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


def _train_losses(records):
    return [r["train_loss"] for r in records if "train_loss" in r]


@pytest.fixture(scope="module")
def mp_env(tmp_path_factory):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    root = tmp_path_factory.mktemp("mp_env")
    build_synthetic_dataset(str(root), n_train=16, n_val=2, n_test=2)

    # single-process reference over the same 8 global devices, in-process
    ref_kwargs = _task_kwargs(root, "exp_ref", mesh_data=8)
    stages.fit(TaskConfig(**ref_kwargs))

    # 2 processes × 4 devices: the real jax.distributed cluster
    mp_kwargs = _task_kwargs(root, "exp_mp")
    _spawn(2, "fit", mp_kwargs)
    return root, ref_kwargs, mp_kwargs


def test_multiprocess_fit_matches_single_process(mp_env):
    """2-process fit: same global batches, same losses/val scores as the
    single-process dp8 mesh run (the psum rides Gloo instead of staying
    in-process; reduction-order noise is the only tolerance)."""
    root, ref_kwargs, mp_kwargs = mp_env
    ref = _metric_records(TaskConfig(**ref_kwargs).exp_dir_trial)
    mp = _metric_records(TaskConfig(**mp_kwargs).exp_dir_trial)

    ref_losses, mp_losses = _train_losses(ref), _train_losses(mp)
    assert len(mp_losses) == len(ref_losses) >= 1
    np.testing.assert_allclose(mp_losses, ref_losses, rtol=2e-5)

    ref_val = [r for r in ref if "train_loss" not in r]
    mp_val = [r for r in mp if "train_loss" not in r]
    assert len(mp_val) == len(ref_val) == 1
    for k, v in ref_val[0].items():
        assert mp_val[0][k] == pytest.approx(v, rel=1e-4), k


def test_multiprocess_checkpoint_matches_single_process(mp_env):
    """The rank-0-saved checkpoint equals the single-process run's (replicated
    state, host-copied — same params after the same global steps)."""
    root, ref_kwargs, mp_kwargs = mp_env
    ref_state = orbax_io.restore_checkpoint(
        orbax_io.last_checkpoint(TaskConfig(**ref_kwargs).exp_dir_trial), None)
    mp_state = orbax_io.restore_checkpoint(
        orbax_io.last_checkpoint(TaskConfig(**mp_kwargs).exp_dir_trial), None)

    ref_leaves, treedef_r = jax.tree_util.tree_flatten(ref_state["params"])
    mp_leaves, treedef_m = jax.tree_util.tree_flatten(mp_state["params"])
    assert treedef_r == treedef_m
    for a, b in zip(ref_leaves, mp_leaves):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-6)
    # the mesh-run marker lets a later resume change the process count
    info = orbax_io.checkpoint_resume_info(
        orbax_io.last_checkpoint(TaskConfig(**mp_kwargs).exp_dir_trial))
    assert info["global_schedule"] is True
    assert info["world_size"] == 2


def test_multiprocess_test_stage_matches_single_process(mp_env):
    """2-process --test (rank-strided decode + process_allgather metric gather)
    reproduces the single-process scores and generated reports."""
    root, ref_kwargs, mp_kwargs = mp_env
    ckpt = orbax_io.last_checkpoint(TaskConfig(**ref_kwargs).exp_dir_trial)

    ref_test_kwargs = _task_kwargs(root, "exp_test_ref", test_ckpt_path=ckpt, mbatch_size=2)
    ref_scores = {k: float(v)
                  for k, v in stages.test(TaskConfig(**ref_test_kwargs)).items()}

    mp_test_kwargs = _task_kwargs(root, "exp_test_mp", test_ckpt_path=ckpt, mbatch_size=2)
    outs = _spawn(2, "test", mp_test_kwargs)
    blob = [l for l in outs[0].splitlines() if l.startswith("SCORES_JSON=")]
    assert blob, f"rank 0 printed no scores:\n{outs[0]}"
    mp_scores = json.loads(blob[0][len("SCORES_JSON="):])

    assert set(mp_scores) == set(ref_scores)
    for k, v in ref_scores.items():
        assert mp_scores[k] == pytest.approx(v, rel=1e-4), k

    # generated reports byte-identical per study
    def reports(exp_kwargs):
        d = os.path.join(TaskConfig(**exp_kwargs).exp_dir_trial, "generated_reports")
        (f,) = os.listdir(d)
        return pd.read_csv(os.path.join(d, f)).sort_values("study_id").reset_index(drop=True)

    rr, mr = reports(ref_test_kwargs), reports(mp_test_kwargs)
    pd.testing.assert_frame_equal(rr, mr)


def test_multiprocess_gt_prompt_fit_matches_single_process(tmp_path_factory):
    """2-process longitudinal gt_prompt fit (LoRA-only trainable mask, prompt
    concatenation tokenized to the static prompt budget on each row stripe)
    matches the single-process dp8 mesh run: losses, val scores, and the
    checkpointed params."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    root = tmp_path_factory.mktemp("mp_gt_prompt")
    build_synthetic_dataset(str(root), n_train=16, n_val=2, n_test=2,
                            studies_per_subject=2)

    ref_kwargs = _task_kwargs(root, "exp_ref", variant="gt_prompt", mesh_data=8)
    stages.fit(TaskConfig(**ref_kwargs))
    mp_kwargs = _task_kwargs(root, "exp_mp", variant="gt_prompt")
    _spawn(2, "fit", mp_kwargs)

    ref = _metric_records(TaskConfig(**ref_kwargs).exp_dir_trial)
    mp = _metric_records(TaskConfig(**mp_kwargs).exp_dir_trial)
    ref_losses, mp_losses = _train_losses(ref), _train_losses(mp)
    assert len(mp_losses) == len(ref_losses) >= 1
    np.testing.assert_allclose(mp_losses, ref_losses, rtol=2e-5)
    ref_val = [r for r in ref if "train_loss" not in r]
    mp_val = [r for r in mp if "train_loss" not in r]
    assert len(mp_val) == len(ref_val) == 1
    for k, v in ref_val[0].items():
        assert mp_val[0][k] == pytest.approx(v, rel=1e-4), k

    ref_state = orbax_io.restore_checkpoint(
        orbax_io.last_checkpoint(TaskConfig(**ref_kwargs).exp_dir_trial), None)
    mp_state = orbax_io.restore_checkpoint(
        orbax_io.last_checkpoint(TaskConfig(**mp_kwargs).exp_dir_trial), None)
    ref_leaves, treedef_r = jax.tree_util.tree_flatten(ref_state["params"])
    mp_leaves, treedef_m = jax.tree_util.tree_flatten(mp_state["params"])
    assert treedef_r == treedef_m
    for a, b in zip(ref_leaves, mp_leaves):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-6)


def test_multiprocess_scst_matches_single_process(tmp_path_factory):
    """2-process SCST (variant 'scst': generated-prompt lanes + history
    threading). Lanes are GLOBAL (allocator world 1), each process materialises
    its row stripe, the rollout/grad run as one SPMD program over the global
    mesh, and rewards round-trip per rank. Losses, global reward/baseline
    means, val scores and the final checkpoint must match the single-process
    dp8 mesh run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from mp_worker import dummy_reward

    root = tmp_path_factory.mktemp("mp_scst")
    # 8 lanes (global mbatch 8) need lane-even subject packs: 8 subjects × 2
    # studies per split (the allocator's zip-interleave truncates to the
    # shortest lane, data/datasets.py:allocate_subjects_to_rank)
    build_synthetic_dataset(str(root), n_train=16, n_val=16, n_test=2,
                            studies_per_subject=2)

    ref_kwargs = _task_kwargs(root, "exp_scst_ref", variant="scst", mesh_data=8)
    stages.fit_scst(TaskConfig(**ref_kwargs), dummy_reward)

    mp_kwargs = _task_kwargs(root, "exp_scst_mp", variant="scst")
    _spawn(2, "fit_scst", mp_kwargs)

    ref = _metric_records(TaskConfig(**ref_kwargs).exp_dir_trial)
    mp = _metric_records(TaskConfig(**mp_kwargs).exp_dir_trial)
    ref_train = [r for r in ref if "scst_loss" in r]
    mp_train = [r for r in mp if "scst_loss" in r]
    assert len(mp_train) == len(ref_train) >= 1
    for key, tol in (("scst_loss", 2e-5), ("reward", 1e-6), ("baseline", 1e-6)):
        np.testing.assert_allclose(
            [r[key] for r in mp_train], [r[key] for r in ref_train],
            rtol=tol, atol=1e-7, err_msg=key,
        )
    ref_val = [r for r in ref if "scst_loss" not in r]
    mp_val = [r for r in mp if "scst_loss" not in r]
    assert len(mp_val) == len(ref_val) == 1
    for k, v in ref_val[0].items():
        assert mp_val[0][k] == pytest.approx(v, rel=1e-4), k

    ref_state = orbax_io.restore_checkpoint(
        orbax_io.last_checkpoint(TaskConfig(**ref_kwargs).exp_dir_trial), None)
    mp_state = orbax_io.restore_checkpoint(
        orbax_io.last_checkpoint(TaskConfig(**mp_kwargs).exp_dir_trial), None)
    ref_leaves, treedef_r = jax.tree_util.tree_flatten(ref_state["params"])
    mp_leaves, treedef_m = jax.tree_util.tree_flatten(mp_state["params"])
    assert treedef_r == treedef_m
    for a, b in zip(ref_leaves, mp_leaves):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-6)


def test_multiprocess_gen_prompt_test_stage_matches_single_process(tmp_path_factory):
    """2-process --test on the generated-prompt (flagship) variant: each process
    decodes only the subject LANES it owns — a subject's studies stay on one
    rank in step order, so the history threading is preserved — and the metric
    layer gathers the disjoint row sets. Scores and reports must equal the
    single-process run's."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    root = tmp_path_factory.mktemp("mp_genprompt")
    # test split: 4 subjects x 2 studies on 4 eval lanes (mbatch 4)
    build_synthetic_dataset(str(root), n_train=8, n_val=4, n_test=8,
                            studies_per_subject=2)

    # train a longitudinal model to test from (gt_prompt fit, single-process)
    fit_kwargs = _task_kwargs(root, "exp_gp_fit", variant="gt_prompt", mbatch_size=4)
    stages.fit(TaskConfig(**fit_kwargs))
    ckpt = orbax_io.last_checkpoint(TaskConfig(**fit_kwargs).exp_dir_trial)

    common = dict(variant="gen_prompt", test_ckpt_path=ckpt, mbatch_size=4,
                  num_test_beams=1)
    ref_kwargs = _task_kwargs(root, "exp_gp_ref", **common)
    ref_scores = {k: float(v) for k, v in stages.test(TaskConfig(**ref_kwargs)).items()}

    mp_kwargs = _task_kwargs(root, "exp_gp_mp", **common)
    outs = _spawn(2, "test", mp_kwargs)
    blob = [l for l in outs[0].splitlines() if l.startswith("SCORES_JSON=")]
    assert blob, f"rank 0 printed no scores:\n{outs[0]}"
    mp_scores = json.loads(blob[0][len("SCORES_JSON="):])

    assert set(mp_scores) == set(ref_scores)
    for k, v in ref_scores.items():
        assert mp_scores[k] == pytest.approx(v, rel=1e-4), k

    def reports(exp_kwargs):
        d = os.path.join(TaskConfig(**exp_kwargs).exp_dir_trial, "generated_reports")
        (f,) = os.listdir(d)
        return pd.read_csv(os.path.join(d, f)).sort_values("study_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(reports(ref_kwargs), reports(mp_kwargs))


def test_scst_mid_epoch_resume_across_world_change(tmp_path_factory):
    """A 2-process SCST run's MID-epoch checkpoint resumes single-process
    (global_schedule marks mesh checkpoints world-change-safe; the
    generated-prompt history is the union of the per-rank sidecars) and the
    completed run matches an uninterrupted single-process run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import glob as globmod

    from mp_worker import dummy_reward

    root = tmp_path_factory.mktemp("mp_scst_resume")
    build_synthetic_dataset(str(root), n_train=16, n_val=16, n_test=2,
                            studies_per_subject=2)

    # gold: uninterrupted single-process run with a mid-epoch validation
    gold_kwargs = _task_kwargs(root, "exp_gold", variant="scst", mesh_data=8,
                               val_check_interval=0.5)
    stages.fit_scst(TaskConfig(**gold_kwargs), dummy_reward)

    # 2-process run with the same schedule → mid-epoch ckpt with per-rank
    # sidecars. save_top_k=0 keeps every checkpoint: under the default top-1
    # pruning the mid-epoch save only survives while its monitor value happens
    # to beat the epoch-end one.
    mp_kwargs = _task_kwargs(root, "exp_mp", variant="scst", val_check_interval=0.5,
                             save_top_k=0)
    _spawn(2, "fit_scst", mp_kwargs)
    mp_trial = TaskConfig(**mp_kwargs).exp_dir_trial
    (mid_ckpt,) = globmod.glob(os.path.join(mp_trial, "checkpoints", "epoch=0-step=*"))
    info = orbax_io.checkpoint_resume_info(mid_ckpt)
    assert info["global_schedule"] is True and info["world_size"] == 2
    sidecars = [n for n in os.listdir(mid_ckpt) if n.startswith("scst_history.rank")]
    assert sorted(sidecars) == ["scst_history.rank0.json", "scst_history.rank1.json"]

    # resume the mid-epoch checkpoint SINGLE-process (world 2 → 1): trains the
    # epoch remainder and must land on the gold run's final state
    resume_kwargs = dict(mp_kwargs, mesh_data=8, resume_ckpt_path=mid_ckpt)
    stages.fit_scst(TaskConfig(**resume_kwargs), dummy_reward)

    gold_state = orbax_io.restore_checkpoint(
        orbax_io.last_checkpoint(TaskConfig(**gold_kwargs).exp_dir_trial), None)
    res_state = orbax_io.restore_checkpoint(orbax_io.last_checkpoint(mp_trial), None)
    gold_leaves, treedef_g = jax.tree_util.tree_flatten(gold_state["params"])
    res_leaves, treedef_s = jax.tree_util.tree_flatten(res_state["params"])
    assert treedef_g == treedef_s
    for a, b in zip(gold_leaves, res_leaves):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-6)
    # the resumed run restarted INSIDE epoch 0 at the saved position
    final_info = orbax_io.checkpoint_resume_info(orbax_io.last_checkpoint(mp_trial))
    gold_info = orbax_io.checkpoint_resume_info(
        orbax_io.last_checkpoint(TaskConfig(**gold_kwargs).exp_dir_trial))
    assert final_info["global_step"] == gold_info["global_step"]
