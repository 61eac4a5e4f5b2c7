"""End-to-end CLI smoke test: synthetic MIMIC-CXR-shaped dataset on disk → one
training epoch with validation + checkpointing → beam-search test stage with
metrics and report CSVs. Tiny model preset, CPU."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from cxrmate_tpu.cli.config import TaskConfig, apply_overrides, load_config
from cxrmate_tpu.cli.stages import fit
from cxrmate_tpu.cli.stages import test as run_test_stage
from cxrmate_tpu.tokenizer import train_bpe

FINDINGS = [
    "the heart size is normal and the lungs are clear",
    "there is a small left pleural effusion",
    "stable cardiomegaly with no focal consolidation",
    "no acute cardiopulmonary process is seen",
]
IMPRESSION = [
    "no acute disease",
    "small left effusion",
    "stable appearance",
    "normal study",
]


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mimic")
    dataset_dir = root / "datasets"
    files_dir = dataset_dir / "physionet.org" / "files" / "mimic-cxr-jpg" / "2.0.0"
    rows = []
    rng = np.random.RandomState(0)
    subject = 100
    for i in range(8):
        study = 1000 + i
        subject = 100 + i // 2  # two studies per subject → longitudinal prompts
        for d in range(1 + i % 2):
            dicom = f"dcm{i}_{d}"
            img_dir = files_dir / "files" / f"p{str(subject)[:2]}" / f"p{subject}" / f"s{study}"
            img_dir.mkdir(parents=True, exist_ok=True)
            arr = rng.randint(0, 255, size=(48, 40), dtype=np.uint8)
            Image.fromarray(arr, "L").save(img_dir / f"{dicom}.jpg")
            split = "train" if i < 4 else ("validate" if i < 6 else "test")
            rows.append(
                dict(
                    dicom_id=dicom, study_id=study, subject_id=subject, split=split,
                    findings=FINDINGS[i % 4], impression=IMPRESSION[i % 4],
                    StudyDate=20200101 + i, StudyTime=120000.0 + i,
                )
            )
    merged = dataset_dir / "mimic_cxr_merged"
    merged.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(rows).to_csv(merged / "splits_reports_metadata.csv", index=False)

    tok_dir = root / "checkpoints" / "mimic-cxr-tokenizers" / "bpe_prompt"
    tok_dir.mkdir(parents=True, exist_ok=True)
    tok = train_bpe(
        FINDINGS + IMPRESSION, vocab_size=300,
        additional_special_tokens=["[NPF]", "[NPI]", "[PMT]", "[PMT-SEP]"],
    )
    tok.save(str(tok_dir) + os.sep)
    return root


def _task(root, variant, max_epochs=1, mbatch_size=2, accumulated_mbatch_size=2, **kw):
    return TaskConfig(
        max_epochs=max_epochs,
        variant=variant,
        exp_dir=str(root / "experiments"),
        dataset_dir=str(root / "datasets"),
        ckpt_zoo_dir=str(root / "checkpoints"),
        mbatch_size=mbatch_size,
        accumulated_mbatch_size=accumulated_mbatch_size,
        decoder_max_len=24,
        num_test_beams=2,
        max_images_per_study=2,
        model_preset="tiny",
        image_size=32,
        monitor="val_report_nlg_bleu_1",
        **kw,
    )


def test_fit_and_test_multi(synthetic_dataset):
    root = synthetic_dataset
    task = _task(root, "multi")
    fit(task)
    ckpts = glob.glob(os.path.join(task.exp_dir_trial, "checkpoints", "epoch=*"))
    assert ckpts, "no checkpoint written"
    scores = run_test_stage(task)
    assert any("bleu_1" in k for k in scores)
    reports = glob.glob(os.path.join(task.exp_dir_trial, "generated_reports", "*.csv"))
    assert reports
    df = pd.read_csv(reports[-1])
    assert {"findings", "impression", "study_id"} <= set(df.columns)


def test_fit_gt_prompt_longitudinal(synthetic_dataset):
    root = synthetic_dataset
    task = _task(root, "gt_prompt", trial=1)
    fit(task)
    scores = run_test_stage(task)
    assert any("bleu_1" in k for k in scores)


def test_config_composition(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("lr: 5.0e-5\nmbatch_size: 8\nvariant: single\n")
    child = tmp_path / "child.yaml"
    child.write_text("defaults:\n  - base\n  - _self_\nmbatch_size: 4\n")
    cfg = load_config(str(child))
    assert cfg["lr"] == 5e-5 and cfg["mbatch_size"] == 4
    cfg = apply_overrides(cfg, ["lr=1e-4", "variant=multi"])
    assert cfg["lr"] == 1e-4 and cfg["variant"] == "multi"
    task = TaskConfig.from_dict(cfg)
    assert task.accumulate_steps == 8


def test_fit_scst_gen_prompt(synthetic_dataset):
    import numpy as np

    from cxrmate_tpu.cli.stages import fit_scst

    root = synthetic_dataset
    task = _task(root, "scst", trial=2, max_epochs=1, mbatch_size=1, accumulated_mbatch_size=1)

    def reward_fn(preds, labels):
        return np.asarray([min(len(p), 20) / 20.0 for p in preds], np.float32)

    fit_scst(task, reward_fn)
    ckpts = glob.glob(os.path.join(task.exp_dir_trial, "checkpoints", "epoch=*"))
    assert ckpts


def test_fit_resume_last(synthetic_dataset):
    from cxrmate_tpu.ckpt import orbax_io

    root = synthetic_dataset
    task = _task(root, "multi", trial=3, max_epochs=1)
    fit(task)
    first = glob.glob(os.path.join(task.exp_dir_trial, "checkpoints", "epoch=*"))
    assert len(first) >= 1
    # resume and train one more epoch
    task2 = _task(root, "multi", trial=3, max_epochs=2, resume_last=True)
    fit(task2)
    assert orbax_io.last_checkpoint_epoch(task2.exp_dir_trial) == 1
