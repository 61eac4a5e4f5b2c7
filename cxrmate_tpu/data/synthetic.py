"""Synthetic MIMIC-CXR-shaped dataset builder (smoke tests + multichip dry runs).

Produces the exact on-disk layout the data layer consumes (the reference's
`prepare_data` output: merged CSV at mimic_cxr_merged/splits_reports_metadata.csv,
JPEGs under physionet.org/files/mimic-cxr-jpg/2.0.0/files/pXX/p<subj>/s<study>/,
`modules/lightning_modules/single.py:264-324`), plus a small trained tokenizer."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

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


def build_synthetic_dataset(
    root: str,
    n_train: int = 16,
    n_val: int = 2,
    n_test: int = 2,
    studies_per_subject: int = 1,
    image_hw=(48, 40),
    seed: int = 0,
) -> dict:
    """Write a synthetic dataset + tokenizer under ``root``; returns the paths
    dict {'dataset_dir', 'ckpt_zoo_dir', 'tokenizer_dir'}."""
    from PIL import Image

    from cxrmate_tpu.tokenizer import train_bpe

    dataset_dir = os.path.join(root, "datasets")
    files_dir = os.path.join(dataset_dir, "physionet.org", "files", "mimic-cxr-jpg", "2.0.0")
    rng = np.random.RandomState(seed)
    rows = []
    total = n_train + n_val + n_test
    for i in range(total):
        study = 1000 + i
        subject = 100 + i // max(1, studies_per_subject)
        dicom = f"dcm{i}"
        img_dir = os.path.join(
            files_dir, "files", f"p{str(subject)[:2]}", f"p{subject}", f"s{study}"
        )
        os.makedirs(img_dir, exist_ok=True)
        arr = rng.randint(0, 255, size=image_hw, dtype=np.uint8)
        Image.fromarray(arr, "L").save(os.path.join(img_dir, f"{dicom}.jpg"))
        split = "train" if i < n_train else ("validate" if i < n_train + n_val else "test")
        rows.append(
            dict(
                dicom_id=dicom, study_id=study, subject_id=subject, split=split,
                findings=FINDINGS[i % 4], impression=IMPRESSION[i % 4],
                StudyDate=20200101 + i, StudyTime=120000.0 + i,
            )
        )
    merged = os.path.join(dataset_dir, "mimic_cxr_merged")
    os.makedirs(merged, exist_ok=True)
    pd.DataFrame(rows).to_csv(os.path.join(merged, "splits_reports_metadata.csv"), index=False)

    ckpt_zoo_dir = os.path.join(root, "checkpoints")
    tok_dir = os.path.join(ckpt_zoo_dir, "mimic-cxr-tokenizers", "bpe_prompt")
    os.makedirs(tok_dir, exist_ok=True)
    tok = train_bpe(
        FINDINGS + IMPRESSION, vocab_size=300,
        additional_special_tokens=["[NPF]", "[NPI]", "[PMT]", "[PMT-SEP]"],
    )
    tok.save(tok_dir + os.sep)
    return {"dataset_dir": dataset_dir, "ckpt_zoo_dir": ckpt_zoo_dir, "tokenizer_dir": tok_dir}


# a WordPiece vocab covering the synthetic report vocabulary (plus the BERT
# specials the tokenizer requires) for the tiny CXR-BERT reward checkpoint
_CXRBERT_VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the heart size is normal and lungs are clear "
    "there a small left pleural effusion stable card ##iome ##gal ##y with no focal "
    "consolidation acute cardiopulmonary process seen disease appearance study , ."
).split()


def build_synthetic_cxrbert(ckpt_zoo_dir: str, seed: int = 7) -> str:
    """Write a tiny random-weight CXR-BERT reward checkpoint into the zoo at the
    path ``build_cxrbert_reward`` loads (`microsoft/BiomedVLP-CXR-BERT-specialized`:
    HF ``bert.*`` state dict + ``cls_projection_head`` + vocab.txt + config.json),
    so dry runs and smoke tests exercise the REAL reward path (tokenise → two
    BERT forwards → projected-CLS cosine, `tools/rewards/cxrbert.py:20-73`)
    instead of a stub. The architecture is read back from the state dict /
    config.json — only the real checkpoint's 768-wide shapes are special-cased
    by nothing. Returns the checkpoint dir."""
    import torch
    import transformers

    path = os.path.join(ckpt_zoo_dir, "microsoft", "BiomedVLP-CXR-BERT-specialized")
    os.makedirs(path, exist_ok=True)
    torch.manual_seed(seed)
    cfg = transformers.BertConfig(
        vocab_size=len(_CXRBERT_VOCAB), hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48, max_position_embeddings=64,
        type_vocab_size=2, pad_token_id=0,
    )
    cfg._attn_implementation = "eager"
    model = transformers.BertModel(cfg, add_pooling_layer=False).eval()
    sd = {f"bert.{k}": v for k, v in model.state_dict().items()}
    sd["cls_projection_head.weight"] = torch.nn.Linear(24, 16, bias=False).weight.data
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))
    cfg.to_json_file(os.path.join(path, "config.json"))  # num_attention_heads source
    with open(os.path.join(path, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(_CXRBERT_VOCAB) + "\n")
    return path
