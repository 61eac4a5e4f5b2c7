"""MIMIC-CXR-JPG dataset index: CSV merge and split filtering.

Replicates the reference's ``prepare_data``/``setup``
(`/root/reference/modules/lightning_modules/single.py:264-374`): merge the split
CSV, the sectioned reports (MIT-LCP sectioning output), and the metadata CSV into
one frame; filter to rows with findings+impression and studies with at most
``max_images_per_study`` DICOMs."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import pandas as pd


def mimic_cxr_image_path(image_dir: str, subject_id, study_id, dicom_id, ext: str = "jpg") -> str:
    """`p<first-2>/p<subject>/s<study>/<dicom>.<ext>` (tools/utils.py:6-9)."""
    return os.path.join(
        image_dir, "p" + str(subject_id)[:2], "p" + str(subject_id),
        "s" + str(study_id), str(dicom_id) + "." + ext,
    )


def mimic_cxr_text_path(image_dir: str, subject_id, study_id, ext: str = "txt") -> str:
    return os.path.join(
        image_dir, "p" + str(subject_id)[:2], "p" + str(subject_id),
        "s" + str(study_id) + "." + ext,
    )


def _find_csv(base: str) -> str:
    for suffix in (".csv", ".csv.gz"):
        if os.path.exists(base + suffix):
            return base + suffix
    raise FileNotFoundError(f"neither {base}.csv nor .csv.gz exists")


def build_merged_index(dataset_dir: str, merged_csv_path: Optional[str] = None) -> pd.DataFrame:
    """Create (or load) the merged splits ⋈ sectioned-reports ⋈ metadata frame."""
    if merged_csv_path is None:
        merged_csv_path = os.path.join(dataset_dir, "mimic_cxr_merged", "splits_reports_metadata.csv")
    if os.path.isfile(merged_csv_path):
        return pd.read_csv(merged_csv_path)

    root = os.path.join(dataset_dir, "physionet.org", "files", "mimic-cxr-jpg", "2.0.0")
    splits = pd.read_csv(_find_csv(os.path.join(root, "mimic-cxr-2.0.0-split")))
    reports_path = os.path.join(dataset_dir, "mimic_cxr_sections", "mimic_cxr_sectioned.csv")
    assert os.path.isfile(reports_path), (
        f"{reports_path} missing; create it with the MIT-LCP mimic-cxr sectioning tool"
    )
    reports = pd.read_csv(reports_path)
    metadata = pd.read_csv(_find_csv(os.path.join(root, "mimic-cxr-2.0.0-metadata")))

    for col in ("findings", "impression"):
        reports[col] = (
            reports[col]
            .replace(r"\n", " ", regex=True)
            .replace(r"\t", " ", regex=True)
            .replace(r"\s{2,}", " ", regex=True)
        )
    reports = reports.rename(columns={"study": "study_id"})
    reports.study_id = reports.study_id.str[1:].astype("int32")
    df = pd.merge(splits, reports, on="study_id")
    df = pd.merge(df, metadata, on=["dicom_id", "study_id", "subject_id"])
    Path(os.path.dirname(merged_csv_path)).mkdir(parents=True, exist_ok=True)
    df.to_csv(merged_csv_path, index=False)
    return df


def filter_split(df: pd.DataFrame, split: str, max_images_per_study: int = 5) -> pd.DataFrame:
    """Drop rows without findings/impression, drop oversize studies, select split
    (single.py:326-374)."""
    df = df.dropna(subset=["findings", "impression"], how="any")
    df = df[df.study_id.map(df.study_id.value_counts()) <= max_images_per_study]
    return df.loc[df["split"] == split]
