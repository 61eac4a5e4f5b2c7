"""Datasets: per-DICOM, per-study, and longitudinal previous-report views.

Framework-free ports of the reference's dataset classes
(`/root/reference/data/dicom_id.py`, `data/study_id.py`, `data/prompt.py`):
plain-Python indexable objects returning numpy batches, consumed by the loader in
``pipeline.py``. The longitudinal view reproduces the reference's subject-history
lookup (chronological previous study by StudyDate/StudyTime), the three excluded
ambiguous subjects, and the generated-report history used by gen-prompt
training/testing."""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict, List, Optional

import numpy as np
import pandas as pd

from cxrmate_tpu.data.index import mimic_cxr_image_path

# Subjects with two studies at identical times; these and all later studies are
# dropped (data/prompt.py:33-61).
_AMBIGUOUS = [(15964158, 21800331), (10661934, 21490809), (16973455, 21440406)]


def _subject_lists(df: pd.DataFrame) -> List[List]:
    """Per-subject chronological study lists (``df`` is already sorted
    subject/date/time), longest first — the shared input of both lane packers.
    Module-level (not a method): the allocator-parity fuzz test drives the
    packers on duck-typed stand-ins."""
    lists = (
        df.drop_duplicates(subset=["study_id"])
        .groupby("subject_id")["study_id"]
        .apply(list)
        .tolist()
    )
    lists.sort(key=len, reverse=True)
    return lists


def _greedy_pack(subject_lists: List[List], lanes: int):
    """Greedy longest-first bin packing of subject study-lists onto ``lanes``
    lanes → (buckets: per-lane lists of subject lists, totals)."""
    buckets: List[List[List]] = [[] for _ in range(lanes)]
    totals = [0] * lanes
    for lst in subject_lists:
        idx = int(np.argmin(totals))
        buckets[idx].append(lst)
        totals[idx] += len(lst)
    return buckets, totals


class DicomDataset:
    """Per-DICOM examples (single variant)."""

    def __init__(self, df: pd.DataFrame, dataset_dir: str, load_image: Callable):
        self.df = df
        self.dataset_dir = dataset_dir
        self.load_image = load_image
        self.examples = self.df["dicom_id"].drop_duplicates().tolist()

    def __len__(self):
        return len(self.examples)

    def image_paths(self) -> List[str]:
        """Every image file this dataset can load, deduplicated — the
        decoded-image cache warmer's work list (data/image.py:CacheWarmer).
        Column-wise iteration, not iterrows: this runs synchronously at stage
        startup, and iterrows over full MIMIC-CXR (~377k rows) would cost the
        warmer a minute of the compile window it exists to exploit."""
        sub = self.df.drop_duplicates("dicom_id")
        return [
            mimic_cxr_image_path(self.dataset_dir, s, st, d)
            for s, st, d in zip(sub["subject_id"], sub["study_id"], sub["dicom_id"])
        ]

    def __getitem__(self, index) -> Dict:
        rows = self.df.loc[self.df["dicom_id"] == self.examples[index]]
        r = rows.iloc[0]
        image = self.load_image(
            mimic_cxr_image_path(self.dataset_dir, r["subject_id"], r["study_id"], r["dicom_id"])
        )
        return {
            "images": image[None],  # [1, 3, H, W]
            "findings": r["findings"] if r["findings"] == r["findings"] else None,
            "impression": r["impression"] if r["impression"] == r["impression"] else None,
            "dicom_ids": r["dicom_id"],
            "study_ids": r["study_id"],
        }


class StudyDataset(DicomDataset):
    """Per-study examples: stacked image arrays [N, 3, H, W] (multi variant)."""

    def __init__(self, df, dataset_dir, load_image):
        super().__init__(df, dataset_dir, load_image)
        self.examples = self.df["study_id"].drop_duplicates().tolist()

    def __getitem__(self, index) -> Dict:
        rows = self.df.loc[self.df["study_id"] == self.examples[index]]
        r = rows.iloc[0]
        images = np.stack(
            [
                self.load_image(
                    mimic_cxr_image_path(self.dataset_dir, row["subject_id"], row["study_id"], row["dicom_id"])
                )
                for _, row in rows.iterrows()
            ],
            axis=0,
        )
        return {
            "images": images,
            "findings": r["findings"] if r["findings"] == r["findings"] else None,
            "impression": r["impression"] if r["impression"] == r["impression"] else None,
            "dicom_ids": r["dicom_id"],
            "study_ids": r["study_id"],
        }

    def image_counts(self) -> np.ndarray:
        """DICOMs per study, aligned with ``examples`` — the eval loader's
        sort key for image-slot-homogeneous batches (cli/stages.py:evaluate;
        outputs are per-study and iteration-order-invariant)."""
        vc = self.df["study_id"].value_counts()
        return np.asarray([int(vc[s]) for s in self.examples])


class PreviousReportDataset(StudyDataset):
    """Study examples with the previous report of the same subject as prompt
    (data/prompt.py:12-140)."""

    def __init__(
        self,
        df: pd.DataFrame,
        history: pd.DataFrame,
        dataset_dir: str,
        load_image: Callable,
        use_generated: bool = False,
        scst_generated: bool = False,
        mbatch_size: Optional[int] = None,
        world_size: int = 1,
    ):
        super().__init__(df, dataset_dir, load_image)
        self.history = history
        self.use_generated = use_generated
        self.scst_generated = scst_generated
        self.mbatch_size = mbatch_size
        self.world_size = world_size

        for subject, date in _AMBIGUOUS:
            sub = self.df.loc[self.df["subject_id"] == subject].sort_values(["StudyDate", "StudyTime"])
            excluded = sub[sub.StudyDate >= date].study_id.tolist()
            self.df = self.df[~self.df.study_id.isin(excluded)]

        self.df = self.df.sort_values(["subject_id", "StudyDate", "StudyTime"], ascending=True)
        self.examples = self.df["study_id"].drop_duplicates().tolist()

        if self.use_generated:
            self.history = self.history.copy()
            # object dtype: these columns hold strings once generation fills them
            self.history["generated_findings"] = pd.Series(np.nan, index=self.history.index, dtype=object)
            self.history["generated_impression"] = pd.Series(np.nan, index=self.history.index, dtype=object)
            self.allocate_subjects_to_rank(shuffle_subjects=False)
        if self.scst_generated:
            self.allocate_subjects_to_rank(seed=0)

    def record_generated(self, study_id, findings: str, impression: str) -> None:
        """Write generated sections into the history so later studies of the same
        subject are prompted with them (gen_prompt.py:137-139)."""
        sel = self.history.study_id == study_id
        self.history.loc[sel, "generated_findings"] = findings
        self.history.loc[sel, "generated_impression"] = impression

    def reset_generated(self) -> None:
        self.history["generated_findings"] = pd.Series(np.nan, index=self.history.index, dtype=object)
        self.history["generated_impression"] = pd.Series(np.nan, index=self.history.index, dtype=object)

    def export_generated(self) -> Dict:
        """Snapshot of the generated-prompt history (study_id → [findings,
        impression]) — persisted next to mid-epoch SCST checkpoints so resume can
        reconstruct the prompts already written back this epoch."""
        sel = self.history["generated_findings"].notna()
        sub = self.history.loc[
            sel, ["study_id", "generated_findings", "generated_impression"]
        ].drop_duplicates("study_id")
        return {
            str(int(s)): [f, i]
            for s, f, i in sub.itertuples(index=False)
        }

    def import_generated(self, mapping: Dict) -> None:
        for sid, (f, i) in mapping.items():
            self.record_generated(int(sid), f, i)

    def __getitem__(self, index) -> Dict:
        out = StudyDataset.__getitem__(self, index)
        example = self.df.loc[self.df["study_id"] == self.examples[index]]
        subject_id = example.iloc[0]["subject_id"]
        study_date = example.iloc[0]["StudyDate"]
        study_time = example.iloc[0]["StudyTime"]

        sub = self.history.loc[self.history["subject_id"] == subject_id].sort_values(
            ["StudyDate", "StudyTime"]
        )
        sub = sub[sub["StudyDate"] <= study_date]
        sub = sub[(sub["StudyTime"] <= study_time) | (sub["StudyDate"] != study_date)]
        considered = list(OrderedDict.fromkeys(sub.study_id.to_list()))[-2:]

        out["previous_findings"] = None
        out["previous_impression"] = None
        if len(considered) == 2 and (considered[0] == self.df.study_id).any():
            prev = sub.loc[sub.study_id == considered[0]].iloc[0]
            if self.use_generated:
                pf, pi = prev["generated_findings"], prev["generated_impression"]
                assert pf == pf and pi == pi, f"generated prompt missing for study {considered[0]}"
                out["previous_findings"], out["previous_impression"] = pf, pi
            else:
                pf, pi = prev["findings"], prev["impression"]
                out["previous_findings"] = pf if pf == pf else None
                out["previous_impression"] = pi if pi == pi else None
        return out

    def allocate_eval_lanes(self, lanes: int) -> None:
        """Re-pack subjects onto ``lanes`` lanes for EVALUATION decode packing
        (cli/stages.py:evaluate; VERDICT r4 item 6).

        Lane semantics forbid REORDERING a subject's studies (its generated
        history threads chronologically through one lane) but not MORE lanes —
        and the decode batch IS the lane count, so the flagship gen-prompt test
        pass otherwise decodes at the train microbatch (~4x under the measured
        96-row throughput peak). Unlike the reference-parity
        ``allocate_subjects_to_rank`` (whose zip-interleave silently requires
        equal lane lengths — it only ever runs at mbatch 1 in the reference,
        `gen_prompt.py:14` — and whose lane count is world x mbatch), this
        packs subjects greedily longest-first onto any lane count and pads
        each short lane to the longest lane's width by REPEATING the lane's
        final study. Exact: a duplicate decodes after its original in the SAME
        lane, so its prompt (the subject's previous generated sections) is
        already written back and its decode is identical; the metric/CSV layer
        dedups by study_id — the same contract the reference's own
        divisibility oversampling relies on (`data/prompt.py:182-198`).
        Reports are therefore token-identical at ANY lane count
        (tests/test_cli_end_to_end.py::test_gen_prompt_eval_lane_packing_token_identical)."""
        assert self.use_generated and not self.scst_generated
        subject_lists = _subject_lists(self.df)
        if not subject_lists:  # empty split: no lanes, evaluate emits no rows
            self.examples = []
            return
        lanes = max(1, min(lanes, len(subject_lists)))
        buckets, totals = _greedy_pack(subject_lists, lanes)
        width = max(totals)
        lanes_flat = [[s for subj in b for s in subj] for b in buckets]
        lanes_flat = [b + [b[-1]] * (width - len(b)) for b in lanes_flat]
        self.examples = [s for group in zip(*lanes_flat) for s in group]
        self.mbatch_size = lanes
        assert len(set(self.examples)) == self.df.study_id.nunique()

    def allocate_subjects_to_rank(self, seed: Optional[int] = None, shuffle_subjects: bool = True):
        """Greedy longest-first bin-packing of subjects onto world_size × mbatch
        lanes, oversampled to divisibility and interleaved so one subject's studies
        recur every mbatch·world steps (data/prompt.py:142-213)."""
        import itertools
        import random

        assert self.use_generated
        if shuffle_subjects:
            assert self.scst_generated
        world_size = self.world_size
        lanes = world_size * self.mbatch_size

        subject_lists = _subject_lists(self.df)
        buckets, totals = _greedy_pack(subject_lists, lanes)

        def flat_count():
            return len([s for lane in buckets for subj in lane for s in subj])

        while flat_count() % lanes != 0:
            buckets[int(np.argmin(totals))].append(subject_lists[-1])

        if shuffle_subjects:
            random.seed(seed)
            lanes_flat = [list(itertools.chain(*random.sample(l, k=len(l)))) for l in buckets]
        else:
            lanes_flat = [list(itertools.chain(*l)) for l in buckets]

        self.examples = [s for group in zip(*lanes_flat) for s in group]
        assert len(set(self.examples)) == self.df.study_id.nunique()
