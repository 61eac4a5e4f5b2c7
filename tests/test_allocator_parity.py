"""Subject→lane allocator fuzz parity vs the REFERENCE algorithm.

SCST/generated-prompt scheduling parity depends on `allocate_subjects_to_rank`
reproducing the reference's greedy longest-first bin-packing bit-for-bit —
including its quirks (totals not updated during oversampling, global-`random`
shuffle stream, zip-interleave truncation to the shortest lane, the final
set-equality assert). The reference method (/root/reference/data/prompt.py:142-213)
is pure host code, so it is invoked directly on a duck-typed object as the oracle.
"""

import math
import sys
import types

import numpy as np
import pandas as pd
import pytest

torch = pytest.importorskip("torch")

from cxrmate_tpu.data.datasets import PreviousReportDataset


def _reference_allocator():
    sys.path.insert(0, "/root/reference")
    try:
        from data.prompt import PreviousReportSubset
    finally:
        sys.path.remove("/root/reference")
    return PreviousReportSubset.allocate_subjects_to_rank


def _run(fn_owner, df, mbatch, world, seed, shuffle):
    """Run an allocator on a duck-typed stand-in; returns (examples, error)."""
    obj = types.SimpleNamespace(
        use_generated=True,
        scst_generated=shuffle,
        df=df,
        mbatch_size=mbatch,
        world_size=world,
        examples=None,
    )
    try:
        fn_owner(obj, seed=seed, shuffle_subjects=shuffle)
    except AssertionError:
        return None, "assert"
    return obj.examples, None


def _terminates(study_counts, lanes):
    """The oversampling loop adds len(last subject) studies per iteration to
    reach lane divisibility; with fuzz data that walk may never land on a
    multiple of `lanes` (both implementations would spin) — pre-filter."""
    flat = sum(study_counts)
    d = min(study_counts)  # last after longest-first sort = fewest studies
    g = math.gcd(d, lanes)
    return flat % lanes == 0 or (-flat) % g == 0


def test_allocator_fuzz_matches_reference(monkeypatch):
    ref_fn = _reference_allocator()
    rng = np.random.RandomState(0)
    checked = 0
    for trial in range(200):
        world = rng.randint(1, 4)
        mbatch = rng.randint(1, 4)
        lanes = world * mbatch
        n_subjects = rng.randint(max(1, lanes // 2), 14)
        study_counts = [rng.randint(1, 5) for _ in range(n_subjects)]
        if not _terminates(study_counts, lanes):
            continue
        rows = []
        sid = 0
        for subj, n in enumerate(study_counts):
            for _ in range(n):
                # some studies appear on multiple rows (multiple DICOMs)
                for _ in range(rng.randint(1, 3)):
                    rows.append({"subject_id": f"p{subj}", "study_id": f"s{sid}"})
                sid += 1
        df = pd.DataFrame(rows)
        seed = int(rng.randint(0, 1000))
        shuffle = bool(trial % 2)

        monkeypatch.setattr(torch.distributed, "get_world_size", lambda w=world: w)
        expected, ref_err = _run(ref_fn, df, mbatch, world, seed, shuffle)
        got, our_err = _run(
            PreviousReportDataset.allocate_subjects_to_rank, df, mbatch, world, seed, shuffle
        )
        assert our_err == ref_err, f"trial {trial}: ref={ref_err} ours={our_err}"
        if ref_err is None:
            assert got == expected, f"trial {trial} (world={world} mbatch={mbatch})"
            checked += 1
    assert checked >= 50, f"too few comparable draws ({checked})"


def test_allocate_eval_lanes_empty_split():
    """An empty eval split (over-filtered custom dataset) must yield an empty
    example list — evaluate simply emits no rows, like the parity allocator —
    not an IndexError from padding an empty lane."""
    ds = object.__new__(PreviousReportDataset)
    ds.df = pd.DataFrame({"subject_id": [], "study_id": []})
    ds.use_generated, ds.scst_generated = True, False
    ds.mbatch_size = 4
    ds.examples = []
    ds.allocate_eval_lanes(24)
    assert ds.examples == []
    assert ds.mbatch_size == 4  # decode batch untouched for the empty pass


def test_allocate_eval_lanes_clamps_to_subject_count():
    """Lane count clamps to the number of subjects and every study decodes
    exactly once per lane slot (duplicates only pad SHORT lanes)."""
    rows = []
    for subj in range(3):
        for s in range(subj + 1):
            rows.append({"subject_id": f"p{subj}", "study_id": f"s{subj}_{s}"})
    ds = object.__new__(PreviousReportDataset)
    ds.df = pd.DataFrame(rows)
    ds.use_generated, ds.scst_generated = True, False
    ds.mbatch_size = 1
    ds.examples = []
    ds.allocate_eval_lanes(96)
    assert ds.mbatch_size == 3  # clamped to the subject count
    assert set(ds.examples) == set(ds.df.study_id)
    assert len(ds.examples) == 3 * 3  # 3 lanes padded to the longest (3)
