"""Pre-populate the decoded-image cache for a dataset split.

The decoded-image cache (``image_cache_dir`` task knob, data/image.py) makes
warm epochs host-feasible by skipping the irreducible ~30-45 ms/image JPEG
entropy decode (DEVNOTES round 4 "input pipeline"); this script performs that
decode ONCE, up front, with a thread pool — so the first training epoch / test
pass already runs at the warm rate. The cached entries are each transform's own
deterministic uint8 prefix, so warmed runs stay byte-identical to cold ones
(the PIL-exact eval path stays PIL-exact).

The reference has no analogue — it re-decodes every epoch inside its loader
workers (/root/reference/data/dicom_id.py:78-95, num_workers=5).

Usage:
  python scripts/warm_cache.py --dataset_dir D --cache_dir C \
      [--splits train,validate,test] [--image_size 384] [--trial 0] [--workers N]

Warms the train transform's entries for the train split and the eval
transform's entries for validate/test (matching cli/stages.py:make_datasets).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--cache_dir", required=True)
    ap.add_argument("--splits", default="train,validate,test")
    ap.add_argument("--image_size", type=int, default=384)
    ap.add_argument("--trial", type=int, default=0,
                    help="task trial number (the train loader's RNG seed; the "
                         "cached prefix itself is augmentation-independent)")
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    args = ap.parse_args(argv)

    from cxrmate_tpu.data import image as image_mod
    from cxrmate_tpu.data.index import build_merged_index, mimic_cxr_image_path

    df = build_merged_index(args.dataset_dir)
    mimic_dir = os.path.join(
        args.dataset_dir, "physionet.org", "files", "mimic-cxr-jpg", "2.0.0", "files"
    )
    total = 0
    failed = False
    for split in args.splits.split(","):
        sub = df.loc[df["split"] == split]
        if sub.empty:
            print(f"{split}: no rows, skipped", file=sys.stderr)
            continue
        load = (
            image_mod.make_train_loader_transform(
                size=args.image_size, seed=args.trial, cache_dir=args.cache_dir)
            if split == "train"
            else image_mod.make_eval_loader_transform(
                size=args.image_size, cache_dir=args.cache_dir)
        )
        paths = [
            mimic_cxr_image_path(mimic_dir, r["subject_id"], r["study_id"], r["dicom_id"])
            for _, r in sub.iterrows()
        ]
        t0 = time.perf_counter()
        # the loader transforms release the GIL in the native decode, so
        # threads scale ~linearly with cores (DEVNOTES "input pipeline")
        with ThreadPoolExecutor(max_workers=args.workers) as pool:
            n_err = sum(1 for ok in pool.map(_safe(load), paths) if not ok)
        dt = time.perf_counter() - t0
        rate = len(paths) / dt if dt else float("inf")
        print(f"{split}: {len(paths)} images in {dt:.1f}s ({rate:.1f} images/s, "
              f"{args.workers} workers){f', {n_err} FAILED' if n_err else ''}",
              file=sys.stderr)
        total += len(paths)
        # a few corrupt images must not leave the REMAINING splits unwarmed:
        # keep going, signal failure in the exit code at the end
        failed = failed or bool(n_err)
    print(f"warmed {total} cache entries under {args.cache_dir}", file=sys.stderr)
    return 1 if failed else 0


def _safe(load):
    def run(path) -> bool:
        try:
            load(path)
            return True
        except Exception as e:  # noqa: BLE001 - report per-file, don't abort the pool
            print(f"FAILED {path}: {type(e).__name__}: {e}", file=sys.stderr)
            return False
    return run


if __name__ == "__main__":
    raise SystemExit(main())
