"""Reproduce the reference's frozen test-set generations and diff them.

The behavioural parity target of this rebuild is token/string identity with
`/root/reference/generated_reports/*/*.csv` under greedy decode (BASELINE.md).
With MIMIC-CXR-JPG and a released checkpoint directory available:

  python scripts/reproduce_test_set.py \\
      --checkpoint /path/to/aehrc-cxrmate-multi-tf --variant multi \\
      --dataset-dir /path/to/datasets \\
      --reference-csv /root/reference/generated_reports/cxrmate-multi-tf/*.csv \\
      --greedy

runs the test stage (greedy or beam-4), writes our generated_reports CSV, and
reports per-study string agreement with the reference CSV."""

import argparse
import glob
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--variant", default="multi",
                   choices=["single", "multi", "gt_prompt", "gen_prompt"])
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--exp-dir", default="experiments/reproduce")
    p.add_argument("--reference-csv", default=None)
    p.add_argument("--greedy", action="store_true", help="greedy instead of beam-4")
    # model-shape overrides (defaults match the released checkpoints; the smoke
    # test drives the same code path at tiny shapes, tests/test_cli_end_to_end.py)
    p.add_argument("--model-preset", default="cxrmate")
    p.add_argument("--image-size", type=int, default=384)
    p.add_argument("--decoder-max-len", type=int, default=256)
    p.add_argument("--mbatch-size", type=int, default=8)
    p.add_argument("--tokenizer-dir", default=None,
                   help="defaults to the checkpoint dir (released ckpts bundle tokenizer.json)")
    args = p.parse_args(argv)

    from cxrmate_tpu.cli.config import TaskConfig
    from cxrmate_tpu.cli.stages import test as run_test

    task = TaskConfig(
        variant=args.variant,
        exp_dir=args.exp_dir,
        dataset_dir=args.dataset_dir,
        ckpt_zoo_dir=os.path.dirname(args.checkpoint),
        tokenizer_dir=args.tokenizer_dir or args.checkpoint,
        test_ckpt_name=args.checkpoint,
        num_test_beams=1 if args.greedy else 4,
        model_preset=args.model_preset,
        image_size=args.image_size,
        decoder_max_len=args.decoder_max_len,
        mbatch_size=args.mbatch_size,
    )
    scores = run_test(task)
    for k, v in sorted(scores.items()):
        print(f"{k}: {v}")

    ours_csvs = sorted(glob.glob(os.path.join(task.exp_dir_trial, "generated_reports", "*.csv")))
    print(f"our reports: {ours_csvs[-1]}")
    if args.reference_csv:
        ref = pd.read_csv(glob.glob(args.reference_csv)[0])
        ours = pd.read_csv(ours_csvs[-1])
        key = "dicom_id" if "dicom_id" in ref.columns else "study_id"
        merged = ref.merge(ours, on=key, suffixes=("_ref", "_ours"))
        for col in ("findings", "impression"):
            match = (
                merged[f"{col}_ref"].fillna("").astype(str).str.strip()
                == merged[f"{col}_ours"].fillna("").astype(str).str.strip()
            )
            print(f"{col}: {match.mean() * 100:.2f}% identical ({match.sum()}/{len(merged)})")


if __name__ == "__main__":
    main()
