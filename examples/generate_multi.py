"""Usage example: multi-image (per-study) report generation
(the aehrc/cxrmate-multi-tf flow, mirroring /root/reference/examples/cxrmate-multi-tf.ipynb).

All images of one study are stacked on an image axis; multiple studies are
zero-padded to the widest image count (an image is treated as padding iff its
[0,0,0] pixel is 0 — modelling_multi.py:80)."""

import argparse

import numpy as np

from cxrmate_tpu.data.image import eval_transform, load_image
from cxrmate_tpu.models.api import CXRMate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="HF checkpoint dir (aehrc/cxrmate-multi-tf)")
    p.add_argument("--images", nargs="+", required=True, help="JPEGs of ONE study")
    p.add_argument("--num-beams", type=int, default=4)
    args = p.parse_args()

    model = CXRMate.from_hf_checkpoint(args.checkpoint, variant="multi")
    study = np.stack([eval_transform(load_image(p)) for p in args.images])
    pixels = study[None]  # [1, N, 3, 384, 384]
    findings, impression = model.generate_report(pixels, num_beams=args.num_beams)
    print(f"Findings: {findings[0]}\nImpression: {impression[0]}")


if __name__ == "__main__":
    main()
