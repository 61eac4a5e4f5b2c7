"""Usage example: longitudinal report generation with a previous-report prompt
(the aehrc/cxrmate flow, mirroring /root/reference/examples/cxrmate.ipynb).

Images of one study are stacked on an image axis and zero-padded across studies;
the previous study's findings/impression (or None for no prior) form the prompt."""

import argparse

import numpy as np

from cxrmate_tpu.data.image import eval_transform, load_image
from cxrmate_tpu.models.api import CXRMate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="HF checkpoint dir (aehrc/cxrmate or aehrc/cxrmate-tf)")
    p.add_argument("--images", nargs="+", required=True, help="JPEGs of ONE study")
    p.add_argument("--previous-findings", default=None)
    p.add_argument("--previous-impression", default=None)
    p.add_argument("--num-beams", type=int, default=4)
    args = p.parse_args()

    model = CXRMate.from_hf_checkpoint(args.checkpoint, variant="longitudinal")
    study = np.stack([eval_transform(load_image(p)) for p in args.images])
    pixels = study[None]  # [1, N, 3, 384, 384]
    findings, impression = model.generate_report(
        pixels,
        previous_findings=[args.previous_findings],
        previous_impression=[args.previous_impression],
        num_beams=args.num_beams,
    )
    print(f"Findings: {findings[0]}\nImpression: {impression[0]}")


if __name__ == "__main__":
    main()
