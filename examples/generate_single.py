"""Usage example: single-image report generation (the cxrmate-single-tf flow,
mirroring /root/reference/examples/cxrmate-single-tf.ipynb).

Point --checkpoint at a local copy of the released HF checkpoint directory
(config + safetensors/bin + tokenizer.json)."""

import argparse

import numpy as np

from cxrmate_tpu.data.image import eval_transform, load_image
from cxrmate_tpu.models.api import CXRMate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="HF checkpoint dir (aehrc/cxrmate-single-tf)")
    p.add_argument("--images", nargs="+", required=True, help="chest X-ray JPEG paths")
    p.add_argument("--num-beams", type=int, default=4)
    args = p.parse_args()

    model = CXRMate.from_hf_checkpoint(args.checkpoint, variant="single")
    pixels = np.stack([eval_transform(load_image(p)) for p in args.images])  # [B,3,384,384]
    findings, impression = model.generate_report(pixels, num_beams=args.num_beams)
    for path, f, i in zip(args.images, findings, impression):
        print(f"== {path}\nFindings: {f}\nImpression: {i}\n")


if __name__ == "__main__":
    main()
