"""Convert checkpoints between formats.

  hf → orbax:   python scripts/convert_checkpoint.py --src /path/hf_dir --dst out/ --variant multi
  orbax → hf:   python scripts/convert_checkpoint.py --src out/ --dst sd.npz --variant multi --export

The hf→ours direction ingests the released cxrmate checkpoint directories
(safetensors/bin); the export direction produces a torch-layout state dict
(the role of the reference's *_model_to_hub notebooks)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--variant", default="multi", choices=["single", "multi", "longitudinal"])
    p.add_argument("--vocab-size", type=int, default=30000)
    p.add_argument("--export", action="store_true", help="ours → torch-layout npz")
    args = p.parse_args()

    from cxrmate_tpu import configs
    from cxrmate_tpu.ckpt import orbax_io
    from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder, export_encoder_decoder

    if args.variant == "single":
        cfg = configs.single_tf_config(args.vocab_size)
    elif args.variant == "multi":
        cfg = configs.multi_tf_config(args.vocab_size)
    else:
        cfg = configs.longitudinal_config(args.vocab_size)

    if args.export:
        import numpy as np

        state = orbax_io.restore_checkpoint(args.src, None)
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
        sd = export_encoder_decoder(variables, cfg.encoder, cfg.decoder)
        np.savez(args.dst, **sd)
        print(f"wrote {len(sd)} tensors to {args.dst}")
    else:
        sd = orbax_io.load_hf_pretrained_dir(args.src)
        variables = convert_encoder_decoder(sd, cfg.encoder, cfg.decoder)
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(args.dst), variables, force=True)
        ckptr.wait_until_finished()
        print(f"converted {args.src} → {args.dst}")


if __name__ == "__main__":
    main()
