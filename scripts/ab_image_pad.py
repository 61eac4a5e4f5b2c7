"""Hardware A/B: cost of fixed 5-slot image padding vs per-batch trimming.

Quantifies what `pad_images: batch` (the round-3 default collate,
cli/stages.py:_collate_max_images) saves for studies with fewer images than
`max_images_per_study`: the encoder folds every slot through CvT and the
cross-KV cache width is `n_slots * 576`, so all-zero padding slots cost real
conv FLOPs and — dominantly — dead cross-KV streaming bytes every decode step
(DEVNOTES round 3: cross-attention KV streaming is ~70% of the greedy step).

Run on the TPU: `python scripts/ab_image_pad.py [--beam]`. Prints one JSON line
with studies/sec for 2-real-image studies padded to 5 slots (the old fixed pad)
vs trimmed to 2 (the new per-batch pad). Results → DEVNOTES.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def measure(pipeline, variables, pixels, iters=3):
    np.asarray(pipeline(variables, pixels))  # compile + warm
    t0 = time.perf_counter()
    outs = [pipeline(variables, pixels) for _ in range(iters)]
    np.asarray(outs[-1])  # fence (axon: block_until_ready returns early)
    return (time.perf_counter() - t0) / iters


def main():
    import jax.numpy as jnp

    from cxrmate_tpu.configs import multi_tf_config

    beam = "--beam" in sys.argv
    batch = bench.BEAM_BATCH if beam else bench.BATCH
    config = multi_tf_config(vocab_size=30000)
    variables = bench.build(config)
    rng = np.random.RandomState(0)
    real = rng.randn(batch, 2, 3, 384, 384)
    padded = np.zeros((batch, 5, 3, 384, 384), np.float32)
    padded[:, :2] = real
    if beam:
        pipeline = bench.make_beam_pipeline(config, bench.DECODE_TOKENS)
    else:
        pipeline = bench.make_pipeline(config, variables, batch, bench.DECODE_TOKENS)
    out = {"mode": "beam4" if beam else "greedy", "batch": batch, "real_images": 2}
    for name, pix in (("trimmed_2slot", real), ("padded_5slot", padded)):
        dt = measure(pipeline, variables, jnp.asarray(pix, jnp.bfloat16))
        out[f"{name}_studies_per_sec"] = round(batch / dt, 3)
        out[f"{name}_batch_ms"] = round(dt * 1e3, 1)
        print(f"{name}: {batch / dt:.2f} studies/s ({dt * 1e3:.1f} ms/batch)",
              file=sys.stderr)
    out["speedup"] = round(
        out["trimmed_2slot_studies_per_sec"] / out["padded_5slot_studies_per_sec"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
