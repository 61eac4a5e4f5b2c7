"""Hardware A/B for the int8 cross-KV decode kernel (cross-rowgroup-q8).

The greedy decode step is ~70% cross-KV bf16 streaming at ~370-400 GB/s
(DEVNOTES round 3 traces); the q8 kernel streams an int8-quantised cross cache
(+ per-key f32 scales folded into the [M, S] tensors) — ~53% of the bytes —
with the dequant CONVERT done in VMEM (the round-2 XLA int8 attempt lost
because XLA materialised the dequantised bf16 arrays in HBM every step).

Three phases, each printed as it lands (run on the real TPU):
  1. op-level error stats at the real greedy cross shape
     (b=96, h=12, m=1, s=1154, dh=64, bf16): q8 kernel vs the XLA attention
     path — int8 quantisation noise, NOT expected to be bit-exact;
  2. full greedy decode (batch 96, 255 tokens): per-position token agreement
     between the exact XLA decode and cross-rowgroup-q8:4 on the same
     weights/pixels (random weights = a pessimistic agreement bound: real
     checkpoints have larger logit margins);
  3. throughput: greedy-96 studies/s for XLA / cross-rowgroup:4 (bf16 MXU)
     / cross-rowgroup:6 / cross-rowgroup-q8:4 / cross-rowgroup-q8:8.

Results → DEVNOTES.md round 4. Serving-only numerics: the parity/golden-CSV
paths keep the exact XLA decode regardless of the outcome.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from cxrmate_tpu.ops.decode_attention import (
        decode_attention_rowgroup_q8,
        quantize_kv_rowwise,
    )
    from cxrmate_tpu.ops.layers import attention

    # ---- phase 1: op-level error at the real cross shape ----
    b, h, m, s, dh = 96, 12, 1, 1154, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, m, dh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, s, dh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, s, dh), jnp.bfloat16)
    maskbits = np.ones((b, s), np.float32)
    maskbits[:8, s // 2:] = 0.0
    mask2d = jnp.asarray((1.0 - maskbits) * float(np.finfo(np.float32).min))
    scale = dh ** -0.5

    want = np.asarray(jax.jit(
        lambda q, k, v, m2: attention(q, k, v, scale, m2[:, None, None, :])
    )(q, k, v, mask2d), dtype=np.float32)
    kq, ks = quantize_kv_rowwise(k)
    vq, vs = quantize_kv_rowwise(v)
    for g in (4, 8):
        got = np.asarray(
            decode_attention_rowgroup_q8(q, kq, ks, vq, vs, mask2d, scale, group=g),
            dtype=np.float32,
        )
        err = np.abs(got - want)
        print(f"[op] q8 rowgroup:{g} vs XLA: max|Δ| {err.max():.4g}, "
              f"rms {np.sqrt((err ** 2).mean()):.4g} "
              f"(ctx rms {np.sqrt((want ** 2).mean()):.4g})", flush=True)

    # ---- phase 2: full-decode token agreement ----
    import jax.numpy as jnp  # noqa: F811

    from cxrmate_tpu.configs import multi_tf_config

    config = multi_tf_config(vocab_size=30000)
    variables = bench.build(config)
    pixels = jnp.asarray(
        np.random.RandomState(0).randn(bench.BATCH, bench.N_IMAGES, 3, 384, 384),
        jnp.bfloat16,
    )
    pipe_exact = bench.make_pipeline(config, variables, bench.BATCH, bench.DECODE_TOKENS)
    pipe_q8 = bench.make_pipeline(config, variables, bench.BATCH, bench.DECODE_TOKENS,
                                  decode_kernel="cross-rowgroup-q8:4")
    seq_exact = np.asarray(pipe_exact(variables, pixels))
    seq_q8 = np.asarray(pipe_q8(variables, pixels))
    gen_cols = seq_exact[:, 1:]  # generated region (col 0 is BOS)
    agree = (gen_cols == seq_q8[:, 1:]).mean()
    ident_rows = (gen_cols == seq_q8[:, 1:]).all(axis=1).mean()
    print(f"[decode] token agreement exact vs q8:4 — {agree * 100:.2f}% of "
          f"positions, {ident_rows * 100:.1f}% of rows identical "
          f"(random weights: pessimistic bound)", flush=True)

    # ---- phase 3: throughput ----
    for spec in (None, "cross-rowgroup:4", "cross-rowgroup:6",
                 "cross-rowgroup-q8:4", "cross-rowgroup-q8:8"):
        t0 = time.time()
        try:
            sps, dt = bench.run(decode_kernel=spec)
            print(f"[perf] {spec or 'XLA'}: {sps:.2f} studies/s "
                  f"({dt * 1e3:.1f} ms/batch; compile+run {time.time() - t0:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - an uncompilable variant is a result
            print(f"[perf] {spec or 'XLA'}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
