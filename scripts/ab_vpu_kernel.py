"""Hardware A/B for the VPU-only decode-attention kernel (VERDICT r3 stretch).

Question: can a Pallas kernel that decomposes the M=1 cross-attention into the
SAME f32 elementwise multiply+reduce ops as XLA's matvec lowering reproduce
XLA's results bit-for-bit on the TPU (unlike the MXU rowgroup kernel, whose
f32 accumulation rounds differently), while keeping the rowgroup kernel's
streaming-bandwidth win?

Three phases, each printed as it lands (run on the real TPU):
  1. op-level bitwise comparison at the real greedy cross shape
     (b=96, h=12, m=1, s=1154, dh=64, bf16) — vpu-rowgroup AND mxu-rowgroup
     vs the XLA attention path;
  2. full greedy decode token identity (batch 96, 255 tokens):
     cross-vpu-rowgroup:4 vs the default XLA decode;
  3. throughput: greedy-96 studies/s for XLA vs cross-rowgroup:4 (MXU) vs
     cross-vpu-rowgroup:4.

Results → DEVNOTES.md round 4; if bit-exact AND fast, the VPU kernel becomes
a defaultable serving config instead of the opt-in non-exact MXU one.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from cxrmate_tpu.ops.decode_attention import (
        decode_attention_rowgroup,
        decode_attention_rowgroup_vpu,
    )
    from cxrmate_tpu.ops.layers import attention

    b, h, m, s, dh = 96, 12, 1, 1154, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, m, dh), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, s, dh), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, s, dh), jnp.bfloat16)
    # realistic additive key mask: a few all-zero-image tails masked off
    maskbits = np.ones((b, s), np.float32)
    maskbits[:8, s // 2:] = 0.0
    mask2d = jnp.asarray((1.0 - maskbits) * float(np.finfo(np.float32).min))
    scale = dh ** -0.5

    want = np.asarray(jax.jit(
        lambda q, k, v, m2: attention(q, k, v, scale, m2[:, None, None, :])
    )(q, k, v, mask2d))
    for name, fn in (
        ("vpu-rowgroup:4", lambda: decode_attention_rowgroup_vpu(q, k, v, mask2d, scale, group=4)),
        ("mxu-rowgroup:4", lambda: decode_attention_rowgroup(q, k, v, mask2d, scale, group=4)),
    ):
        got = np.asarray(fn())
        eq = np.array_equal(got.view(np.uint16), want.view(np.uint16))
        n_diff = int((got.view(np.uint16) != want.view(np.uint16)).sum())
        max_ulp = 0
        if not eq:
            gi = got.astype(np.float32)
            wi = want.astype(np.float32)
            max_abs = float(np.abs(gi - wi).max())
            print(f"[1] {name}: NOT bit-equal — {n_diff}/{got.size} elements differ, "
                  f"max |Δ| {max_abs:.3e}", flush=True)
        else:
            print(f"[1] {name}: BIT-EQUAL to the XLA attention path", flush=True)

    # phase 2+3: full pipeline (reuses bench.py's builders)
    import bench

    sps_xla, _ = bench.run(iters=3)
    print(f"[3] greedy-96 XLA: {sps_xla:.2f} studies/s", flush=True)

    import jax.numpy as jnp  # noqa: F811
    from cxrmate_tpu.configs import multi_tf_config
    from cxrmate_tpu.generate import GenerationConfig, generate
    from cxrmate_tpu.models import encoder_decoder as ed

    config = multi_tf_config(vocab_size=30000)
    variables = bench.build(config)
    pixels = jnp.asarray(np.random.RandomState(0).randn(16, 2, 3, 384, 384), jnp.bfloat16)
    gen_cfg = GenerationConfig(max_new_tokens=255, bos_token_id=1, eos_token_id=2,
                               pad_token_id=4, special_token_ids=(3,))

    def decode(kernel):
        enc_hidden, enc_mask, _ = ed.encode_images(variables, pixels, config)
        prompt = jnp.full((pixels.shape[0], 1), 1, jnp.int32)
        return np.asarray(generate(variables, config, gen_cfg, enc_hidden, enc_mask,
                                   prompt, jnp.ones_like(prompt),
                                   cache_segments="4:32", decode_kernel=kernel))

    base = decode("")
    for spec in ("cross-vpu-rowgroup:4",):
        toks = decode(spec)
        ident = np.array_equal(toks, base)
        print(f"[2] {spec}: tokens {'IDENTICAL' if ident else 'DIFFER'} "
              f"({(toks != base).sum()}/{toks.size} positions)", flush=True)

    for spec in ("cross-rowgroup:4", "cross-vpu-rowgroup:4"):
        sps, dt = bench.run(iters=3, decode_kernel=spec)
        print(f"[3] greedy-96 {spec}: {sps:.2f} studies/s ({dt * 1e3:.0f} ms/batch)",
              flush=True)


if __name__ == "__main__":
    main()
