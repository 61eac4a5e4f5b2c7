"""Hardware A/B for quantising/kernel-routing the SELF-KV decode stream
(VERDICT r4 item 4: "attack the next decode stream: self-KV").

Context (DEVNOTES rounds 3-4): with the int8 cross-KV kernel shipped
(cross-rowgroup-q8:4, +54% greedy), the q8 greedy step's remaining HBM bytes
are the self-KV stream + carry. Unlike the loop-invariant cross cache, the
self cache gains ONE row per step, so a q8 self path must quantise
incrementally (append the new row's int8+scale each step, never requantise).
Before paying for that plumbing, this measures the per-op ceiling on hardware
at the REAL segmented greedy self shapes (b=96, h=12, m=1, dh=64,
T = the 4:32 phase widths 64/128/192/256):

  1. XLA self-attention (the shipped path — what the kernel must beat);
  2. bf16 rowgroup kernel (the round-3 all-attention loser, re-measured at
     self shapes in isolation);
  3. q8 rowgroup kernel over a pre-quantised cache + the incremental
     per-step quantise+append cost it would add.

Round-3 context for the prior: routing self through the bf16 kernel cost
~4.7 studies/s in-pipeline (cross-rowgroup 49.7 vs all-rowgroup 42.7) because
the segmented self blocks are SMALL and pallas_call fixed costs dominate where
XLA's fusions are already optimal. q8 halves the bytes of that already-small
stream, so the fixed overhead matters MORE. If q8-self loses (or wins by less
than the incremental-quantise cost) at the per-op level here, it cannot win
in-pipeline and the directive closes as a documented negative result.

Run on the real TPU; results -> DEVNOTES round 5.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _fence(out):
    """Materialise every leaf on host (axon: block_until_ready returns early;
    outputs may be pytrees, e.g. quant_append's (int8 cache, scales))."""
    import jax
    jax.tree_util.tree_map(np.asarray, out)


def bench_op(fn, *args, iters=50):
    _fence(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us/op


def main():
    import jax
    import jax.numpy as jnp

    from cxrmate_tpu.ops.decode_attention import (
        decode_attention_rowgroup,
        decode_attention_rowgroup_q8,
        quantize_kv_rowwise,
    )
    from cxrmate_tpu.ops.layers import attention

    b, h, m, dh = 96, 12, 1, 64
    scale = dh ** -0.5
    rng = np.random.RandomState(0)
    print(f"self-attention decode op A/B  b={b} h={h} m={m} dh={dh}  (us/op; "
          "6 layers x 255 steps multiply per-step costs by 6)")
    print(f"{'T':>5} {'xla':>9} {'rowgroup:4':>11} {'q8:4':>9} {'q8:8':>9} "
          f"{'quant+append':>13}")
    xla_attn = jax.jit(
        lambda q, k, v, m2: attention(q, k, v, scale, m2[:, None, None, :])
    )

    # donate the cache args: in the real decode loop the q8 cache is a scan
    # carry updated in place — without donation this jit would time a full
    # cache copy per call and overstate the incremental cost ~100x
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def quant_append(kcache_q, kcache_s, new_row, idx):
        """The per-step incremental cost a q8 self cache adds: quantise the
        step's new [B, H, dh] K row (per-row symmetric int8) and write the
        int8 row + its scale into the carried cache at ``idx``."""
        xf = new_row.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)  # [B, H]
        s = jnp.where(amax > 0, amax / 127.0, 1.0)
        qrow = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
        kcache_q = jax.lax.dynamic_update_slice(
            kcache_q, qrow[:, :, None, :], (0, 0, idx, 0))
        # scales are [B, H, 1, S] (S on the lane axis — quantize_kv_rowwise)
        kcache_s = jax.lax.dynamic_update_slice(
            kcache_s, s[:, :, None, None].astype(jnp.float32), (0, 0, 0, idx))
        return kcache_q, kcache_s

    for t in (64, 128, 192, 256):
        q = jnp.asarray(rng.randn(b, h, m, dh), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, h, t, dh), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, h, t, dh), jnp.bfloat16)
        maskbits = np.ones((b, t), np.float32)
        maskbits[:, t - t // 4:] = 0.0  # live prefix like mid-phase decode
        mask2d = jnp.asarray((1.0 - maskbits) * float(np.finfo(np.float32).min))
        us_xla = bench_op(xla_attn, q, k, v, mask2d)
        us_rg = bench_op(
            lambda q, k, v, m2: decode_attention_rowgroup(q, k, v, m2, scale, group=4),
            q, k, v, mask2d)
        kq, ks = quantize_kv_rowwise(k)
        vq, vs = quantize_kv_rowwise(v)
        us_q8 = {}
        for g in (4, 8):
            us_q8[g] = bench_op(
                lambda q, kq, ks, vq, vs, m2, g=g: decode_attention_rowgroup_q8(
                    q, kq, ks, vq, vs, m2, scale, group=g),
                q, kq, ks, vq, vs, mask2d)
        new_row = jnp.asarray(rng.randn(b, h, dh), jnp.bfloat16)

        def bench_quant_append(iters=50):
            # donated args: thread the cache through the loop like the real
            # decode carry (each call consumes the previous call's output)
            cq, cs = quant_append(jnp.array(kq), ks.astype(jnp.float32),
                                  new_row, jnp.int32(t // 2))  # compile+warm
            _fence((cq[0, 0, 0], cs[0, 0, 0]))
            t0 = time.perf_counter()
            for _ in range(iters):
                cq, cs = quant_append(cq, cs, new_row, jnp.int32(t // 2))
            _fence((cq[0, 0, 0], cs[0, 0, 0]))
            return (time.perf_counter() - t0) / iters * 1e6

        us_qa = bench_quant_append()
        print(f"{t:>5} {us_xla:>9.1f} {us_rg:>11.1f} {us_q8[4]:>9.1f} "
              f"{us_q8[8]:>9.1f} {us_qa:>13.1f}")
    print("\nper-STEP deltas (x6 layers, x2 K/V for quant+append which is per-"
          "tensor): a q8-self win needs 6*(xla - q8) > 12*quant_append, at the "
          "AVERAGE phase width (~T=160 for 4:32 at 256 tokens).")


if __name__ == "__main__":
    main()
