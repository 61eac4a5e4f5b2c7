"""Fused decoder-layer decode step (Pallas).

One kernel per BERT decoder layer per generated token: QKV projection, masked
self-attention over the KV cache (with the just-computed token handled as an extra
attention column), output projection + LayerNorm, cross-attention over the static
encoder K/V, and the FFN — in a single Mosaic kernel with every operand
VMEM-resident. Replaces ~20 separate XLA ops per layer per step; the decode loop is
op-overhead-bound (XLA cost analysis: ~2.5% MXU, ~10% HBM at batch 16), so
kernel-count reduction is the lever.

The new token's K/V are kernel *outputs* (the cache insert stays a cheap XLA
dynamic_update_slice): Mosaic cannot lower the unit-sublane stores a 4D in-kernel
cache write needs, and returning them also avoids writing the whole cache back to
HBM every step.

Numerics match models/bert.py's XLA path: fp32 scores/accumulation, additive masks
with finfo.min, fp32 LayerNorm (eps 1e-12), exact-erf GELU (spelled via the
Abramowitz–Stegun erf — Mosaic has no erf primitive; |err| ≤ 1.5e-7). Greedy token
equality with the XLA path is asserted in tests/test_fused_decode.py.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(jnp.finfo(jnp.float32).min)

# Set True to run the kernel in interpreter mode (CPU tests); the TPU path uses
# the compiled Mosaic kernel.
INTERPRET = False


def _phi(y):
    """0.5·(1 + erf(y/√2)) with the Abramowitz–Stegun 7.1.26 rational erf
    (|err| ≤ 1.5e-7 — below fp32 gelu round-off; Mosaic has no erf primitive)."""
    x = y * (2.0 ** -0.5)
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = sign * (1.0 - poly * jnp.exp(-ax * ax))
    return 0.5 * (1.0 + erf)


def _kernel(
    # scalar prefetch
    index_ref,
    # tensors
    hidden_ref, key_mask_ref, cross_mask_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    ln1s_ref, ln1b_ref,
    wcq_ref, bcq_ref, wco_ref, bco_ref, ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, ln3s_ref, ln3b_ref,
    cache_k_ref, cache_v_ref, cross_k_ref, cross_v_ref,
    # outputs
    out_ref, k_new_ref, v_new_ref,
    *, heads: int, head_dim: int, eps: float,
):
    idx = index_ref[0]
    h = hidden_ref[:].astype(jnp.float32)  # [B, D]
    b, d = h.shape
    dh = head_dim
    t = cache_k_ref.shape[2]

    def dense(w_ref, b_ref, x):
        y = jnp.dot(x, w_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
        return y + b_ref[:].astype(jnp.float32)

    def layer_norm(x, s_ref, b2_ref):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return y * s_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)

    scale = 1.0 / math.sqrt(dh)

    # ---- self attention ----
    q = dense(wq_ref, bq_ref, h)
    k_new = dense(wk_ref, bk_ref, h)
    v_new = dense(wv_ref, bv_ref, h)
    k_new_ref[:] = k_new.astype(k_new_ref.dtype)
    v_new_ref[:] = v_new.astype(v_new_ref.dtype)

    # mask over OLD cache entries: positions < idx per the running key mask
    col = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    old_mask = key_mask_ref[:].astype(jnp.float32) * (col < idx).astype(jnp.float32)
    add_old = (1.0 - old_mask) * NEG
    # the new token's own column obeys the mask too (a pad/mask-token query does not
    # attend to itself — longitudinal semantics); masked-reduce instead of a dynamic
    # lane-dim slice (Mosaic can't lower that gather)
    km_idx = jnp.sum(
        key_mask_ref[:].astype(jnp.float32) * (col == idx).astype(jnp.float32),
        axis=1, keepdims=True,
    )
    add_new = (1.0 - km_idx) * NEG  # [B,1]

    ctx_parts = []
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh = q[:, sl]                                       # [B, Dh]
        kh = cache_k_ref[:, hh, :, :].astype(jnp.float32)   # [B, T, Dh]
        vh = cache_v_ref[:, hh, :, :].astype(jnp.float32)
        s_old = jnp.sum(qh[:, None, :] * kh, axis=-1) * scale + add_old  # [B, T]
        s_new = jnp.sum(qh * k_new[:, sl], axis=-1, keepdims=True) * scale + add_new  # [B, 1]
        s_full = jnp.concatenate([s_old, s_new], axis=1)    # [B, T+1]
        m = jnp.max(s_full, axis=-1, keepdims=True)
        p = jnp.exp(s_full - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # slice-then-newaxis in one subscript lowers through a gather Mosaic
        # rejects; split into an explicit slice and a separate expand
        p_old = jax.lax.slice(p, (0, 0), (b, t))
        p_new = jax.lax.slice(p, (0, t), (b, t + 1))
        ctx = jnp.sum(p_old[:, :, None] * vh, axis=1) + p_new * v_new[:, sl]
        ctx_parts.append(ctx)
    attn = dense(wo_ref, bo_ref, jnp.concatenate(ctx_parts, axis=1))
    h = layer_norm(attn + h, ln1s_ref, ln1b_ref)

    # ---- cross attention ----
    cq = dense(wcq_ref, bcq_ref, h)
    add_cross = (1.0 - cross_mask_ref[:].astype(jnp.float32)) * NEG
    cctx_parts = []
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh = cq[:, sl]
        kh = cross_k_ref[:, hh, :, :].astype(jnp.float32)
        vh = cross_v_ref[:, hh, :, :].astype(jnp.float32)
        s = jnp.sum(qh[:, None, :] * kh, axis=-1) * scale + add_cross
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        cctx_parts.append(jnp.sum(p[:, :, None] * vh, axis=1))
    cattn = dense(wco_ref, bco_ref, jnp.concatenate(cctx_parts, axis=1))
    h = layer_norm(cattn + h, ln2s_ref, ln2b_ref)

    # ---- FFN ----
    y = dense(w1_ref, b1_ref, h)
    y = y * _phi(y)  # exact-erf gelu
    y = dense(w2_ref, b2_ref, y)
    h = layer_norm(y + h, ln3s_ref, ln3b_ref)

    out_ref[:] = h.astype(out_ref.dtype)


def fused_layer_step(
    hidden: jnp.ndarray,      # [B, D]
    layer: dict,              # one layer of bert params (self/cross/mlp)
    cache_k: jnp.ndarray,     # [B, H, T, Dh]
    cache_v: jnp.ndarray,
    cross_k: jnp.ndarray,     # [B, H, S, Dh]
    cross_v: jnp.ndarray,
    index: jnp.ndarray,       # scalar int32
    key_mask: jnp.ndarray,    # [B, T] (includes the current position; the kernel
                              # restricts to < index and scores the new token itself)
    cross_mask: jnp.ndarray,  # [B, S]
    eps: float = 1e-12,
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (hidden_out [B, D], cache_k', cache_v') with the new token inserted."""
    if interpret is None:
        interpret = INTERPRET
    b, d = hidden.shape
    heads, t, dh = cache_k.shape[1], cache_k.shape[2], cache_k.shape[3]
    sp, cp, mp = layer["self"], layer["cross"], layer["mlp"]
    tensors = [
        hidden, key_mask.astype(jnp.int32), cross_mask.astype(jnp.int32),
        sp["q"]["w"], sp["q"]["b"], sp["k"]["w"], sp["k"]["b"],
        sp["v"]["w"], sp["v"]["b"], sp["out"]["w"], sp["out"]["b"],
        sp["ln"]["scale"], sp["ln"]["bias"],
        cp["q"]["w"], cp["q"]["b"], cp["out"]["w"], cp["out"]["b"],
        cp["ln"]["scale"], cp["ln"]["bias"],
        mp["fc1"]["w"], mp["fc1"]["b"], mp["fc2"]["w"], mp["fc2"]["b"],
        mp["ln"]["scale"], mp["ln"]["bias"],
        cache_k, cache_v, cross_k, cross_v,
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(tensors),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    )
    out, k_new, v_new = pl.pallas_call(
        functools.partial(_kernel, heads=heads, head_dim=dh, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), hidden.dtype),
            jax.ShapeDtypeStruct((b, d), cache_k.dtype),
            jax.ShapeDtypeStruct((b, d), cache_v.dtype),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )(index.reshape(1).astype(jnp.int32), *tensors)
    k_h = k_new.reshape(b, heads, 1, dh)
    v_h = v_new.reshape(b, heads, 1, dh)
    cache_k = jax.lax.dynamic_update_slice(cache_k, k_h, (0, 0, index, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v_h, (0, 0, index, 0))
    return out, cache_k, cache_v


def supports(layer: dict, cache_k: jnp.ndarray, cross_k: jnp.ndarray) -> bool:
    """Whether the fused path applies: no LoRA, and a rough VMEM-fit check."""
    if "lora_a" in layer["self"]["q"]:
        return False
    itemsize = jnp.dtype(cache_k.dtype).itemsize
    budget = 110 * 1024 * 1024
    weights = sum(
        w.size * jnp.dtype(w.dtype).itemsize
        for leaf in jax.tree_util.tree_leaves(
            {k: layer[k] for k in ("self", "cross", "mlp")}
        )
        for w in [leaf]
    )
    caches = (2 * cache_k.size + 2 * cross_k.size) * itemsize
    return weights + caches < budget
