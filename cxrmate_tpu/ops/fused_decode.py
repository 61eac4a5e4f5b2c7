"""Fused decoder-layer decode step (Pallas).

One kernel per BERT decoder layer per generated token: QKV projection, KV-cache
insert, masked self-attention over the cache, output projection + LayerNorm,
cross-attention over the (static) encoder K/V, and the FFN — all in a single
Mosaic kernel with every operand VMEM-resident. Replaces ~15 separate XLA ops per
layer per step; the decode loop is op-overhead-bound (XLA cost analysis: ~2.5% MXU,
~10% HBM at batch 16), so kernel-count reduction is the lever.

Numerics match models/bert.py's XLA path: fp32 score/accumulation, additive masks
with finfo.min, LN in fp32 (eps 1e-12). Equality with ``bert_step`` is asserted in
tests/test_fused_decode.py (interpret mode).

VMEM budget at batch 16 (cxrmate sizes): layer weights ~15 MB + cross K/V ~56 MB +
self cache ~12 MB — fits v5e's 128 MB. The caller falls back to the XLA path when
the estimate exceeds the budget or LoRA adapters are present.
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
    out_ref, cache_k_out, cache_v_out,
    *, heads: int, head_dim: int, eps: float,
):
    idx = index_ref[0]
    h = hidden_ref[:].astype(jnp.float32)  # [B, D]
    b, d = h.shape

    def dense(w_ref, b_ref, x):
        y = jnp.dot(x, w_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
        return y + b_ref[:].astype(jnp.float32)

    def layer_norm(x, s_ref, b2_ref):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return y * s_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)

    scale = 1.0 / math.sqrt(head_dim)

    # ---- self attention ----
    q = dense(wq_ref, bq_ref, h).reshape(b, heads, head_dim)
    k_new = dense(wk_ref, bk_ref, h).reshape(b, heads, head_dim)
    v_new = dense(wv_ref, bv_ref, h).reshape(b, heads, head_dim)
    cache_dtype = cache_k_out.dtype
    cache_k_out[:, :, pl.ds(idx, 1), :] = k_new[:, :, None, :].astype(cache_dtype)
    cache_v_out[:, :, pl.ds(idx, 1), :] = v_new[:, :, None, :].astype(cache_dtype)

    k_cache = cache_k_out[:].astype(jnp.float32)  # [B, H, T, Dh] (includes new slot)
    v_cache = cache_v_out[:].astype(jnp.float32)
    scores = jnp.sum(q[:, :, None, :] * k_cache, axis=-1) * scale  # [B, H, T]
    mask = key_mask_ref[:].astype(jnp.float32)  # [B, T]
    scores = scores + ((1.0 - mask) * NEG)[:, None, :]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    ctx = jnp.sum(p[:, :, :, None] * v_cache, axis=2)  # [B, H, Dh]
    attn = dense(wo_ref, bo_ref, ctx.reshape(b, d))
    h = layer_norm(attn + h, ln1s_ref, ln1b_ref)

    # ---- cross attention ----
    cq = dense(wcq_ref, bcq_ref, h).reshape(b, heads, head_dim)
    ck = cross_k_ref[:].astype(jnp.float32)  # [B, H, S, Dh]
    cv = cross_v_ref[:].astype(jnp.float32)
    cscores = jnp.sum(cq[:, :, None, :] * ck, axis=-1) * scale  # [B, H, S]
    cmask = cross_mask_ref[:].astype(jnp.float32)
    cscores = cscores + ((1.0 - cmask) * NEG)[:, None, :]
    cm = jnp.max(cscores, axis=-1, keepdims=True)
    cp = jnp.exp(cscores - cm)
    cp = cp / jnp.sum(cp, axis=-1, keepdims=True)
    cctx = jnp.sum(cp[:, :, :, None] * cv, axis=2)
    cattn = dense(wco_ref, bco_ref, cctx.reshape(b, d))
    h = layer_norm(cattn + h, ln2s_ref, ln2b_ref)

    # ---- FFN ----
    y = dense(w1_ref, b1_ref, h)
    # exact (erf) gelu; jax.nn.gelu(approximate=False) lowers via erfc, which
    # Mosaic doesn't implement — spell it with erf directly
    y = 0.5 * y * (1.0 + jax.lax.erf(y * (2.0 ** -0.5)))
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
    key_mask: jnp.ndarray,    # [B, T]
    cross_mask: jnp.ndarray,  # [B, S]
    eps: float = 1e-12,
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
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
    n_inputs = len(tensors)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_inputs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    )
    out, new_k, new_v = pl.pallas_call(
        functools.partial(_kernel, heads=heads, head_dim=dh, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), hidden.dtype),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        input_output_aliases={n_inputs - 3: 1, n_inputs - 2: 2},  # cache_k/v in-place
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
    )(index.reshape(1).astype(jnp.int32), *tensors)
    return out, new_k, new_v


def supports(layer: dict, cache_k: jnp.ndarray, cross_k: jnp.ndarray) -> bool:
    """Whether the fused path applies: no LoRA, and a rough VMEM-fit check."""
    if "lora_a" in layer["self"]["q"]:
        return False
    itemsize = jnp.dtype(cache_k.dtype).itemsize
    budget = 110 * 1024 * 1024
    weights = sum(
        w.size * jnp.dtype(w.dtype).itemsize
        for part in ("self", "cross", "mlp")
        for leaf in jax.tree_util.tree_leaves(layer[part])
        for w in [leaf]
    )
    caches = (2 * cache_k.size + 2 * cross_k.size) * itemsize
    return weights + caches < budget
