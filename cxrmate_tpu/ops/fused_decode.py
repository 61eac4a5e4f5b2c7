"""Fused decoder-layer decode step (Pallas) — EXPERIMENTAL, off by default.

Two variants were built and measured against the XLA decode path (40 studies/s at
batch 16 on v5e):
  * v1 (single mega-kernel per layer): token-identical, but Mosaic compile time
    through this environment's remote-compile tunnel exceeds 25 minutes (12 unrolled
    heads of vector IR).
  * v2 (grid-over-heads, 4 small kernels per layer): compiles in ~20 s but the
    per-head VPU attention (elementwise mult+reduce, sequential grid) measures
    ~2.4 ms/layer — slower than the XLA path's MXU-batched attention einsums.
The XLA while_loop therefore remains the production decode path; these kernels are
kept (with interpret-mode equality tests) as groundwork for an MXU-based fused
attention step.


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


# --------------------------------------------------------------------------- v2
# Grid-over-heads decomposition: the single-program mega-kernel above unrolls all
# heads into one huge vector program (Mosaic compile time explodes through this
# environment's remote-compile tunnel). v2 splits each layer step into four small
# kernels — per-head attention kernels parallelised over the grid plus two dense
# chains — cutting ~20 XLA ops/layer/step to 4 kernels + 2 cache inserts while
# keeping every kernel's IR tiny.
#
# Mosaic restricts lane-dim blocks to multiples of 128 (or the full axis), so
# per-head operands are pre-arranged with the head on a leading axis and dh as the
# full last axis: weights [H, D, dh], biases [H, dh], per-head activations
# [H, B, dh]. ``prepare_layer`` builds these views once per generate call, outside
# the decode loop.


def _qkv_attn_kernel_v2(index_ref, hidden_ref, key_mask_ref,
                        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                        cache_k_ref, cache_v_ref,
                        ctx_ref, k_new_ref, v_new_ref, *, scale: float):
    """Grid over heads. Blocks: hidden [B,D]; w [D,dh]; b [1,dh]; cache [B,T,dh];
    outputs [1,B,dh] slices of [H,B,dh] arrays."""
    idx = index_ref[0]
    h = hidden_ref[:].astype(jnp.float32)
    b = h.shape[0]
    t = cache_k_ref.shape[1]

    def dense(w_ref, b_ref):
        y = jnp.dot(h, w_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
        return y + b_ref[:].astype(jnp.float32)

    qh = dense(wq_ref, bq_ref)          # [B, dh]
    kh_new = dense(wk_ref, bk_ref)
    vh_new = dense(wv_ref, bv_ref)
    k_new_ref[0] = kh_new.astype(k_new_ref.dtype)
    v_new_ref[0] = vh_new.astype(v_new_ref.dtype)

    kh = cache_k_ref[:].astype(jnp.float32)   # [B, T, dh]
    vh = cache_v_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    km = key_mask_ref[:].astype(jnp.float32)
    add_old = (1.0 - km * (col < idx).astype(jnp.float32)) * NEG
    km_idx = jnp.sum(km * (col == idx).astype(jnp.float32), axis=1, keepdims=True)
    add_new = (1.0 - km_idx) * NEG

    s_old = jnp.sum(qh[:, None, :] * kh, axis=-1) * scale + add_old
    s_new = jnp.sum(qh * kh_new, axis=-1, keepdims=True) * scale + add_new
    s_full = jnp.concatenate([s_old, s_new], axis=1)
    m = jnp.max(s_full, axis=-1, keepdims=True)
    p = jnp.exp(s_full - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p_old = jax.lax.slice(p, (0, 0), (b, t))
    p_new = jax.lax.slice(p, (0, t), (b, t + 1))
    ctx_ref[0] = (jnp.sum(p_old[:, :, None] * vh, axis=1) + p_new * vh_new).astype(ctx_ref.dtype)


def _cross_attn_kernel_v2(q_ref, cross_mask_ref, ck_ref, cv_ref, ctx_ref, *, scale: float):
    qh = q_ref[0].astype(jnp.float32)        # [B, dh] block of [H, B, dh]
    kh = ck_ref[:].astype(jnp.float32)       # [B, S, dh]
    vh = cv_ref[:].astype(jnp.float32)
    b = qh.shape[0]
    add = (1.0 - cross_mask_ref[:].astype(jnp.float32)) * NEG
    s = jnp.sum(qh[:, None, :] * kh, axis=-1) * scale + add
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    ctx_ref[0] = jnp.sum(p[:, :, None] * vh, axis=1).astype(ctx_ref.dtype)


def _out_ln_q_kernel(ctx_ref, res_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
                     wq_ref, bq_ref, h_ref, q_ref, *, eps: float):
    """Dense chain: out-projection + residual LayerNorm + next query projection."""
    ctx = ctx_ref[:].astype(jnp.float32)
    res = res_ref[:].astype(jnp.float32)
    y = jnp.dot(ctx, wo_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    y = y + bo_ref[:].astype(jnp.float32) + res
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    h_ref[:] = y.astype(h_ref.dtype)
    q = jnp.dot(y, wq_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    q_ref[:] = (q + bq_ref[:].astype(jnp.float32)).astype(q_ref.dtype)


def _out_ln_ffn_kernel(ctx_ref, res_ref, wo_ref, bo_ref, ln2s_ref, ln2b_ref,
                       w1_ref, b1_ref, w2_ref, b2_ref, ln3s_ref, ln3b_ref,
                       out_ref, *, eps: float):
    """Dense chain: cross out-projection + LN + FFN (exact-erf gelu) + LN."""
    ctx = ctx_ref[:].astype(jnp.float32)
    res = res_ref[:].astype(jnp.float32)

    def ln(x, s_ref, b_ref):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        return y * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)

    y = jnp.dot(ctx, wo_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    h = ln(y + bo_ref[:].astype(jnp.float32) + res, ln2s_ref, ln2b_ref)
    z = jnp.dot(h, w1_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    z = z + b1_ref[:].astype(jnp.float32)
    z = z * _phi(z)
    z = jnp.dot(z, w2_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    out_ref[:] = ln(z + b2_ref[:].astype(jnp.float32) + h, ln3s_ref, ln3b_ref).astype(out_ref.dtype)


def prepare_fused_params(params: dict, heads: int) -> list:
    """Per-layer head-major weight views for v2, computed once per generate call
    (loop-invariant: lives outside the decode while_loop)."""
    prepared = []
    for layer in params["layers"]:
        sp = layer["self"]
        d = sp["q"]["w"].shape[0]
        dh = sp["q"]["w"].shape[1] // heads

        def wh(w):
            return jnp.transpose(w.reshape(d, heads, dh), (1, 0, 2))  # [H, D, dh]

        def bh(bias):
            return bias.reshape(heads, 1, dh)  # [H, 1, dh]: lane-legal blocks

        prepared.append({
            "wq": wh(sp["q"]["w"]), "bq": bh(sp["q"]["b"]),
            "wk": wh(sp["k"]["w"]), "bk": bh(sp["k"]["b"]),
            "wv": wh(sp["v"]["w"]), "bv": bh(sp["v"]["b"]),
            "layer": layer,
        })
    return prepared


def fused_layer_step_v2(
    hidden, layer, cache_k, cache_v, cross_k, cross_v, index, key_mask, cross_mask,
    eps: float = 1e-12, interpret: bool = None, prepared: dict = None,
):
    """Grid-over-heads fused layer step → (hidden_out, cache_k', cache_v')."""
    if interpret is None:
        interpret = INTERPRET
    b, d = hidden.shape
    heads, t, dh = cache_k.shape[1], cache_k.shape[2], cache_k.shape[3]
    s = cross_k.shape[2]
    sp, cp, mp = layer["self"], layer["cross"], layer["mlp"]
    scale = 1.0 / math.sqrt(dh)
    if prepared is None:
        prepared = prepare_fused_params({"layers": [layer]}, heads)[0]

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    head_w = pl.BlockSpec((None, d, dh), lambda h, *_: (h, 0, 0), memory_space=pltpu.VMEM)
    head_b = pl.BlockSpec((None, 1, dh), lambda h, *_: (h, 0, 0), memory_space=pltpu.VMEM)
    head_cache = pl.BlockSpec((b, None, t, dh), lambda h, *_: (0, h, 0, 0), memory_space=pltpu.VMEM)
    head_cross = pl.BlockSpec((b, None, s, dh), lambda h, *_: (0, h, 0, 0), memory_space=pltpu.VMEM)
    head_io = pl.BlockSpec((1, b, dh), lambda h, *_: (h, 0, 0), memory_space=pltpu.VMEM)
    bcast = pl.BlockSpec((b, d), lambda h, *_: (0, 0), memory_space=pltpu.VMEM)
    bcast_mask_t = pl.BlockSpec((b, t), lambda h, *_: (0, 0), memory_space=pltpu.VMEM)
    bcast_mask_s = pl.BlockSpec((b, s), lambda h, *_: (0, 0), memory_space=pltpu.VMEM)

    ctx_h, k_new_h, v_new_h = pl.pallas_call(
        functools.partial(_qkv_attn_kernel_v2, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(heads,),
            in_specs=[bcast, bcast_mask_t, head_w, head_b, head_w, head_b, head_w, head_b,
                      head_cache, head_cache],
            out_specs=[head_io, head_io, head_io],
        ),
        out_shape=[jax.ShapeDtypeStruct((heads, b, dh), hidden.dtype)] +
                  [jax.ShapeDtypeStruct((heads, b, dh), cache_k.dtype)] * 2,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(index.reshape(1).astype(jnp.int32),
      hidden, key_mask.astype(jnp.int32),
      prepared["wq"], prepared["bq"], prepared["wk"], prepared["bk"],
      prepared["wv"], prepared["bv"],
      cache_k, cache_v)
    ctx = jnp.transpose(ctx_h, (1, 0, 2)).reshape(b, d)

    h1, cq = pl.pallas_call(
        functools.partial(_out_ln_q_kernel, eps=eps),
        in_specs=[full()] * 8,
        out_specs=[full(), full()],
        out_shape=[jax.ShapeDtypeStruct((b, d), hidden.dtype)] * 2,
        interpret=interpret,
    )(ctx, hidden, sp["out"]["w"], sp["out"]["b"], sp["ln"]["scale"], sp["ln"]["bias"],
      cp["q"]["w"], cp["q"]["b"])

    cq_h = jnp.transpose(cq.reshape(b, heads, dh), (1, 0, 2))  # [H, B, dh]
    cctx_h = pl.pallas_call(
        functools.partial(_cross_attn_kernel_v2, scale=scale),
        grid=(heads,),
        in_specs=[head_io, bcast_mask_s, head_cross, head_cross],
        out_specs=head_io,
        out_shape=jax.ShapeDtypeStruct((heads, b, dh), hidden.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(cq_h, cross_mask.astype(jnp.int32), cross_k, cross_v)
    cctx = jnp.transpose(cctx_h, (1, 0, 2)).reshape(b, d)

    out = pl.pallas_call(
        functools.partial(_out_ln_ffn_kernel, eps=eps),
        in_specs=[full()] * 12,
        out_specs=full(),
        out_shape=jax.ShapeDtypeStruct((b, d), hidden.dtype),
        interpret=interpret,
    )(cctx, h1, cp["out"]["w"], cp["out"]["b"], cp["ln"]["scale"], cp["ln"]["bias"],
      mp["fc1"]["w"], mp["fc1"]["b"], mp["fc2"]["w"], mp["fc2"]["b"],
      mp["ln"]["scale"], mp["ln"]["bias"])

    k_new = jnp.transpose(k_new_h, (1, 0, 2)).reshape(b, heads, 1, dh)
    v_new = jnp.transpose(v_new_h, (1, 0, 2)).reshape(b, heads, 1, dh)
    cache_k = jax.lax.dynamic_update_slice(cache_k, k_new, (0, 0, index, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v_new, (0, 0, index, 0))
    return out, cache_k, cache_v
