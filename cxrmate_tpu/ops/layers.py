"""Functional neural-net primitives.

Everything is a pure function over parameter pytrees (nested dicts of jnp arrays).
Conventions:
  * linear weights are stored transposed relative to torch: ``w`` has shape
    ``[in, out]`` so application is ``x @ w + b`` (MXU-friendly, no per-call transpose).
  * conv kernels are stored HWIO for NHWC convolutions.
  * matmuls accumulate in float32 (``preferred_element_type``) regardless of the
    compute dtype, matching TPU best practice and HF fp32-CPU numerics when inputs
    are fp32.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def linear(params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.matmul(x, params["w"], preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def lora_linear(params, x: jnp.ndarray, scaling: float, *, dropout_rate: float = 0.0,
                train: bool = False, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Linear with an optional LoRA delta: ``x W + s * drop(x) A^T B^T``.

    Matches PEFT's ``lora.Linear``: dropout is applied to the LoRA branch input only.
    ``params`` may or may not contain ``lora_a``/``lora_b`` ([in, r], [r, out]).
    """
    y = linear(params, x)
    if "lora_a" in params:
        xa = x
        if train and dropout_rate > 0.0:
            xa = dropout(xa, dropout_rate, rng)
        delta = jnp.matmul(
            jnp.matmul(xa, params["lora_a"], preferred_element_type=jnp.float32),
            params["lora_b"],
            preferred_element_type=jnp.float32,
        )
        y = y + (scaling * delta).astype(y.dtype)
    return y


def layer_norm(params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm_infer(params, stats, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """BatchNorm over NHWC channels using running statistics."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(stats["var"].astype(jnp.float32) + eps)
    y = (xf - stats["mean"].astype(jnp.float32)) * inv
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm_train(
    params, stats, x: jnp.ndarray, eps: float, momentum: float
) -> Tuple[jnp.ndarray, dict]:
    """BatchNorm with batch statistics; returns (y, updated running stats).

    Running update uses the unbiased variance (torch semantics)."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf - mean), axis=axes)
    n = x.size // x.shape[-1]
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": (1 - momentum) * stats["mean"].astype(jnp.float32) + momentum * mean,
        "var": (1 - momentum) * stats["var"].astype(jnp.float32) + momentum * unbiased,
    }
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_stats


def conv2d(
    w: jnp.ndarray,
    x: jnp.ndarray,
    stride: int,
    padding: int,
    groups: int = 1,
    b: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel and symmetric padding (torch Conv2d semantics).

    fp32 output is only requested for fp32 inputs: with bf16 operands the TPU MXU
    accumulates in fp32 natively and rounds once at the output, and asking for an
    f32 output breaks the conv transpose under autodiff (the cotangent arrives
    f32 against bf16 weights — mixed dtypes are rejected by the primitive)."""
    pref = jnp.float32 if x.dtype == jnp.float32 else None
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=pref,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — both HF CvT (nn.GELU) and BERT ('gelu') use the erf form."""
    return jax.nn.gelu(x, approximate=False)


def _packed_dropout_mask(rng: jax.Array, keep: float, shape, nbits: int) -> jnp.ndarray:
    """Bernoulli(keep) mask from PACKED random bits: one uint32 threefry word
    yields ``32 // nbits`` minor-axis-neighbouring mask elements (element
    [..., j] reads sub-lane ``j % per`` of word [..., j // per] — a pure
    function of key + logical index, so the mask is mesh-layout-invariant like
    ``jax.random.bernoulli``). Two wins over the 32-bit path on the TF train
    step (threefry generation + mask traffic are the whole remaining dropout
    cost, DEVNOTES round 3): ``32/nbits``× fewer threefry ops, and the
    materialise barrier stores the packed words — ``nbits/8`` bytes per
    element instead of a 1-byte bool — while consumers re-unpack with two
    cheap VPU ops inside their own fusions. The keep probability quantises to
    ``round(keep * 2**nbits) / 2**nbits`` (16-bit: ≤2⁻¹⁶ absolute error;
    8-bit: ≤2⁻⁹ — e.g. 0.9 → 230/256 = 0.8984)."""
    per = 32 // nbits
    if len(shape) == 0 or int(shape[-1]) < per:
        # degenerate minor axis: packing buys nothing, keep the plain draw
        words = jax.random.bits(rng, tuple(shape), jnp.uint32)
        sub = words >> jnp.uint32(32 - nbits)
    else:
        # Pack along the MINOR axis only: words [..., ceil(last/per)], each
        # word unpacked to `per` neighbouring lane elements via a broadcasted
        # shift and a minor-dims-only reshape. Keeping the leading dims intact
        # matters on TPU — a flat [n/per] word array forced a global relayout
        # into every consumer fusion and measured SLOWER than unpacked masks
        # (DEVNOTES round 4); lane-local unpack fuses for free.
        *lead, last = (int(d) for d in shape)
        nwords_last = -(-last // per)
        words = jax.random.bits(rng, (*lead, nwords_last), jnp.uint32)
        if os.environ.get("CXRMATE_DROPOUT_MATERIALIZE", "1") == "1":
            words = jax.lax.optimization_barrier(words)
        shifts = jnp.arange(per, dtype=jnp.uint32) * jnp.uint32(nbits)
        sub = (words[..., :, None] >> shifts) & jnp.uint32((1 << nbits) - 1)
        sub = sub.reshape(*lead, nwords_last * per)[..., :last]
    thresh = jnp.uint32(int(round(keep * (1 << nbits))))
    return sub < thresh


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Inverted dropout. The CXRMATE_DROPOUT_BITS / CXRMATE_DROPOUT_MATERIALIZE
    env knobs are resolved at TRACE time: they take effect when a train step is
    (re)built (``make_train_step`` wraps each factory call in a fresh
    ``jax.jit``), not when an already-compiled step is re-invoked — flip them
    between processes or rebuild the step, never mid-step-object A/Bs."""
    if rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    nbits = int(os.environ.get("CXRMATE_DROPOUT_BITS", "32"))
    if nbits not in (8, 16, 32):
        raise ValueError(f"CXRMATE_DROPOUT_BITS must be 8, 16 or 32, got {nbits}")
    if nbits in (8, 16):
        # OPT-IN experiment (measured a dead end — default stays 32):
        # packed-bits Bernoulli, same keep probability to within 2⁻ⁿ, 32/n×
        # fewer threefry ops. Deterministic and mesh-invariant like the
        # default. On the reference multi train step every packed variant
        # measured neutral-to-WORSE within one session (32-bit 113.3 ms vs
        # 8-bit 115.7 / 16-bit ~118; both flat and minor-axis-local packings,
        # with and without the materialise barrier — full A/B in DEVNOTES
        # round 4): the per-consumer unpack (shift/and/cmp) and the packed
        # words' layout cost eat the saved threefry work.
        mask = _packed_dropout_mask(rng, keep, x.shape, nbits)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    mask = jax.random.bernoulli(rng, keep, x.shape)
    if os.environ.get("CXRMATE_DROPOUT_MATERIALIZE", "1") == "1":
        # Force the bool mask to materialise once: without the barrier XLA
        # re-fuses the threefry bit generation into every consumer of the
        # masked tensor — on the TF train step the cross-attention mask is
        # recomputed in 3 separate fwd/bwd fusions per decoder layer, and the
        # whole step's dropout costs ~15 ms of its 122 ms. Storing
        # ~1 byte/element and re-reading it is cheaper than recomputing
        # threefry: reference multi train step 122.3 → 112.9-115.5 ms across
        # two sessions (A/B in DEVNOTES round 3). Bit-identical (same mask
        # values), so it is the default; "0" restores XLA's rematerialising
        # schedule.
        mask = jax.lax.optimization_barrier(mask)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    additive_mask: Optional[jnp.ndarray] = None,
    *,
    probs_dropout: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Eager-order multi-head attention on [B, H, T, Dh] tensors.

    Computes ``softmax(q k^T * scale + mask) v`` with fp32 score accumulation —
    the exact op order of HF eager attention (scores, scale, add mask, softmax)."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if additive_mask is not None:
        scores = scores + additive_mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs.astype(q.dtype)
    if train and probs_dropout > 0.0:
        probs = dropout(probs, probs_dropout, rng)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)
    return ctx.astype(q.dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, T, D] -> [B, H, T, Dh]"""
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, Dh] -> [B, T, D]"""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
