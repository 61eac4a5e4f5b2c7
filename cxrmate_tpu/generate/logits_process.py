"""Logits warpers for sampled decoding, mirroring HF's processor semantics
(temperature → top-k → top-p, ``min_tokens_to_keep=1``) used by the reference's SCST
sampling (`/root/reference/modules/lightning_modules/longitudinal/scst/gt_prompt.py:176-178`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = float(jnp.finfo(jnp.float32).min)


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    if temperature == 1.0:
        return logits
    return logits / temperature


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k highest logits, set the rest to -inf (HF TopKLogitsWarper)."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (HF TopPLogitsWarper, min_tokens_to_keep=1).

    HF sorts ascending and removes tokens whose suffix-cumulative probability is
    ≤ 1 - p; equivalently (descending order): keep tokens while the cumulative
    probability *before* them is < p."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < p  # keep while mass before this token < p
    keep_sorted = keep_sorted.at[..., 0].set(True)  # min_tokens_to_keep=1
    # threshold logit: smallest kept logit per row
    num_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)
    thresh = jnp.take_along_axis(sorted_logits, num_keep - 1, axis=-1)
    return jnp.where(logits < thresh, NEG, logits)


def warp_logits(logits, temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0):
    logits = apply_temperature(logits, temperature)
    logits = apply_top_k(logits, top_k)
    logits = apply_top_p(logits, top_p)
    return logits
