"""Precision policy helpers.

Parity mode keeps fp32 end-to-end (tests pin ``jax_default_matmul_precision=highest``).
Production mode casts parameters/activations to bfloat16; layer-norm statistics,
softmax, and matmul accumulation stay fp32 inside ops/layers.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype=jnp.bfloat16):
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
