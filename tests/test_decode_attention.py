"""Pallas decode-attention kernel vs the XLA attention path (interpret mode on
CPU), and the end-to-end decode with the kernel forced on."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cxrmate_tpu.ops.decode_attention import decode_attention, decode_attention_rowgrid
from cxrmate_tpu.ops.layers import attention


@pytest.mark.parametrize("m", [1, 4])
def test_kernel_matches_xla_attention(m):
    rng = np.random.RandomState(0)
    b, h, s, dh = 3, 4, 256, 64
    q = jnp.asarray(rng.randn(b, h, m, dh), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, dh), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, dh), jnp.float32)
    mask2d = jnp.asarray(
        (rng.rand(b, s) > 0.2).astype(np.float32) * 0
        + np.where(rng.rand(b, s) > 0.2, 0.0, float(np.finfo(np.float32).min)),
        jnp.float32,
    )
    scale = 1.0 / np.sqrt(dh)
    want = attention(q, k, v, scale, mask2d[:, None, None, :])
    got = decode_attention(q, k, v, mask2d, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    got2 = decode_attention_rowgrid(q, k, v, mask2d, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_kernel_fully_masked_rows_are_finite():
    """All-masked key rows must not produce NaNs (softmax of all -inf)."""
    b, h, m, s, dh = 2, 2, 1, 128, 64
    q = jnp.ones((b, h, m, dh), jnp.float32)
    k = jnp.ones((b, h, s, dh), jnp.float32)
    v = jnp.ones((b, h, s, dh), jnp.float32)
    mask = jnp.full((b, s), float(np.finfo(np.float32).min), jnp.float32)
    out = decode_attention(q, k, v, mask, 0.125, interpret=True)
    want = attention(q, k, v, 0.125, mask[:, None, None, :])
    np.testing.assert_array_equal(np.isnan(np.asarray(out)), np.isnan(np.asarray(want)))
