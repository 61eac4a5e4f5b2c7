"""top-k / top-p / temperature warper parity vs HF logits processors."""

import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from cxrmate_tpu.generate.logits_process import apply_top_k, apply_top_p, warp_logits


def _mask_equal(ours, theirs):
    ours_inf = np.asarray(ours) < -1e29
    theirs_inf = ~np.isfinite(theirs)
    np.testing.assert_array_equal(ours_inf, theirs_inf)
    np.testing.assert_allclose(
        np.where(ours_inf, 0.0, np.asarray(ours)),
        np.where(theirs_inf, 0.0, theirs),
        rtol=1e-6,
    )


def test_top_k_matches_hf():
    rng = np.random.RandomState(0)
    logits = rng.randn(3, 40).astype(np.float32)
    hf = transformers.TopKLogitsWarper(top_k=7)
    expected = hf(None, torch.from_numpy(logits)).numpy()
    _mask_equal(apply_top_k(jnp.asarray(logits), 7), expected)


def test_top_p_matches_hf():
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 50).astype(np.float32)
    for p in (0.3, 0.9, 0.99):
        hf = transformers.TopPLogitsWarper(top_p=p)
        expected = hf(None, torch.from_numpy(logits)).numpy()
        _mask_equal(apply_top_p(jnp.asarray(logits), p), expected)


def test_warp_chain_matches_hf_order():
    """HF applies temperature → top-k → top-p (the SCST sampler settings)."""
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 60).astype(np.float32)
    t, k, p = 0.7, 11, 0.92
    chain = transformers.LogitsProcessorList(
        [
            transformers.TemperatureLogitsWarper(t),
            transformers.TopKLogitsWarper(k),
            transformers.TopPLogitsWarper(p),
        ]
    )
    expected = chain(None, torch.from_numpy(logits)).numpy()
    _mask_equal(warp_logits(jnp.asarray(logits), temperature=t, top_k=k, top_p=p), expected)
