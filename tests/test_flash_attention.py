"""Flash-attention kernel parity vs exact softmax attention (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cxrmate_tpu.ops.flash_attention import flash_attention


def _exact(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("lq,lk,d,bq,bk", [
    (64, 64, 32, 32, 32),
    (100, 52, 16, 32, 32),   # ragged both ways
    (576, 145, 64, 128, 128),  # CvT stage-2 shape (incl. cls token)
])
def test_flash_matches_exact(lq, lk, d, bq, bk):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(3, lq, d), jnp.float32)
    k = jnp.asarray(rng.randn(3, lk, d), jnp.float32)
    v = jnp.asarray(rng.randn(3, lk, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    expected = _exact(q, k, v, scale)
    got = flash_attention(q, k, v, scale, block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_flash_in_cvt_encoder_matches_xla():
    """CvT encode with the flash path equals the XLA path."""
    from cxrmate_tpu.models.cvt import cvt_encode, init_cvt_variables
    from tests.oracles import small_cvt_cfg_dataclass

    cfg = small_cvt_cfg_dataclass(projection_size=32)
    variables = init_cvt_variables(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 64, 64), jnp.float32)
    base, _ = cvt_encode(variables["params"], variables["batch_stats"], x, cfg)
    flash, _ = cvt_encode(
        variables["params"], variables["batch_stats"], x, cfg,
        use_flash=True, flash_interpret=True,
    )
    np.testing.assert_allclose(np.asarray(flash), np.asarray(base), rtol=2e-4, atol=2e-5)
