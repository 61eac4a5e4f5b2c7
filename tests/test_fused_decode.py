"""Fused decoder-layer step kernel vs the XLA layer math (interpret mode)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cxrmate_tpu.configs import BertDecoderConfig
from cxrmate_tpu.models import bert as bert_mod
from cxrmate_tpu.ops.fused_decode import fused_layer_step, fused_layer_step_v2, supports
from cxrmate_tpu.ops.layers import attention, layer_norm, linear, merge_heads, split_heads


def _xla_layer_step(layer, hidden, cache_k, cache_v, cross_k, cross_v, index, key_mask, cross_mask, cfg):
    """The exact per-layer math of bert_mod.bert_step, one layer."""
    sp, cp, mp = layer["self"], layer["cross"], layer["mlp"]
    h = hidden[:, None, :]
    q = split_heads(linear(sp["q"], h), cfg.num_attention_heads)
    k = split_heads(linear(sp["k"], h), cfg.num_attention_heads)
    v = split_heads(linear(sp["v"], h), cfg.num_attention_heads)
    cache_k = jax.lax.dynamic_update_slice(cache_k, k.astype(cache_k.dtype), (0, 0, index, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v.astype(cache_v.dtype), (0, 0, index, 0))
    self_mask = bert_mod.padding_additive_mask(key_mask)
    ctx = attention(q, cache_k, cache_v, 1.0 / math.sqrt(cfg.head_dim), self_mask)
    h = layer_norm(sp["ln"], linear(sp["out"], merge_heads(ctx)) + h, cfg.layer_norm_eps)
    cq = split_heads(linear(cp["q"], h), cfg.num_attention_heads)
    cmask = bert_mod.padding_additive_mask(cross_mask)
    cctx = attention(cq, cross_k, cross_v, 1.0 / math.sqrt(cfg.head_dim), cmask)
    h = layer_norm(cp["ln"], linear(cp["out"], merge_heads(cctx)) + h, cfg.layer_norm_eps)
    h = bert_mod._mlp(mp, h, cfg)
    return h[:, 0, :], cache_k, cache_v


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_layer_matches_xla(dtype):
    cfg = BertDecoderConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=32, cross_attention_hidden_size=32,
    )
    params = bert_mod.init_bert_params(jax.random.PRNGKey(0), cfg)
    layer = jax.tree_util.tree_map(lambda x: x.astype(dtype), params["layers"][0])
    rng = np.random.RandomState(0)
    b, t, s, dh = 4, 10, 7, cfg.head_dim  # t != s so a wrong cache alias would fail
    hidden = jnp.asarray(rng.randn(b, 32), dtype)
    cache_k = jnp.asarray(rng.randn(b, 4, t, dh), dtype)
    cache_v = jnp.asarray(rng.randn(b, 4, t, dh), dtype)
    cross_k = jnp.asarray(rng.randn(b, 4, s, dh), dtype)
    cross_v = jnp.asarray(rng.randn(b, 4, s, dh), dtype)
    index = jnp.asarray(5, jnp.int32)
    key_mask = jnp.asarray((rng.rand(b, t) > 0.3).astype(np.int32))
    key_mask = key_mask.at[:, 5].set(1)
    key_mask = key_mask.at[0, 5].set(0)  # a masked (pad) query row — must not self-attend
    key_mask = key_mask * (np.arange(t) <= 5)
    cross_mask = jnp.asarray((rng.rand(b, s) > 0.2).astype(np.int32))

    expected_h, expected_k, expected_v = _xla_layer_step(
        layer, hidden, cache_k, cache_v, cross_k, cross_v, 5, key_mask, cross_mask, cfg
    )
    got_h, got_k, got_v = fused_layer_step(
        hidden, layer, cache_k, cache_v, cross_k, cross_v, index, key_mask, cross_mask,
        eps=cfg.layer_norm_eps, interpret=True,
    )
    got2_h, got2_k, got2_v = fused_layer_step_v2(
        hidden, layer, cache_k, cache_v, cross_k, cross_v, index, key_mask, cross_mask,
        eps=cfg.layer_norm_eps, interpret=True,
    )
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    for g, e in ((got2_h, got_h), (got2_k, got_k), (got2_v, got_v)):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(e, np.float32), rtol=tol, atol=tol
        )
    np.testing.assert_allclose(
        np.asarray(got_h, np.float32), np.asarray(expected_h, np.float32), rtol=tol, atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(got_k, np.float32), np.asarray(expected_k, np.float32), rtol=tol, atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(got_v, np.float32), np.asarray(expected_v, np.float32), rtol=tol, atol=tol
    )


def test_supports_gate():
    cfg = BertDecoderConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=32, cross_attention_hidden_size=32,
    )
    from cxrmate_tpu.configs import LoraConfig

    plain = bert_mod.init_bert_params(jax.random.PRNGKey(0), cfg)
    lora = bert_mod.init_bert_params(jax.random.PRNGKey(0), cfg, lora=LoraConfig())
    k = jnp.zeros((2, 4, 8, 8), jnp.bfloat16)
    assert supports(plain["layers"][0], k, k)
    assert not supports(lora["layers"][0], k, k)


def test_fused_generate_token_equality():
    """Greedy generate with the fused path produces the same tokens as XLA."""
    import numpy as np

    from cxrmate_tpu.configs import CvtConfig, EncoderDecoderConfig
    from cxrmate_tpu.generate import GenerationConfig, generate
    from cxrmate_tpu.models import encoder_decoder as ed_mod
    from cxrmate_tpu.models.cvt import init_cvt_variables
    from cxrmate_tpu.ops import fused_decode

    cfg = EncoderDecoderConfig(
        encoder=CvtConfig(embed_dim=(8, 12, 16), num_heads=(1, 2, 2), depth=(1, 1, 3),
                          drop_path_rate=(0.0, 0.0, 0.0), projection_size=16),
        decoder=BertDecoderConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=32, max_position_embeddings=64, cross_attention_hidden_size=16,
        ),
        variant="multi", image_size=32,
    )
    enc = init_cvt_variables(jax.random.PRNGKey(0), cfg.encoder)
    dec = bert_mod.init_bert_params(jax.random.PRNGKey(1), cfg.decoder)
    variables = {"params": {"encoder": enc["params"], "decoder": dec},
                 "batch_stats": enc["batch_stats"]}
    pixels = jnp.asarray(np.random.RandomState(0).randn(2, 2, 3, 32, 32), jnp.float32)
    enc_hidden, enc_mask, _ = ed_mod.encode_images(variables, pixels, cfg)
    gen_cfg = GenerationConfig(max_new_tokens=12, bos_token_id=1, eos_token_id=2,
                               pad_token_id=4, special_token_ids=(3,))
    prompt = jnp.full((2, 1), 1, jnp.int32)
    base = np.asarray(generate(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt,
                               jnp.ones_like(prompt)))
    fused_decode.INTERPRET = True
    try:
        fused = np.asarray(generate(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt,
                                    jnp.ones_like(prompt), use_fused=True))
    finally:
        fused_decode.INTERPRET = False
    np.testing.assert_array_equal(fused, base)
