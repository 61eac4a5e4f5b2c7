"""BERT decoder parity vs torch BertLMHeadModel, plus KV-cache self-consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cxrmate_tpu.ckpt.hf_convert import convert_bert_decoder
from cxrmate_tpu.models import bert as bert_mod
from tests.oracles import small_bert_cfg_dataclass, small_bert_config


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(1)
    hf_cfg = small_bert_config(vocab_size=97)
    hf_cfg._attn_implementation = "eager"
    model = transformers.BertLMHeadModel(hf_cfg).eval()
    cfg = small_bert_cfg_dataclass(vocab_size=97, cross_dim=32)
    params = convert_bert_decoder(model.state_dict(), cfg)
    return model, cfg, params


def _random_inputs(rng, b=3, l=12, enc_len=10, vocab=97, hid=32):
    ids = rng.randint(6, vocab, size=(b, l)).astype(np.int64)
    mask = np.ones((b, l), dtype=np.int64)
    mask[0, -3:] = 0
    types = (rng.rand(b, l) > 0.5).astype(np.int64)
    enc = rng.randn(b, enc_len, hid).astype(np.float32)
    enc_mask = np.ones((b, enc_len), dtype=np.int64)
    enc_mask[1, -4:] = 0
    return ids, mask, types, enc, enc_mask


def test_teacher_forcing_parity(setup):
    model, cfg, params = setup
    rng = np.random.RandomState(0)
    ids, mask, types, enc, enc_mask = _random_inputs(rng)
    with torch.no_grad():
        expected = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            token_type_ids=torch.from_numpy(types),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.from_numpy(enc_mask),
        ).logits.numpy()
    got = bert_mod.bert_forward(
        params, cfg, jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        token_type_ids=jnp.asarray(types),
        encoder_hidden_states=jnp.asarray(enc),
        encoder_attention_mask=jnp.asarray(enc_mask),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


def test_position_ids_parity(setup):
    model, cfg, params = setup
    rng = np.random.RandomState(3)
    ids, mask, types, enc, enc_mask = _random_inputs(rng)
    pos = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
    with torch.no_grad():
        expected = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            token_type_ids=torch.from_numpy(types),
            position_ids=torch.from_numpy(pos),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.from_numpy(enc_mask),
        ).logits.numpy()
    got = bert_mod.bert_forward(
        params, cfg, jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        token_type_ids=jnp.asarray(types),
        position_ids=jnp.asarray(pos),
        encoder_hidden_states=jnp.asarray(enc),
        encoder_attention_mask=jnp.asarray(enc_mask),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


def test_cached_decode_matches_full_forward(setup):
    """prefill + per-token steps must reproduce the full-sequence logits."""
    _, cfg, params = setup
    rng = np.random.RandomState(1)
    b, p_len, total, enc_len = 2, 5, 11, 10
    ids = rng.randint(6, 97, size=(b, total)).astype(np.int32)
    mask = np.ones((b, total), dtype=np.int32)
    mask[0, 3] = 0  # a masked (pad) prompt position, longitudinal-style
    types = (rng.rand(b, total) > 0.5).astype(np.int32)
    pos = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
    enc = rng.randn(b, enc_len, 32).astype(np.float32)
    enc_mask = np.ones((b, enc_len), dtype=np.int32)

    full = bert_mod.bert_forward(
        params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        token_type_ids=jnp.asarray(types), position_ids=jnp.asarray(pos),
        encoder_hidden_states=jnp.asarray(enc), encoder_attention_mask=jnp.asarray(enc_mask),
    )

    cache = bert_mod.init_cache(cfg, b, total, enc_len)
    logits_p, cache = bert_mod.bert_prefill(
        params, cfg, cache,
        jnp.asarray(ids[:, :p_len]), jnp.asarray(mask[:, :p_len]),
        jnp.asarray(types[:, :p_len]), jnp.asarray(pos[:, :p_len]),
        jnp.asarray(enc), jnp.asarray(enc_mask),
    )
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, :p_len]), rtol=2e-4, atol=1e-5)

    for t in range(p_len, total):
        key_mask = np.zeros((b, total), dtype=np.int32)
        key_mask[:, : t + 1] = mask[:, : t + 1]
        step_logits, cache = bert_mod.bert_step(
            params, cfg, cache,
            jnp.asarray(ids[:, t]), jnp.asarray(types[:, t]), jnp.asarray(pos[:, t]),
            jnp.asarray(t), jnp.asarray(key_mask), jnp.asarray(enc_mask),
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(full[:, t]), rtol=2e-4, atol=1e-5,
            err_msg=f"step {t}",
        )


def test_lora_parity(setup):
    """LoRA-wrapped torch decoder vs our lora_a/lora_b path."""
    peft = pytest.importorskip("peft")
    torch.manual_seed(2)
    hf_cfg = small_bert_config(vocab_size=97)
    hf_cfg._attn_implementation = "eager"
    model = transformers.BertLMHeadModel(hf_cfg)
    peft_cfg = peft.LoraConfig(
        inference_mode=False, r=4, lora_alpha=16, lora_dropout=0.0,
        target_modules="bert.encoder.layer.[0-9]+.attention.self.(query|key)",
    )
    model = peft.get_peft_model(model, peft_cfg).eval()
    with torch.no_grad():
        for n, p in model.named_parameters():
            if "lora_A" in n or "lora_B" in n:
                p.normal_(0, 0.1)

    from cxrmate_tpu.configs import LoraConfig as MyLora

    cfg = small_bert_cfg_dataclass(vocab_size=97, cross_dim=32)
    params = convert_bert_decoder(model.state_dict(), cfg)
    assert "lora_a" in params["layers"][0]["self"]["q"]

    rng = np.random.RandomState(5)
    ids, mask, types, enc, enc_mask = _random_inputs(rng)
    with torch.no_grad():
        expected = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            token_type_ids=torch.from_numpy(types),
            encoder_hidden_states=torch.from_numpy(enc),
            encoder_attention_mask=torch.from_numpy(enc_mask),
        ).logits.numpy()
    got = bert_mod.bert_forward(
        params, cfg, jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        token_type_ids=jnp.asarray(types),
        encoder_hidden_states=jnp.asarray(enc),
        encoder_attention_mask=jnp.asarray(enc_mask),
        lora=MyLora(r=4, alpha=16, dropout=0.0),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


def test_init_params_tree_matches_converted(setup):
    model, cfg, params = setup
    init = bert_mod.init_bert_params(jax.random.PRNGKey(0), cfg)
    assert jax.tree_util.tree_structure(init) == jax.tree_util.tree_structure(params)
    si = jax.tree_util.tree_map(lambda a: a.shape, init)
    sc = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert si == sc
