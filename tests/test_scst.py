"""SCST training-step integration test (tiny models, dummy reward)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cxrmate_tpu.configs import BertDecoderConfig, CvtConfig, EncoderDecoderConfig, LoraConfig
from cxrmate_tpu.generate import GenerationConfig
from cxrmate_tpu.models import bert as bert_mod
from cxrmate_tpu.models.cvt import init_cvt_variables
from cxrmate_tpu.train import optim
from cxrmate_tpu.train.scst import SCSTTrainer, make_scst_step, reinforce_loss
from cxrmate_tpu.train.tf_trainer import create_train_state

BOS, EOS, SEP, PAD = 1, 2, 3, 4
PMT_SEP = 60


def _config():
    return EncoderDecoderConfig(
        encoder=CvtConfig(
            embed_dim=(8, 12, 16), num_heads=(1, 2, 2), depth=(1, 1, 3),
            drop_path_rate=(0.0, 0.0, 0.0), projection_size=16,
        ),
        decoder=BertDecoderConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=64, cross_attention_hidden_size=16,
        ),
        variant="longitudinal",
        lora=LoraConfig(),
        image_size=32,
    )


def test_reinforce_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 6, 11).astype(np.float32)
    ids = rng.randint(0, 11, size=(2, 6))
    ids[0, 4:] = PAD
    reward = np.array([0.3, -0.2], np.float32)
    # reference reinforce_loss (scst/gt_prompt.py:211-246): nll_loss over [B, V, T]
    t_logits = torch.from_numpy(logits).permute(0, 2, 1)
    nll = torch.nn.functional.nll_loss(
        torch.nn.functional.log_softmax(t_logits, dim=1),
        torch.from_numpy(ids), ignore_index=PAD, reduction="none",
    ).sum(-1)
    expected = (nll * torch.from_numpy(reward)).mean().item()
    got = float(reinforce_loss(jnp.asarray(logits), jnp.asarray(ids), jnp.asarray(reward), PAD))
    assert abs(got - expected) < 1e-5


def test_scst_step_runs_and_freezes_encoder():
    config = _config()
    enc = init_cvt_variables(jax.random.PRNGKey(0), config.encoder)
    dec = bert_mod.init_bert_params(jax.random.PRNGKey(1), config.decoder, lora=config.lora)
    variables = {
        "params": {"encoder": enc["params"], "decoder": dec},
        "batch_stats": enc["batch_stats"],
    }
    mask = optim.mask_for_stage(variables["params"], "scst")
    tx = optim.adamw(lr=1e-3, trainable_mask=mask)
    state = create_train_state(variables, tx)

    specials_sample = (BOS, SEP)
    specials_base = (PMT_SEP, BOS, SEP)
    gen_sample = GenerationConfig(
        max_new_tokens=8, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=specials_sample,
        token_type_sections=(0, 1, 0, 1), do_sample=True, top_k=5,
    )
    gen_base = GenerationConfig(
        max_new_tokens=8, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=specials_base,
        token_type_sections=(0, 1, 0, 1),
    )
    rollout, grad_step = make_scst_step(config, gen_sample, gen_base, tx, trainable_mask=mask)

    def split_fn(token_ids):
        n = token_ids.shape[0]
        strs = [" ".join(str(t) for t in row if t not in (BOS, EOS, SEP, PAD)) for row in token_ids]
        return ["" for _ in range(n)], strs, ["" for _ in range(n)]

    def reward_fn(preds, labels):
        return np.asarray([min(len(p), 10) / 10.0 for p in preds], np.float32)

    trainer = SCSTTrainer(config, rollout, grad_step, reward_fn, split_fn)
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(2, 2, 3, 32, 32), jnp.float32)
    prompt = np.full((2, 5), PAD, np.int32)
    prompt[0, :3] = [50, PMT_SEP, BOS]
    prompt[1, :5] = [50, 51, PMT_SEP, 52, BOS]
    prompt_mask = (prompt != PAD).astype(np.int32)

    enc_before = np.asarray(state.params["encoder"]["projection_head"]["proj"]["w"])
    dec_before = np.asarray(state.params["decoder"]["layers"][0]["self"]["q"]["w"])
    lora_before = np.asarray(state.params["decoder"]["layers"][0]["self"]["q"]["lora_a"])
    state, logs, (bf, bi) = trainer.step(
        state, pixels, prompt, prompt_mask,
        findings=["clear lungs", "stable"], impression=["no change", "normal"],
        rng=jax.random.PRNGKey(7),
    )
    assert np.isfinite(logs["scst_loss"])
    np.testing.assert_array_equal(
        np.asarray(state.params["encoder"]["projection_head"]["proj"]["w"]), enc_before
    )
    # decoder (incl. base q/k) trains under SCST
    assert not np.allclose(
        np.asarray(state.params["decoder"]["layers"][0]["self"]["q"]["w"]), dec_before
    ) or not np.allclose(
        np.asarray(state.params["decoder"]["layers"][0]["self"]["q"]["lora_a"]), lora_before
    )
    assert len(bf) == 2


def test_fused_rollout_matches_separate_decodes():
    """scst_rollout_decode (one fused while_loop for sample + greedy baseline)
    must be bit-identical to the two separate `generate` calls it replaces."""
    from cxrmate_tpu.generate.decode import generate, scst_rollout_decode
    from cxrmate_tpu.models import encoder_decoder as ed

    config = _config()
    enc = init_cvt_variables(jax.random.PRNGKey(0), config.encoder)
    dec = bert_mod.init_bert_params(jax.random.PRNGKey(1), config.decoder, lora=config.lora)
    variables = {
        "params": {"encoder": enc["params"], "decoder": dec},
        "batch_stats": enc["batch_stats"],
    }
    gen_sample = GenerationConfig(
        max_new_tokens=10, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(BOS, SEP),
        token_type_sections=(0, 1, 0, 1), do_sample=True, top_k=5,
    )
    gen_base = GenerationConfig(
        max_new_tokens=10, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(PMT_SEP, BOS, SEP),
        token_type_sections=(0, 1, 0, 1),
    )
    rng = np.random.RandomState(3)
    pixels = jnp.asarray(rng.randn(2, 2, 3, 32, 32), jnp.float32)
    enc_hidden, enc_mask, _ = ed.encode_images(variables, pixels, config)
    prompt = np.full((2, 6), PAD, np.int32)
    prompt[0, :3] = [50, PMT_SEP, BOS]
    prompt[1, :6] = [50, 51, PMT_SEP, 52, 53, BOS]
    prompt = jnp.asarray(prompt)
    pmask = (prompt != PAD).astype(jnp.int32)
    key = jax.random.PRNGKey(11)

    want_sampled = generate(variables, config, gen_sample, enc_hidden, enc_mask,
                            prompt, pmask, key)
    want_base = generate(variables, config, gen_base, enc_hidden, enc_mask,
                         prompt, pmask)
    got_sampled, got_base = scst_rollout_decode(
        variables, config, gen_sample, gen_base, enc_hidden, enc_mask,
        prompt, pmask, key,
    )
    np.testing.assert_array_equal(np.asarray(got_sampled), np.asarray(want_sampled))
    np.testing.assert_array_equal(np.asarray(got_base), np.asarray(want_base))

def test_scst_rollout_segmented_cache_growth_is_inert():
    """cache_segments > 1 on the fused SCST rollout must be bit-identical to
    the single-phase loop (sampled AND baseline halves)."""
    from cxrmate_tpu.generate.decode import scst_rollout_decode
    from cxrmate_tpu.models import encoder_decoder as ed

    config = _config()
    enc = init_cvt_variables(jax.random.PRNGKey(0), config.encoder)
    dec = bert_mod.init_bert_params(jax.random.PRNGKey(1), config.decoder, lora=config.lora)
    variables = {
        "params": {"encoder": enc["params"], "decoder": dec},
        "batch_stats": enc["batch_stats"],
    }
    gen_sample = GenerationConfig(
        max_new_tokens=11, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(BOS, SEP),
        token_type_sections=(0, 1, 0, 1), do_sample=True, top_k=5,
    )
    gen_base = GenerationConfig(
        max_new_tokens=11, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(PMT_SEP, BOS, SEP),
        token_type_sections=(0, 1, 0, 1),
    )
    rng = np.random.RandomState(7)
    pixels = jnp.asarray(rng.randn(2, 2, 3, 32, 32), jnp.float32)
    enc_hidden, enc_mask, _ = ed.encode_images(variables, pixels, config)
    prompt = np.full((2, 6), PAD, np.int32)
    prompt[0, :3] = [50, PMT_SEP, BOS]
    prompt[1, :6] = [50, 51, PMT_SEP, 52, 53, BOS]
    prompt = jnp.asarray(prompt)
    pmask = (prompt != PAD).astype(jnp.int32)
    key = jax.random.PRNGKey(19)

    outs = {}
    for spec in (1, "3:4"):
        s, g = scst_rollout_decode(
            variables, config, gen_sample, gen_base, enc_hidden, enc_mask,
            prompt, pmask, key, cache_segments=spec,
        )
        outs[spec] = (np.asarray(s), np.asarray(g))
    np.testing.assert_array_equal(outs[1][0], outs["3:4"][0])
    np.testing.assert_array_equal(outs[1][1], outs["3:4"][1])


def test_scst_prompt_bucketing_is_inert():
    """Bucket-padding the SCST prompt beyond the batch longest (what
    cli/stages.py:fit_scst does to bound compile count, and what multi-process
    SCST needs for rank-agreeing widths) must leave the whole step bit-exact:
    rollout tokens, REINFORCE loss, and the updated parameters — provided the
    first-token logits column is pinned to the true batch-longest width
    (generate/decode.py:prompt_logits_col; train/scst.py first_col)."""
    config = _config()
    enc = init_cvt_variables(jax.random.PRNGKey(0), config.encoder)
    dec = bert_mod.init_bert_params(jax.random.PRNGKey(1), config.decoder, lora=config.lora)
    variables = {
        "params": {"encoder": enc["params"], "decoder": dec},
        "batch_stats": enc["batch_stats"],
    }
    mask = optim.mask_for_stage(variables["params"], "scst")
    tx = optim.adamw(lr=1e-3, trainable_mask=mask)
    gen_sample = GenerationConfig(
        max_new_tokens=8, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(BOS, SEP),
        token_type_sections=(0, 1, 0, 1), do_sample=True, top_k=5,
    )
    gen_base = GenerationConfig(
        max_new_tokens=8, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(PMT_SEP, BOS, SEP),
        token_type_sections=(0, 1, 0, 1),
    )
    rollout, grad_step = make_scst_step(config, gen_sample, gen_base, tx, trainable_mask=mask)

    def split_fn(token_ids):
        n = token_ids.shape[0]
        strs = [" ".join(str(t) for t in row if t not in (BOS, EOS, SEP, PAD)) for row in token_ids]
        return ["" for _ in range(n)], strs, ["" for _ in range(n)]

    def reward_fn(preds, labels):
        return np.asarray([min(len(p), 10) / 10.0 for p in preds], np.float32)

    trainer = SCSTTrainer(config, rollout, grad_step, reward_fn, split_fn)
    rng = np.random.RandomState(5)
    pixels = jnp.asarray(rng.randn(2, 2, 3, 32, 32), jnp.float32)
    prompt = np.full((2, 6), PAD, np.int32)
    prompt[0, :3] = [50, PMT_SEP, BOS]
    prompt[1, :6] = [50, 51, PMT_SEP, 52, 53, BOS]
    pmask = (prompt != PAD).astype(np.int32)
    true_width = prompt.shape[1]
    pad_cols = 7  # bucket width 13: deliberately not a multiple of anything
    prompt_b = np.pad(prompt, ((0, 0), (0, pad_cols)), constant_values=PAD)
    pmask_b = np.pad(pmask, ((0, 0), (0, pad_cols)), constant_values=0)

    results = {}
    for tag, (ids, msk, col) in {
        "plain": (prompt, pmask, None),
        "bucketed": (prompt_b, pmask_b, true_width - 1),
    }.items():
        # fresh copies — grad_step donates the state, which aliases `variables`
        state = create_train_state(jax.tree_util.tree_map(jnp.array, variables), tx)
        new_state, logs, (bf, bi) = trainer.step(
            state, pixels, ids, msk,
            findings=["clear lungs", "stable"], impression=["no change", "normal"],
            rng=jax.random.PRNGKey(23), prompt_logits_col=col,
        )
        # generated suffix of the rollout, via the baseline strings + loss
        results[tag] = (logs["scst_loss"], logs["reward"], tuple(bf),
                        jax.tree_util.tree_map(np.asarray, new_state.params["decoder"]))
    assert results["plain"][0] == results["bucketed"][0]
    assert results["plain"][1] == results["bucketed"][1]
    assert results["plain"][2] == results["bucketed"][2]
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, results["plain"][3], results["bucketed"][3]
    )
