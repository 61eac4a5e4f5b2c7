"""Training-path tests: TF loss parity with torch CE, train-step sanity, LoRA/SCST
freezing, grad accumulation, and dp×tp sharding on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cxrmate_tpu.configs import BertDecoderConfig, CvtConfig, EncoderDecoderConfig
from cxrmate_tpu.models import bert as bert_mod
from cxrmate_tpu.models.cvt import init_cvt_variables
from cxrmate_tpu.train import optim
from cxrmate_tpu.train.tf_trainer import (
    create_train_state,
    cross_entropy_ignore_pad,
    make_train_step,
)


def _tiny_config(variant="multi", lora=None):
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
        variant=variant,
        lora=lora,
        image_size=32,
    )


def _variables(config, lora=None):
    enc = init_cvt_variables(jax.random.PRNGKey(0), config.encoder)
    dec = bert_mod.init_bert_params(jax.random.PRNGKey(1), config.decoder, lora=lora)
    return {
        "params": {"encoder": enc["params"], "decoder": dec},
        "batch_stats": enc["batch_stats"],
    }


def _batch(config, b=2, n=2, l=10, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "pixel_values": jnp.asarray(rng.randn(b, n, 3, 32, 32), jnp.float32),
        "decoder_input_ids": jnp.asarray(rng.randint(6, 64, size=(b, l)), jnp.int32),
        "decoder_attention_mask": jnp.ones((b, l), jnp.int32),
        "decoder_token_type_ids": jnp.zeros((b, l), jnp.int32),
        "label_ids": jnp.asarray(
            np.where(rng.rand(b, l) < 0.2, 4, rng.randint(6, 64, size=(b, l))), jnp.int32
        ),
    }


def test_ce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    logits = rng.randn(3, 7, 19).astype(np.float32)
    labels = rng.randint(0, 19, size=(3, 7))
    labels[0, :3] = 4
    expected = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 2, 1), torch.from_numpy(labels), ignore_index=4
    ).item()
    got = float(cross_entropy_ignore_pad(jnp.asarray(logits), jnp.asarray(labels), 4))
    assert abs(got - expected) < 1e-5


def test_train_step_reduces_loss():
    config = _tiny_config()
    variables = _variables(config)
    tx = optim.adamw(lr=1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(config, tx, pad_id=4)
    batch = _batch(config)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(8):
        rng, k = jax.random.split(rng)
        state, loss = step(state, batch, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_batch_stats_update_in_train_mode():
    config = _tiny_config()
    variables = _variables(config)
    tx = optim.adamw(lr=1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(config, tx, pad_id=4)
    before = np.asarray(state.batch_stats["stages"][0]["layers"][0]["bn_q"]["mean"])
    state, _ = step(state, _batch(config), jax.random.PRNGKey(0))
    after = np.asarray(state.batch_stats["stages"][0]["layers"][0]["bn_q"]["mean"])
    assert not np.allclose(before, after)


def test_lora_only_mask_freezes_base():
    from cxrmate_tpu.configs import LoraConfig

    config = _tiny_config(variant="longitudinal", lora=LoraConfig())
    variables = _variables(config, lora=config.lora)
    mask = optim.mask_for_stage(variables["params"], "gt_prompt")
    tx = optim.adamw(lr=1e-2, trainable_mask=mask)
    state = create_train_state(variables, tx)
    step = make_train_step(config, tx, trainable_mask=mask, pad_id=4)
    batch = _batch(config)
    batch["decoder_position_ids"] = jnp.maximum(
        jnp.cumsum(batch["decoder_attention_mask"], axis=1) - 1, 0
    )
    w_before = np.asarray(state.params["decoder"]["layers"][0]["self"]["q"]["w"])
    la_before = np.asarray(state.params["decoder"]["layers"][0]["self"]["q"]["lora_a"])
    enc_before = np.asarray(state.params["encoder"]["projection_head"]["proj"]["w"])
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(state.params["decoder"]["layers"][0]["self"]["q"]["w"]), w_before
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["encoder"]["projection_head"]["proj"]["w"]), enc_before
    )
    assert not np.allclose(
        np.asarray(state.params["decoder"]["layers"][0]["self"]["q"]["lora_a"]), la_before
    )


def test_grad_accumulation_updates_every_k():
    config = _tiny_config()
    variables = _variables(config)
    tx = optim.adamw(lr=1e-3, accumulate_steps=2)
    state = create_train_state(variables, tx)
    step = make_train_step(config, tx, pad_id=4)
    p0 = np.asarray(state.params["decoder"]["embeddings"]["word"])
    state, _ = step(state, _batch(config), jax.random.PRNGKey(0))
    p1 = np.asarray(state.params["decoder"]["embeddings"]["word"])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: accumulate only
    state, _ = step(state, _batch(config, seed=1), jax.random.PRNGKey(1))
    p2 = np.asarray(state.params["decoder"]["embeddings"]["word"])
    assert not np.allclose(p1, p2)  # second micro-step applies the update


def test_sharded_train_step_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cxrmate_tpu.parallel.mesh import make_mesh, variables_specs

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    config = _tiny_config()
    variables = _variables(config)
    tx = optim.adamw(lr=1e-3)
    batch = _batch(config, b=4)

    state = create_train_state(jax.tree_util.tree_map(jnp.copy, variables), tx)
    step = make_train_step(config, tx, pad_id=4)
    _, loss_single = step(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(data=2, model=4)
    specs = variables_specs(variables, tp=True)
    sharded = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), variables, specs
    )
    state_s = create_train_state(sharded, tx)
    batch_s = {k: jax.device_put(v, NamedSharding(mesh, P("data"))) for k, v in batch.items()}
    with mesh:
        _, loss_sharded = step(state_s, batch_s, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=2e-5)


def test_mixed_precision_step_matches_fp32_closely():
    """compute_dtype=bf16: fp32 master params/moments, bf16 forward/backward;
    loss within bf16 tolerance of the fp32 step (the reference trains fp16,
    single_tf.yaml:21)."""
    import jax.numpy as jnp

    config = _tiny_config()
    variables = _variables(config)
    batch = _batch(config)
    tx = optim.adamw(lr=1e-3)

    state32 = create_train_state(jax.tree_util.tree_map(jnp.copy, variables), tx)
    step32 = make_train_step(config, tx, pad_id=4)
    state32, loss32 = step32(state32, batch, jax.random.PRNGKey(0))

    state16 = create_train_state(jax.tree_util.tree_map(jnp.copy, variables), tx)
    step16 = make_train_step(config, tx, pad_id=4, compute_dtype=jnp.bfloat16)
    state16, loss16 = step16(state16, batch, jax.random.PRNGKey(0))

    assert np.isfinite(float(loss16))
    assert abs(float(loss16) - float(loss32)) / max(abs(float(loss32)), 1e-6) < 0.05
    # master params and BN stats stay fp32
    leaves = jax.tree_util.tree_leaves(state16.params)
    assert all(l.dtype == jnp.float32 for l in leaves if jnp.issubdtype(l.dtype, jnp.floating))
    stats = jax.tree_util.tree_leaves(state16.batch_stats)
    assert all(l.dtype == jnp.float32 for l in stats if jnp.issubdtype(l.dtype, jnp.floating))
    # and the step actually updated the params
    w32 = np.asarray(state32.params["decoder"]["embeddings"]["word"])
    w16 = np.asarray(state16.params["decoder"]["embeddings"]["word"])
    assert not np.array_equal(w16, np.asarray(variables["params"]["decoder"]["embeddings"]["word"]))
    np.testing.assert_allclose(w16, w32, atol=5e-3)


def test_dropout_materialize_barrier_is_bit_identical(monkeypatch):
    """CXRMATE_DROPOUT_MATERIALIZE wraps the bernoulli mask in an
    optimization_barrier (a scheduling hint, identity on values): outputs and
    gradients must be bit-equal with the flag on and off."""
    from cxrmate_tpu.ops import layers

    x = jnp.asarray(np.random.RandomState(0).randn(4, 64), jnp.float32)
    key = jax.random.PRNGKey(7)

    def fwd_and_grad():
        # fresh (non-jit-cached) traces so the env flag is re-read
        y = jax.jit(lambda x: jnp.sum(layers.dropout(x, 0.3, key) ** 2))(x)
        g = jax.grad(lambda x: jnp.sum(layers.dropout(x, 0.3, key)))(x)
        return np.asarray(y), np.asarray(g)

    monkeypatch.setenv("CXRMATE_DROPOUT_MATERIALIZE", "1")
    y_on, g_on = fwd_and_grad()
    monkeypatch.setenv("CXRMATE_DROPOUT_MATERIALIZE", "0")
    y_off, g_off = fwd_and_grad()
    assert np.array_equal(y_on, y_off)
    assert np.array_equal(g_on, g_off)


def test_dropout_packed_bits_mask(monkeypatch):
    """CXRMATE_DROPOUT_BITS (default 16): the packed-bits Bernoulli keeps the
    dropout contract — deterministic per key, keep fraction within the
    quantised probability's sampling noise, zeros exactly where dropped,
    surviving elements scaled 1/keep — and "32" restores the exact
    jax.random.bernoulli masks."""
    from cxrmate_tpu.ops import layers

    x = jnp.ones((512, 512), jnp.float32)
    key = jax.random.PRNGKey(11)
    for nbits in ("8", "16"):
        monkeypatch.setenv("CXRMATE_DROPOUT_BITS", nbits)
        y1 = np.asarray(jax.jit(lambda x: layers.dropout(x, 0.1, key))(x))
        y2 = np.asarray(layers.dropout(x, 0.1, key))
        assert np.array_equal(y1, y2)  # deterministic, jit == eager
        vals = np.unique(y1)
        assert set(np.round(vals, 6)) <= {0.0, np.float32(np.round(1 / 0.9, 6))}
        q = round(0.9 * (1 << int(nbits))) / (1 << int(nbits))
        frac = (y1 != 0).mean()
        # 512*512 draws: binomial std ≈ 0.0006 — 5 sigma band
        assert abs(frac - q) < 0.003, (nbits, frac, q)
        # packed masks must be a pure function of key+index: a second key differs
        y3 = np.asarray(layers.dropout(x, 0.1, jax.random.PRNGKey(12)))
        assert not np.array_equal(y1, y3)
    # odd sizes exercise the tail slice (n not a multiple of 32/nbits)
    monkeypatch.setenv("CXRMATE_DROPOUT_BITS", "16")
    odd = np.asarray(layers.dropout(jnp.ones((3, 7, 5)), 0.3, key))
    assert odd.shape == (3, 7, 5) and np.isfinite(odd).all()
    # "32" restores the exact bernoulli mask values
    monkeypatch.setenv("CXRMATE_DROPOUT_BITS", "32")
    y32 = np.asarray(layers.dropout(x, 0.1, key))
    ref = np.where(np.asarray(jax.random.bernoulli(key, 0.9, x.shape)), 1 / 0.9, 0.0)
    np.testing.assert_array_equal(y32, ref.astype(np.float32))


def test_train_base_rng_impl_knob(monkeypatch):
    """CXRMATE_TRAIN_RNG_IMPL: default threefry equals PRNGKey(trial); rbg keys
    drive the same train step (finite loss, params update) with a different,
    deterministic dropout stream."""
    from cxrmate_tpu.cli.stages import _train_base_rng

    monkeypatch.delenv("CXRMATE_TRAIN_RNG_IMPL", raising=False)
    k_default = _train_base_rng(3)
    assert np.array_equal(
        jax.random.key_data(jax.random.wrap_key_data(jnp.asarray(k_default))),
        jax.random.key_data(jax.random.PRNGKey(3)),
    ) or np.array_equal(np.asarray(k_default), np.asarray(jax.random.PRNGKey(3)))

    monkeypatch.setenv("CXRMATE_TRAIN_RNG_IMPL", "rbg")
    k_rbg = _train_base_rng(3)
    config = _tiny_config()
    variables = _variables(config)
    tx = optim.adamw(lr=1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(config, tx, pad_id=4)
    # fold_in(base, global_step) is how the trainer derives per-step keys
    state, loss1 = step(state, _batch(config), jax.random.fold_in(k_rbg, 0))
    state, loss2 = step(state, _batch(config), jax.random.fold_in(k_rbg, 1))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    # deterministic for a fixed program: same key -> same loss
    state2 = create_train_state(_variables(config), tx)
    _, loss1b = step(state2, _batch(config), jax.random.fold_in(_train_base_rng(3), 0))
    assert float(loss1) == float(loss1b)
