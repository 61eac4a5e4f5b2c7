"""Pallas decode-attention kernel vs the XLA attention path (interpret mode on
CPU), and the end-to-end decode with the kernel forced on."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cxrmate_tpu.ops.decode_attention import (decode_attention,
                                              decode_attention_rowgrid,
                                              decode_attention_rowgroup,
                                              decode_attention_rowgroup_vpu)
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
    # rowgroup: b=3 is not divisible by 3's default group 4 → falls back to the
    # row grid; group=3 runs the grouped kernel proper
    got3 = decode_attention_rowgroup(q, k, v, mask2d, scale, group=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want), rtol=2e-5, atol=2e-5)
    got4 = decode_attention_rowgroup(q, k, v, mask2d, scale, group=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want), rtol=2e-5, atol=2e-5)
    # the VPU-only kernel shares the f32 elementwise op decomposition of the
    # XLA TPU lowering (convert→multiply→reduce, no dot). Interpret mode can't
    # witness bit-equality — the CPU einsum's reduction order differs from
    # jnp.sum already — so values are pinned tight here and the bitwise
    # question is answered on hardware (scripts/ab_vpu_kernel.py → DEVNOTES).
    got5 = decode_attention_rowgroup_vpu(q, k, v, mask2d, scale, group=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got5), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("group", [2, 4])
def test_rowgroup_matches_grid_variants(group):
    """The grouped kernel is value-identical to the per-(b,h) kernel (same op
    order per head) across group sizes that divide the batch."""
    rng = np.random.RandomState(1)
    b, h, m, s, dh = 8, 3, 1, 192, 64
    q = jnp.asarray(rng.randn(b, h, m, dh), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, dh), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, dh), jnp.float32)
    mask2d = jnp.asarray(np.where(rng.rand(b, s) > 0.3, 0.0,
                                  float(np.finfo(np.float32).min)), jnp.float32)
    scale = 1.0 / np.sqrt(dh)
    base = decode_attention(q, k, v, mask2d, scale, interpret=True)
    grouped = decode_attention_rowgroup(q, k, v, mask2d, scale, group=group, interpret=True)
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(base))


def test_kernel_dispatch_end_to_end_greedy(monkeypatch):
    """CXRMATE_DECODE_KERNEL=rowgroup[:G] routes the real decode loop through
    the grouped kernel (interpret mode off-TPU) and produces the same tokens as
    the default XLA path.

    The env knob is resolved at CALL time by the public ``generate`` wrapper and
    threaded through as a static jit arg, so each spec compiles its own program
    (no stale-jit-cache reuse — the round-3 vacuous-test bug). Trace-time call
    counters on the kernel entry points prove the routing actually executes:
    ``rowgroup``/``rowgrid`` must hit the kernel for self AND cross attention
    (2 calls per layer in the traced body), ``cross-...`` for cross only."""
    torch = pytest.importorskip("torch")  # noqa: F841 — oracle build needs torch
    from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder
    from cxrmate_tpu.configs import EncoderDecoderConfig
    from cxrmate_tpu.generate import GenerationConfig, generate
    from cxrmate_tpu.models import encoder_decoder as ed
    from cxrmate_tpu.ops import decode_attention as da
    from tests.oracles import (build_reference_model, small_bert_cfg_dataclass,
                               small_cvt_cfg_dataclass)

    BOS, EOS, SEP, PAD = 1, 2, 3, 4
    ref = build_reference_model("multi", vocab_size=97, seed=5)
    cfg = EncoderDecoderConfig(
        encoder=small_cvt_cfg_dataclass(projection_size=32),
        decoder=small_bert_cfg_dataclass(vocab_size=97, cross_dim=32),
        variant="multi", image_size=64,
    )
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    pixels = np.random.RandomState(3).randn(2, 2, 3, 64, 64).astype(np.float32)
    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(max_new_tokens=10, bos_token_id=BOS, eos_token_id=EOS,
                               pad_token_id=PAD, special_token_ids=(SEP,))
    prompt = jnp.full((2, 1), BOS, jnp.int32)
    pmask = jnp.ones((2, 1), jnp.int32)

    # count kernel invocations at TRACE time (models/bert.py re-imports these
    # names from the module each bert_step, so the wrappers are picked up)
    calls = {"rowgroup": 0, "rowgrid": 0, "grid": 0, "vpu": 0}
    for name, key in (("decode_attention_rowgroup", "rowgroup"),
                      ("decode_attention_rowgrid", "rowgrid"),
                      ("decode_attention_rowgroup_vpu", "vpu"),
                      ("decode_attention", "grid")):
        orig = getattr(da, name)

        def counted(*a, _orig=orig, _key=key, **kw):
            calls[_key] += 1
            return _orig(*a, **kw)

        monkeypatch.setattr(da, name, counted)

    monkeypatch.delenv("CXRMATE_DECODE_KERNEL", raising=False)
    base = np.asarray(generate(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt, pmask))
    assert calls == {"rowgroup": 0, "rowgrid": 0, "grid": 0, "vpu": 0}  # default: XLA

    # the tiny oracle decoder has 2 layers → the single-phase loop body traces
    # 2 self + 2 cross kernel calls for full routing, 2 cross-only for "cross-"
    for env, key, n_min in (("rowgroup:2", "rowgroup", 4), ("rowgrid", "rowgrid", 4),
                            ("cross-rowgroup:2", "rowgroup", 2),
                            ("cross-vpu-rowgroup:2", "vpu", 2)):
        for k in calls:
            calls[k] = 0
        monkeypatch.setenv("CXRMATE_DECODE_KERNEL", env)
        got = np.asarray(generate(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt, pmask))
        assert calls[key] >= n_min, (env, calls)
        np.testing.assert_array_equal(got, base, err_msg=env)


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
