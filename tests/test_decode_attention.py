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


# ------------------------------------------------------- int8 cross-KV (q8)
def test_q8_quantize_roundtrip_bound():
    """quantize_kv_rowwise: per-element dequant error ≤ scale/2 (symmetric
    round-to-nearest), scales laid out [B, H, 1, S], all-zero rows safe."""
    from cxrmate_tpu.ops.decode_attention import quantize_kv_rowwise

    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, 64, 32).astype(np.float32) * rng.rand(2, 3, 64, 1)
    x[0, 0, 5] = 0.0  # all-zero row must not divide by zero
    q, s = quantize_kv_rowwise(jnp.asarray(x))
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 1, 64)
    deq = np.asarray(q, np.float32) * np.asarray(s).transpose(0, 1, 3, 2)
    np.testing.assert_allclose(deq, x, atol=float(np.asarray(s).max()) / 2 + 1e-7)
    np.testing.assert_array_equal(deq[0, 0, 5], 0.0)


@pytest.mark.parametrize("m", [1, 4])
def test_q8_kernel_matches_xla_when_lossless(m):
    """With K/V rows that are exactly int8-representable (amax forced to 127 →
    scale 1.0, values integral) the quantisation is lossless and the q8 kernel
    must match the XLA attention path like the bf16 kernels do — this pins the
    kernel's scale-folding algebra ((q·kq)·ks and (probs·vs)·vq)."""
    from cxrmate_tpu.ops.decode_attention import (decode_attention_rowgroup_q8,
                                                  quantize_kv_rowwise)

    rng = np.random.RandomState(3)
    b, h, s, dh = 4, 3, 256, 64
    k = rng.randint(-127, 128, (b, h, s, dh)).astype(np.float32)
    v = rng.randint(-127, 128, (b, h, s, dh)).astype(np.float32)
    k[..., 0] = 127.0  # amax == 127 per row → scale exactly 1.0
    v[..., 0] = 127.0
    q = jnp.asarray(rng.randn(b, h, m, dh), jnp.float32)
    mask2d = jnp.asarray(np.where(rng.rand(b, s) > 0.2, 0.0,
                                  float(np.finfo(np.float32).min)), jnp.float32)
    scale = 1.0 / np.sqrt(dh)
    kq, ks = quantize_kv_rowwise(jnp.asarray(k))
    vq, vs = quantize_kv_rowwise(jnp.asarray(v))
    np.testing.assert_array_equal(np.asarray(ks), 1.0)
    want = attention(q, jnp.asarray(k), jnp.asarray(v), scale, mask2d[:, None, None, :])
    for group in (1, 2, 4):
        got = decode_attention_rowgroup_q8(q, kq, ks, vq, vs, mask2d, scale,
                                           group=group, interpret=True)
        # atol scaled to the ±127 value range: softmax-underflow (≈1e-23) ctx
        # elements carry meaningless relative error, so rtol alone over-rejects
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-3, err_msg=f"group={group}")


def test_q8_kernel_quantised_tolerance():
    """On arbitrary float K/V the q8 kernel approximates the exact attention
    within int8 quantisation tolerance (the serving-mode contract)."""
    from cxrmate_tpu.ops.decode_attention import (decode_attention_rowgroup_q8,
                                                  quantize_kv_rowwise)

    rng = np.random.RandomState(11)
    b, h, m, s, dh = 2, 4, 1, 192, 64
    q = jnp.asarray(rng.randn(b, h, m, dh), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, dh), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, dh), jnp.float32)
    mask2d = jnp.zeros((b, s), jnp.float32)
    scale = 1.0 / np.sqrt(dh)
    kq, ks = quantize_kv_rowwise(k)
    vq, vs = quantize_kv_rowwise(v)
    want = np.asarray(attention(q, k, v, scale, mask2d[:, None, None, :]))
    got = np.asarray(decode_attention_rowgroup_q8(q, kq, ks, vq, vs, mask2d,
                                                  scale, group=2, interpret=True))
    # ctx values are ~N(0, 0.1) here so relative error is ill-conditioned;
    # bound the absolute and RMS error against the unit-scale K/V instead
    # (~0.4%/element int8 noise, averaged by the softmax weighting)
    err = np.abs(got - want)
    assert err.max() < 0.1, err.max()
    assert np.sqrt((err ** 2).mean()) < 0.02, np.sqrt((err ** 2).mean())


def test_q8_dispatch_end_to_end(monkeypatch):
    """CXRMATE_DECODE_KERNEL=cross-rowgroup-q8[:G] routes greedy AND beam
    decode through the int8 kernel: the cross cache is quantised once after
    prefill (the carried cross tensors become zero-width), the kernel is
    invoked at trace time, and the first generated token — which comes from
    the UNQUANTISED prefill logits — matches the exact path."""
    torch = pytest.importorskip("torch")  # noqa: F841 — oracle build needs torch
    from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder
    from cxrmate_tpu.configs import EncoderDecoderConfig
    from cxrmate_tpu.generate import GenerationConfig, generate
    from cxrmate_tpu.generate.beam import beam_search
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
    prompt = jnp.full((2, 1), BOS, jnp.int32)
    pmask = jnp.ones((2, 1), jnp.int32)

    calls = {"q8": 0}
    orig = da.decode_attention_rowgroup_q8

    def counted(*a, **kw):
        calls["q8"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(da, "decode_attention_rowgroup_q8", counted)

    gen_cfg = GenerationConfig(max_new_tokens=8, bos_token_id=BOS, eos_token_id=EOS,
                               pad_token_id=PAD, special_token_ids=(SEP,))
    monkeypatch.delenv("CXRMATE_DECODE_KERNEL", raising=False)
    base = np.asarray(generate(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt, pmask))
    assert calls["q8"] == 0

    monkeypatch.setenv("CXRMATE_DECODE_KERNEL", "cross-rowgroup-q8:2")
    got = np.asarray(generate(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt, pmask))
    assert calls["q8"] >= 2  # 2 decoder layers → ≥ 2 cross calls in the traced body
    assert got.shape == base.shape
    np.testing.assert_array_equal(got[:, 1], base[:, 1])  # first token: prefill logits
    assert ((got >= 0) & (got < 97)).all()

    calls["q8"] = 0
    beam_cfg = GenerationConfig(max_new_tokens=8, num_beams=2, bos_token_id=BOS,
                                eos_token_id=EOS, pad_token_id=PAD,
                                special_token_ids=(SEP,))
    out, _scores = beam_search(variables, cfg, beam_cfg, enc_hidden, enc_mask,
                               prompt, pmask)
    out = np.asarray(out)
    assert calls["q8"] >= 2
    assert out.shape == (2, 1 + 8) and ((out >= 0) & (out < 97)).all()


def test_kernel_fully_masked_rows_are_finite():
    """All-masked key rows must not produce NaNs (softmax of all -inf) — the
    q8 kernel included (its softmax relies on the same max-subtraction)."""
    from cxrmate_tpu.ops.decode_attention import (decode_attention_rowgroup_q8,
                                                  quantize_kv_rowwise)

    b, h, m, s, dh = 2, 2, 1, 128, 64
    q = jnp.ones((b, h, m, dh), jnp.float32)
    k = jnp.ones((b, h, s, dh), jnp.float32)
    v = jnp.ones((b, h, s, dh), jnp.float32)
    mask = jnp.full((b, s), float(np.finfo(np.float32).min), jnp.float32)
    out = decode_attention(q, k, v, mask, 0.125, interpret=True)
    want = attention(q, k, v, 0.125, mask[:, None, None, :])
    np.testing.assert_array_equal(np.isnan(np.asarray(out)), np.isnan(np.asarray(want)))
    kq, ks = quantize_kv_rowwise(k)
    vq, vs = quantize_kv_rowwise(v)
    out_q8 = decode_attention_rowgroup_q8(q, kq, ks, vq, vs, mask, 0.125,
                                          group=2, interpret=True)
    np.testing.assert_array_equal(np.isnan(np.asarray(out_q8)),
                                  np.isnan(np.asarray(want)))


def test_resolve_decode_kernel_rejects_near_miss_specs():
    """A typo'd spec must raise, not silently run a different kernel — e.g.
    'rowgroup-q8:4' without the mandatory 'cross-' prefix used to route ALL
    attention through the slow bf16 rowgroup kernel."""
    from cxrmate_tpu.ops.decode_attention import resolve_decode_kernel

    for good in ("", "0", "1", "rowgrid", "rowgroup", "rowgroup:4",
                 "vpu-rowgroup:2", "cross-rowgroup:4", "cross-rowgrid",
                 "cross-rowgroup-q8", "cross-rowgroup-q8:8"):
        resolve_decode_kernel(good)
    for bad in ("rowgroup-q8:4", "q8", "cross-", "cross-q8", "rowgroup:",
                "rowgroup:x", "cross-rowgroup-q8:", "CROSS-rowgroup:4"):
        with pytest.raises(ValueError, match="invalid CXRMATE_DECODE_KERNEL"):
            resolve_decode_kernel(bad)
