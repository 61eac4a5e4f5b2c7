"""Beam-search (4 beams) token parity vs HF `generate` through the reference models."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder
from cxrmate_tpu.configs import EncoderDecoderConfig, LoraConfig
from cxrmate_tpu.generate import GenerationConfig
from cxrmate_tpu.generate.beam import beam_search
from cxrmate_tpu.models import encoder_decoder as ed
from tests.oracles import (
    build_reference_model,
    small_bert_cfg_dataclass,
    small_cvt_cfg_dataclass,
)

BOS, EOS, SEP, PAD = 1, 2, 3, 4
PMT_SEP = 90


def _my_config(variant):
    return EncoderDecoderConfig(
        encoder=small_cvt_cfg_dataclass(projection_size=32),
        decoder=small_bert_cfg_dataclass(vocab_size=97, cross_dim=32),
        variant=variant,
        lora=LoraConfig() if variant == "longitudinal" else None,
        image_size=64,
    )


def _pad_to(a, width, fill):
    out = np.full((a.shape[0], width), fill, dtype=a.dtype)
    out[:, : a.shape[1]] = a
    return out


@pytest.mark.parametrize("variant", ["single", "multi"])
def test_beam_parity_single_multi(variant):
    ref = build_reference_model(variant, vocab_size=97, seed=7)
    cfg = _my_config(variant)
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(3)
    b = 2
    if variant == "single":
        pixels = rng.randn(b, 3, 64, 64).astype(np.float32)
    else:
        pixels = rng.randn(b, 2, 3, 64, 64).astype(np.float32)
        pixels[0, 1] = 0.0
    max_length = 14
    with torch.no_grad():
        expected = ref.generate(
            pixel_values=torch.from_numpy(pixels),
            special_token_ids=[SEP],
            max_length=max_length,
            bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
            num_beams=4, return_dict_in_generate=True, use_cache=True,
        )["sequences"].numpy()

    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    if variant == "single":
        enc_mask = jnp.ones_like(enc_mask)
    gen_cfg = GenerationConfig(
        max_new_tokens=max_length - 1,
        bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        special_token_ids=(SEP,), num_beams=4,
    )
    prompt = jnp.full((b, 1), BOS, jnp.int32)
    got, _ = beam_search(
        variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt, jnp.ones((b, 1), jnp.int32)
    )
    got = np.asarray(got)
    np.testing.assert_array_equal(got, _pad_to(expected, got.shape[1], PAD))


def test_beam_parity_longitudinal():
    ref = build_reference_model("longitudinal", vocab_size=97, seed=9)
    cfg = _my_config("longitudinal")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(4)
    b = 2
    pixels = rng.randn(b, 2, 3, 64, 64).astype(np.float32)
    pixels[1, 1] = 0.0
    prompt = np.full((b, 6), PAD, dtype=np.int64)
    prompt[0, :4] = [91, 30, PMT_SEP, BOS]
    prompt[1, :6] = [91, 31, 32, PMT_SEP, 41, BOS]
    decoder_max_len = 10
    max_length = decoder_max_len + prompt.shape[1]
    specials = [PMT_SEP, BOS, SEP]
    with torch.no_grad():
        out = ref.generate(
            pixel_values=torch.from_numpy(pixels),
            decoder_input_ids=torch.from_numpy(prompt),
            special_token_ids=specials,
            mask_token_id=PAD,
            max_length=max_length,
            bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
            num_beams=4, return_dict_in_generate=True, use_cache=True,
        )["sequences"].numpy()
    assert (out[:, 0] == BOS).all()
    expected = out[:, 1:]

    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(
        max_new_tokens=decoder_max_len - 1,
        bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD, mask_token_id=PAD,
        special_token_ids=tuple(specials), token_type_sections=(0, 1, 0, 1),
        num_beams=4,
    )
    prompt_j = jnp.asarray(prompt.astype(np.int32))
    got, _ = beam_search(
        variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt_j,
        (prompt_j != PAD).astype(jnp.int32),
    )
    got = np.asarray(got)
    np.testing.assert_array_equal(got, _pad_to(expected, got.shape[1], PAD))


def test_beam_early_stopping_parity():
    """early_stopping=True semantics also match HF."""
    ref = build_reference_model("multi", vocab_size=97, seed=11)
    cfg = _my_config("multi")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(6)
    pixels = rng.randn(2, 2, 3, 64, 64).astype(np.float32)
    max_length = 12
    with torch.no_grad():
        expected = ref.generate(
            pixel_values=torch.from_numpy(pixels),
            special_token_ids=[SEP],
            max_length=max_length, early_stopping=True,
            bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
            num_beams=3, return_dict_in_generate=True, use_cache=True,
        )["sequences"].numpy()
    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(
        max_new_tokens=max_length - 1, bos_token_id=BOS, eos_token_id=EOS,
        pad_token_id=PAD, special_token_ids=(SEP,), num_beams=3, early_stopping=True,
    )
    prompt = jnp.full((2, 1), BOS, jnp.int32)
    got, _ = beam_search(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt,
                         jnp.ones((2, 1), jnp.int32))
    got = np.asarray(got)
    np.testing.assert_array_equal(got, _pad_to(expected, got.shape[1], PAD))


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_blockdiag_onehot_reorder_is_exact(dtype):
    """The beam cache reorder is a block-diagonal one-hot matmul (beam.py) —
    it must stay bit-exact vs row gathering for every selection pattern,
    including duplicated source beams (beam duplication is routine in search).
    """
    import jax

    rng = np.random.RandomState(0)
    b, k = 5, 4
    x = jnp.asarray(rng.randn(b * k, 3, 17, 8), dtype)
    new_col = jnp.asarray(rng.randn(b * k, 3, 8), dtype)
    for trial in range(5):
        sel = jnp.asarray(rng.randint(0, k, (b, k)), jnp.int32)
        flat = (sel + jnp.arange(b)[:, None] * k).reshape(-1)
        onehot = jax.nn.one_hot(sel, k, dtype=dtype)
        oh_full = (
            onehot[:, :, None, :] * jnp.eye(b, dtype=dtype)[:, None, :, None]
        ).reshape(b * k, b * k)
        got = jax.lax.dot_general(
            oh_full, x, (((1,), (0,)), ((), ())), preferred_element_type=dtype
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(x)[np.asarray(flat)])
        got_col = jax.lax.dot_general(
            oh_full, new_col, (((1,), (0,)), ((), ())), preferred_element_type=dtype
        )
        np.testing.assert_array_equal(
            np.asarray(got_col), np.asarray(new_col)[np.asarray(flat)]
        )


def test_deferred_write_matches_written_cache():
    """bert_step(deferred_write=True) must produce bit-identical logits to the
    written-cache path and return the exact new KV columns."""
    import jax

    from cxrmate_tpu.models import bert as bert_mod

    cfg = small_bert_cfg_dataclass(vocab_size=61, cross_dim=24)
    params = bert_mod.init_bert_params(jax.random.PRNGKey(0), cfg)
    b, t_total, s_enc = 3, 10, 7
    cache = bert_mod.init_cache(cfg, b, t_total, s_enc, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    enc_hidden = jnp.asarray(rng.randn(b, s_enc, 24), jnp.float32)
    enc_mask = jnp.ones((b, s_enc), jnp.int32)
    prompt = jnp.asarray(rng.randint(5, 60, (b, 4)), jnp.int32)
    types = jnp.zeros_like(prompt)
    pos = jnp.broadcast_to(jnp.arange(4), (b, 4))
    _, cache = bert_mod.bert_prefill(
        params, cfg, cache, prompt, jnp.ones_like(prompt), types, pos,
        enc_hidden, enc_mask,
    )
    tok = jnp.asarray(rng.randint(5, 60, (b,)), jnp.int32)
    ttype = jnp.zeros((b,), jnp.int32)
    posn = jnp.full((b,), 4, jnp.int32)
    key_mask = (jnp.arange(t_total)[None, :] <= 4).astype(jnp.int32) * jnp.ones((b, 1), jnp.int32)
    idx = jnp.asarray(4, jnp.int32)
    logits_w, cache_w = bert_mod.bert_step(
        params, cfg, cache, tok, ttype, posn, idx, key_mask, enc_mask
    )
    logits_d, (pend_k, pend_v) = bert_mod.bert_step(
        params, cfg, cache, tok, ttype, posn, idx, key_mask, enc_mask,
        deferred_write=True,
    )
    np.testing.assert_array_equal(np.asarray(logits_w), np.asarray(logits_d))
    for i in range(cfg.num_hidden_layers):
        np.testing.assert_array_equal(
            np.asarray(cache_w.self_k[i][:, :, 4, :]), np.asarray(pend_k[i])
        )
        np.testing.assert_array_equal(
            np.asarray(cache_w.self_v[i][:, :, 4, :]), np.asarray(pend_v[i])
        )


def test_beam_write_modes_identical():
    """write_mode='dus' (column written via dynamic_update_slice before
    attention) and 'fused' (virtual read + write folded into the reorder dot)
    move the same values differently — sequences AND scores must be identical
    bit-for-bit (beam.py write_mode)."""
    ref = build_reference_model("multi", vocab_size=97, seed=21)
    cfg = _my_config("multi")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(5)
    pixels = rng.randn(3, 2, 3, 64, 64).astype(np.float32)
    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(
        max_new_tokens=13,
        bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        special_token_ids=(SEP,), num_beams=4,
    )
    prompt = jnp.full((3, 1), BOS, jnp.int32)
    outs = {}
    for mode in ("fused", "dus"):
        seqs, scores = beam_search(
            variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt,
            jnp.ones((3, 1), jnp.int32), write_mode=mode,
        )
        outs[mode] = (np.asarray(seqs), np.asarray(scores))
    np.testing.assert_array_equal(outs["fused"][0], outs["dus"][0])
    np.testing.assert_array_equal(outs["fused"][1], outs["dus"][1])


def test_prompt_logits_col_does_not_recompile():
    """The CLI test stage buckets prompt widths but pins the first-token logits
    column to the batch's true width — the column must be a TRACED argument, or
    every distinct true width would compile a fresh beam program despite the
    bucketing (serving compile-count regression guard)."""
    ref = build_reference_model("longitudinal", vocab_size=97, seed=31)
    cfg = _my_config("longitudinal")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(11)
    pixels = rng.randn(2, 2, 3, 64, 64).astype(np.float32)
    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    PMT_SEP = 6
    gen_cfg = GenerationConfig(
        max_new_tokens=8, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(PMT_SEP, BOS, SEP),
        token_type_sections=(0, 1, 0, 1), num_beams=2,
    )
    width = 8  # one bucket
    ids = np.full((2, width), PAD, np.int32)
    ids[:, 0] = BOS
    ids[:, 1:4] = 7
    prompt_ids = jnp.asarray(ids)
    prompt_mask = jnp.asarray((ids != PAD).astype(np.int32))
    before = beam_search._cache_size()
    out3, _ = beam_search(variables, cfg, gen_cfg, enc_hidden, enc_mask,
                          prompt_ids, prompt_mask, prompt_logits_col=3)
    after_first = beam_search._cache_size()
    out4, _ = beam_search(variables, cfg, gen_cfg, enc_hidden, enc_mask,
                          prompt_ids, prompt_mask, prompt_logits_col=4)
    after_second = beam_search._cache_size()
    assert after_first == before + 1
    assert after_second == after_first, "distinct logits columns recompiled"
    assert not np.array_equal(np.asarray(out3), np.asarray(out4))  # column matters


def test_beam_write_mode_pallas_identical():
    """write_mode='pallas' (in-place Pallas reorder+write, interpret mode on
    CPU) must produce bit-identical sequences and scores to the fused dot
    path — the kernel is pure data movement."""
    ref = build_reference_model("multi", vocab_size=97, seed=23)
    cfg = _my_config("multi")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(6)
    pixels = rng.randn(3, 2, 3, 64, 64).astype(np.float32)
    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(
        max_new_tokens=11,
        bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        special_token_ids=(SEP,), num_beams=4,
    )
    prompt = jnp.full((3, 1), BOS, jnp.int32)
    outs = {}
    for mode in ("fused", "pallas"):
        seqs, scores = beam_search(
            variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt,
            jnp.ones((3, 1), jnp.int32), write_mode=mode,
        )
        outs[mode] = (np.asarray(seqs), np.asarray(scores))
    np.testing.assert_array_equal(outs["fused"][0], outs["pallas"][0])
    np.testing.assert_array_equal(outs["fused"][1], outs["pallas"][1])


def test_beam_reorder_write_kernel_unit():
    """Unit check of ops/beam_reorder.py against the reference formulation
    (gather + column write), incl. the no-write (-1) first-step case."""
    from cxrmate_tpu.ops.beam_reorder import beam_reorder_write

    rng = np.random.RandomState(0)
    groups, beams, h, t, dh = 3, 4, 2, 16, 64
    r = groups * beams
    ck = jnp.asarray(rng.randn(r, h, t, dh), jnp.float32)
    cv = jnp.asarray(rng.randn(r, h, t, dh), jnp.float32)
    nk = jnp.asarray(rng.randn(r, h, dh), jnp.float32)
    nv = jnp.asarray(rng.randn(r, h, dh), jnp.float32)
    sel = jnp.asarray(rng.randint(0, beams, r), jnp.int32)

    def expected(cache, new, idx):
        src = (np.arange(r) // beams) * beams + np.asarray(sel)
        out = np.asarray(cache)[src]
        if idx >= 0:
            out[:, :, idx, :] = np.asarray(new)[src]
        return out

    for idx in (5, 0, t - 1, -1):
        ok, ov = beam_reorder_write(ck, cv, nk, nv, sel, jnp.asarray(idx, jnp.int32),
                                    beams=beams, interpret=True)
        np.testing.assert_array_equal(np.asarray(ok), expected(ck, nk, idx))
        np.testing.assert_array_equal(np.asarray(ov), expected(cv, nv, idx))

def test_beam_segmented_cache_growth_is_inert():
    """cache_segments > 1 on the beam path (phase-capped while_loops, the
    fused-write column mask over the phase's own cache width) must be
    bit-identical to the single-phase loop — sequences AND scores."""
    ref = build_reference_model("longitudinal", vocab_size=97, seed=29)
    cfg = _my_config("longitudinal")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(9)
    pixels = rng.randn(2, 2, 3, 64, 64).astype(np.float32)
    prompt = np.full((2, 6), PAD, dtype=np.int32)
    prompt[0, :4] = [91, 30, PMT_SEP, BOS]
    prompt[1, :6] = [91, 31, 32, PMT_SEP, 41, BOS]
    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(
        max_new_tokens=13, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(PMT_SEP, BOS, SEP),
        token_type_sections=(0, 1, 0, 1), num_beams=4,
    )
    prompt_j = jnp.asarray(prompt)
    pmask = (prompt_j != PAD).astype(jnp.int32)
    outs = {}
    for spec in (1, "3:4"):
        seqs, scores = beam_search(
            variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt_j, pmask,
            cache_segments=spec,
        )
        outs[spec] = (np.asarray(seqs), np.asarray(scores))
    np.testing.assert_array_equal(outs[1][0], outs["3:4"][0])
    np.testing.assert_array_equal(outs[1][1], outs["3:4"][1])


def test_image_pad_is_inert_beam():
    """Beam counterpart of test_image_pad_is_inert (test_generate_greedy.py):
    all-zero padding slots beyond the batch's real max image count leave the
    beam-search sequences AND hypothesis scores bit-identical (their cross
    columns are masked to exactly-0.0 softmax weights), so the CLI's
    ``pad_images: batch`` collate cannot change test-stage outputs."""
    ref = build_reference_model("longitudinal", vocab_size=97, seed=29)
    cfg = _my_config("longitudinal")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(12)
    b = 2
    trimmed = rng.randn(b, 2, 3, 64, 64).astype(np.float32)
    trimmed[0, 1] = 0.0
    padded = np.zeros((b, 5, 3, 64, 64), np.float32)
    padded[:, :2] = trimmed

    prompt = np.full((b, 7), PAD, dtype=np.int32)
    prompt[0, :5] = [91, 30, PMT_SEP, 40, BOS]
    prompt[1, :7] = [91, 31, 32, PMT_SEP, 41, 42, BOS]
    mask = (prompt != PAD).astype(np.int32)
    gen_cfg = GenerationConfig(
        max_new_tokens=11, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(PMT_SEP, BOS, SEP),
        token_type_sections=(0, 1, 0, 1), num_beams=4,
    )
    outs = {}
    for name, pix in (("trimmed", trimmed), ("padded", padded)):
        enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pix), cfg)
        seq, scores = beam_search(
            variables, cfg, gen_cfg, enc_hidden, enc_mask,
            jnp.asarray(prompt), jnp.asarray(mask),
        )
        outs[name] = (np.asarray(seq), np.asarray(scores))
    np.testing.assert_array_equal(outs["trimmed"][0], outs["padded"][0])
    np.testing.assert_array_equal(outs["trimmed"][1], outs["padded"][1])


def test_env_knobs_resolved_at_call_time(monkeypatch):
    """CXRMATE_CACHE_SEGMENTS is resolved OUTSIDE jit, per call: changing the
    env between calls in one process must key a fresh trace (not silently reuse
    the one cached under cache_segments=None) and — segmentation being
    bit-exact — produce identical sequences and scores."""
    ref = build_reference_model("multi", vocab_size=97, seed=23)
    cfg = _my_config("multi")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(9)
    pixels = rng.randn(2, 2, 3, 64, 64).astype(np.float32)
    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(
        max_new_tokens=12,
        bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        special_token_ids=(SEP,), num_beams=2,
    )
    prompt = jnp.full((2, 1), BOS, jnp.int32)
    pmask = jnp.ones((2, 1), jnp.int32)

    monkeypatch.setenv("CXRMATE_CACHE_SEGMENTS", "1")
    seq1, sc1 = beam_search(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt, pmask)
    n1 = beam_search._cache_size()
    monkeypatch.setenv("CXRMATE_CACHE_SEGMENTS", "2:4")
    seq2, sc2 = beam_search(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt, pmask)
    n2 = beam_search._cache_size()
    assert n2 == n1 + 1, "env change did not produce a fresh trace"
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq2))
    np.testing.assert_array_equal(np.asarray(sc1), np.asarray(sc2))
