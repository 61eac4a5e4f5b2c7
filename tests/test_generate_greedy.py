"""Greedy-decode token parity vs HF `generate` driven through the reference models."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder
from cxrmate_tpu.configs import EncoderDecoderConfig, LoraConfig
from cxrmate_tpu.generate import GenerationConfig, generate
from cxrmate_tpu.models import encoder_decoder as ed
from tests.oracles import (
    build_reference_model,
    small_bert_cfg_dataclass,
    small_cvt_cfg_dataclass,
)

BOS, EOS, SEP, PAD = 1, 2, 3, 4
PMT_SEP = 90  # stand-in ids for the additional specials in the tiny vocab


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
def test_greedy_parity_single_multi(variant):
    ref = build_reference_model(variant, vocab_size=97)
    cfg = _my_config(variant)
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(0)
    b = 2
    if variant == "single":
        pixels = rng.randn(b, 3, 64, 64).astype(np.float32)
    else:
        pixels = rng.randn(b, 2, 3, 64, 64).astype(np.float32)
        pixels[1, 1] = 0.0
    max_length = 16
    with torch.no_grad():
        expected = ref.generate(
            pixel_values=torch.from_numpy(pixels),
            special_token_ids=[SEP],
            max_length=max_length,
            bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
            num_beams=1, return_dict_in_generate=True, use_cache=True,
        )["sequences"].numpy()

    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    if variant == "single":
        enc_mask = jnp.ones_like(enc_mask)
    gen_cfg = GenerationConfig(
        max_new_tokens=max_length - 1,
        bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        special_token_ids=(SEP,),
    )
    prompt = jnp.full((b, 1), BOS, jnp.int32)
    got = np.asarray(
        generate(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt, jnp.ones((b, 1), jnp.int32))
    )
    np.testing.assert_array_equal(got, _pad_to(expected, got.shape[1], PAD))


def test_greedy_parity_longitudinal():
    ref = build_reference_model("longitudinal", vocab_size=97)
    cfg = _my_config("longitudinal")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(1)
    b = 2
    pixels = rng.randn(b, 2, 3, 64, 64).astype(np.float32)
    pixels[0, 1] = 0.0
    # prompt rows of different lengths → right padding with PAD (= mask token)
    prompt = np.full((b, 7), PAD, dtype=np.int64)
    prompt[0, :5] = [91, 30, PMT_SEP, 40, BOS]
    prompt[1, :7] = [91, 31, 32, PMT_SEP, 41, 42, BOS]
    decoder_max_len = 12
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
            num_beams=1, return_dict_in_generate=True, use_cache=True,
        )["sequences"].numpy()
    assert (out[:, 0] == BOS).all()  # HF prepends BOS; reference strips it
    expected = out[:, 1:]

    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(
        max_new_tokens=decoder_max_len - 1,
        bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD, mask_token_id=PAD,
        special_token_ids=tuple(specials), token_type_sections=(0, 1, 0, 1),
    )
    prompt_j = jnp.asarray(prompt.astype(np.int32))
    got = np.asarray(
        generate(
            variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt_j,
            (prompt_j != PAD).astype(jnp.int32),
        )
    )
    np.testing.assert_array_equal(got, _pad_to(expected, got.shape[1], PAD))


def test_prompt_bucketing_is_inert():
    """Extra right padding of the longitudinal prompt changes nothing (mask-token
    semantics) — the bucketed decode emits identical report strings."""
    ref = build_reference_model("longitudinal", vocab_size=97, seed=13)
    cfg = _my_config("longitudinal")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(5)
    pixels = rng.randn(2, 2, 3, 64, 64).astype(np.float32)
    prompt = np.full((2, 7), PAD, dtype=np.int32)
    prompt[0, :5] = [91, 30, PMT_SEP, 40, BOS]
    prompt[1, :7] = [91, 31, 32, PMT_SEP, 41, 42, BOS]
    mask = (prompt != PAD).astype(np.int32)

    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(
        max_new_tokens=11, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(PMT_SEP, BOS, SEP),
        token_type_sections=(0, 1, 0, 1),
    )
    base = np.asarray(generate(variables, cfg, gen_cfg, enc_hidden, enc_mask,
                               jnp.asarray(prompt), jnp.asarray(mask)))
    ids_b, mask_b = ed.bucket_prompt(prompt, mask, PAD, bucket=16)
    assert ids_b.shape[1] == 16
    bucketed = np.asarray(generate(variables, cfg, gen_cfg, enc_hidden, enc_mask,
                                   jnp.asarray(ids_b), jnp.asarray(mask_b),
                                   prompt_logits_col=prompt.shape[1] - 1))
    # generated tokens (after each row's prompt region) must match
    np.testing.assert_array_equal(base[:, 7:], bucketed[:, 16:])

def test_image_pad_is_inert():
    """Extra all-zero image slots (the collate's padding convention) change
    nothing: their encoder-mask columns carry additive -1e9 cross masks →
    exactly-0.0 softmax weights, so sequences AND per-step logits are
    bit-identical. This is what lets the CLI pad image stacks to the batch max
    (``pad_images: batch``, the reference's pad_sequence semantics) instead of
    ``max_images_per_study`` without altering any output."""
    ref = build_reference_model("multi", vocab_size=97, seed=23)
    cfg = _my_config("multi")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(11)
    b = 2
    trimmed = rng.randn(b, 2, 3, 64, 64).astype(np.float32)
    trimmed[1, 1] = 0.0  # row 1 has one real image even before the extra padding
    padded = np.zeros((b, 4, 3, 64, 64), np.float32)
    padded[:, :2] = trimmed

    gen_cfg = GenerationConfig(
        max_new_tokens=13, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        special_token_ids=(SEP,),
    )
    prompt = jnp.full((b, 1), BOS, jnp.int32)
    outs = {}
    for name, pix in (("trimmed", trimmed), ("padded", padded)):
        enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pix), cfg)
        seq, scores = generate(
            variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt,
            jnp.ones((b, 1), jnp.int32), return_scores=True,
        )
        outs[name] = (np.asarray(seq), np.asarray(scores))
    np.testing.assert_array_equal(outs["trimmed"][0], outs["padded"][0])
    np.testing.assert_array_equal(outs["trimmed"][1], outs["padded"][1])


def test_segmented_cache_growth_is_inert():
    """cache_segments > 1 (decode in phases with a narrower KV cache early,
    zero-padded up between phases) must be bit-identical to the single-phase
    loop — sequences AND per-step logits (decode.segment_bounds)."""
    from cxrmate_tpu.generate.decode import segment_bounds

    # unit: bounds ascend, end at p_len+max_new, respect rounding
    assert segment_bounds(6, 11, 1) == (17,)
    assert segment_bounds(6, 11, 3, round_to=4) == (12, 16, 17)
    assert segment_bounds(10, 100, 2) == (64, 110)
    assert segment_bounds(10, 100, 4, round_to=64) == (64, 110)
    assert segment_bounds(200, 128, 2) == (320, 328)
    assert segment_bounds(200, 128, 2, round_to=16) == (272, 328)

    ref = build_reference_model("longitudinal", vocab_size=97, seed=17)
    cfg = _my_config("longitudinal")
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(8)
    pixels = rng.randn(2, 2, 3, 64, 64).astype(np.float32)
    prompt = np.full((2, 7), PAD, dtype=np.int32)
    prompt[0, :5] = [91, 30, PMT_SEP, 40, BOS]
    prompt[1, :7] = [91, 31, 32, PMT_SEP, 41, 42, BOS]
    mask = (prompt != PAD).astype(np.int32)

    enc_hidden, enc_mask, _ = ed.encode_images(variables, jnp.asarray(pixels), cfg)
    gen_cfg = GenerationConfig(
        max_new_tokens=13, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        mask_token_id=PAD, special_token_ids=(PMT_SEP, BOS, SEP),
        token_type_sections=(0, 1, 0, 1),
    )
    outs = {}
    for spec in (1, "4:4"):
        seq, scores = generate(
            variables, cfg, gen_cfg, enc_hidden, enc_mask,
            jnp.asarray(prompt), jnp.asarray(mask),
            return_scores=True, cache_segments=spec,
        )
        outs[spec] = (np.asarray(seq), np.asarray(scores))
    np.testing.assert_array_equal(outs[1][0], outs["4:4"][0])
    np.testing.assert_array_equal(outs[1][1], outs["4:4"][1])
