"""Encoder-decoder forward + helper-API parity vs the reference model classes."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder
from cxrmate_tpu.configs import EncoderDecoderConfig, LoraConfig
from cxrmate_tpu.models import encoder_decoder as ed
from tests.oracles import (
    build_reference_model,
    small_bert_cfg_dataclass,
    small_cvt_cfg_dataclass,
)


def _my_config(variant):
    return EncoderDecoderConfig(
        encoder=small_cvt_cfg_dataclass(projection_size=32),
        decoder=small_bert_cfg_dataclass(vocab_size=97, cross_dim=32),
        variant=variant,
        lora=LoraConfig() if variant == "longitudinal" else None,
        image_size=64,
    )


@pytest.fixture(scope="module", params=["single", "multi", "longitudinal"])
def models(request):
    variant = request.param
    ref = build_reference_model(variant, vocab_size=97)
    cfg = _my_config(variant)
    sd = ref.state_dict()
    variables = convert_encoder_decoder(sd, cfg.encoder, cfg.decoder)
    return variant, ref, cfg, variables


def test_forward_parity(models):
    variant, ref, cfg, variables = models
    rng = np.random.RandomState(0)
    b, l = 2, 9
    if variant == "single":
        pixels = rng.randn(b, 3, 64, 64).astype(np.float32)
    else:
        pixels = rng.randn(b, 3, 3, 64, 64).astype(np.float32)
        pixels[0, 2] = 0.0  # padded image slot
        pixels[1, 1, 0, 0, 0] = 0.0  # padding is detected via pixel [0,0,0] only
    ids = rng.randint(6, 97, size=(b, l)).astype(np.int64)
    mask = np.ones((b, l), dtype=np.int64)
    mask[0, -2:] = 0
    types = (rng.rand(b, l) > 0.5).astype(np.int64)
    kwargs = {}
    pos = None
    if variant == "longitudinal":
        pos = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
        kwargs["decoder_position_ids"] = torch.from_numpy(pos)
    with torch.no_grad():
        expected = ref(
            pixel_values=torch.from_numpy(pixels),
            decoder_input_ids=torch.from_numpy(ids),
            decoder_attention_mask=torch.from_numpy(mask),
            decoder_token_type_ids=torch.from_numpy(types),
            return_dict=True,
            **kwargs,
        ).logits.numpy()
    got, _ = ed.forward(
        variables, jnp.asarray(pixels), jnp.asarray(ids), cfg,
        decoder_attention_mask=jnp.asarray(mask),
        decoder_token_type_ids=jnp.asarray(types),
        decoder_position_ids=jnp.asarray(pos) if pos is not None else None,
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=5e-4, atol=5e-5)


def test_token_type_ids_parity(models):
    variant, ref, cfg, variables = models
    rng = np.random.RandomState(1)
    ids = rng.randint(6, 97, size=(4, 13)).astype(np.int64)
    ids[0, 4] = 50
    ids[0, 9] = 60
    ids[1, 0] = 50
    ids[2, 12] = 50  # boundary at final column → out of bounds, ignored
    specials = [50, 60, 70]
    sections = [0, 1, 0, 1]
    expected = ref.token_ids_to_token_type_ids(torch.from_numpy(ids), specials, sections).numpy()
    got = ed.token_ids_to_token_type_ids(jnp.asarray(ids), specials, sections)
    np.testing.assert_array_equal(np.asarray(got), expected)

    expected_past = ref.token_ids_to_token_type_ids_past(torch.from_numpy(ids), specials, sections).numpy()
    got_past = ed.token_ids_to_token_type_ids_past(jnp.asarray(ids), specials, sections)
    np.testing.assert_array_equal(np.asarray(got_past)[:, None], expected_past)

    # default sections
    expected_d = ref.token_ids_to_token_type_ids(torch.from_numpy(ids), [50, 60]).numpy()
    got_d = ed.token_ids_to_token_type_ids(jnp.asarray(ids), [50, 60])
    np.testing.assert_array_equal(np.asarray(got_d), expected_d)


def test_token_type_ids_parity_fuzz(models):
    """Random special-token placements at several densities/shapes — the
    first-occurrence boundary rule, the cols!=1 edge, and section cycling must
    match the reference everywhere, not just on hand-placed cases."""
    variant, ref, cfg, variables = models
    rng = np.random.RandomState(7)
    specials = [50, 60, 70]
    for trial in range(25):
        b = rng.randint(1, 6)
        l = rng.randint(2, 20)
        ids = rng.randint(6, 97, size=(b, l)).astype(np.int64)
        # sprinkle specials at random density (incl. duplicates / first & last col)
        n_sp = rng.randint(0, b * l // 2 + 1)
        for _ in range(n_sp):
            ids[rng.randint(b), rng.randint(l)] = specials[rng.randint(3)]
        sections = [0, 1, 0, 1] if trial % 2 else None
        args = (specials, sections) if sections else (specials,)
        expected = ref.token_ids_to_token_type_ids(torch.from_numpy(ids), *args).numpy()
        got = ed.token_ids_to_token_type_ids(jnp.asarray(ids), *args)
        np.testing.assert_array_equal(np.asarray(got), expected, err_msg=f"trial {trial}")
        expected_past = ref.token_ids_to_token_type_ids_past(
            torch.from_numpy(ids), *args).numpy()
        got_past = ed.token_ids_to_token_type_ids_past(jnp.asarray(ids), *args)
        np.testing.assert_array_equal(np.asarray(got_past)[:, None], expected_past,
                                      err_msg=f"trial {trial} (past)")


class _TokWrap:
    """Adapts our tokenizer to the HF PreTrainedTokenizerFast surface the reference
    helpers consume."""

    def __init__(self, path):
        self.hf = transformers.PreTrainedTokenizerFast(
            tokenizer_file=path,
            unk_token="[UNK]", pad_token="[PAD]", bos_token="[BOS]", cls_token="[BOS]",
            sep_token="[SEP]", eos_token="[EOS]", mask_token="[MASK]",
            additional_special_tokens=["[NPF]", "[NPI]", "[PMT]", "[PMT-SEP]"],
        )


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    import glob

    import pandas as pd

    from cxrmate_tpu.tokenizer import train_bpe

    paths = sorted(glob.glob("/root/reference/generated_reports/*/*.csv"))
    df = pd.read_csv(paths[0])
    texts = df["findings"].dropna().astype(str).tolist()[:300]
    mine = train_bpe(
        texts, vocab_size=600,
        additional_special_tokens=["[NPF]", "[NPI]", "[PMT]", "[PMT-SEP]"],
    )
    d = tmp_path_factory.mktemp("tok2")
    mine.save(str(d) + "/")
    hf = _TokWrap(str(d / "tokenizer.json")).hf
    return mine, hf, texts


def test_tokenize_report_teacher_forcing_parity(models, tok):
    variant, ref, cfg, variables = models
    mine, hf, texts = tok
    findings = texts[:3]
    impression = texts[3:6]
    expected = ref.tokenize_report_teacher_forcing(findings, impression, hf, 32)
    got = ed.tokenize_report_teacher_forcing(findings, impression, mine, 32)
    np.testing.assert_array_equal(got["decoder_input_ids"], expected["decoder_input_ids"].numpy())
    np.testing.assert_array_equal(got["label_ids"], expected["label_ids"].numpy())
    np.testing.assert_array_equal(got["decoder_attention_mask"], expected["decoder_attention_mask"].numpy())


def test_tokenize_prompt_parity(models, tok):
    variant, ref, cfg, variables = models
    if variant != "longitudinal":
        pytest.skip("prompt API is longitudinal-only")
    mine, hf, texts = tok
    prev_f = [texts[0], None, texts[2][:10]]
    prev_i = [None, texts[1], texts[3][:10]]
    for add_bos in (False, True):
        expected = ref.tokenize_prompt(prev_f, prev_i, hf, 24, add_bos_token_id=add_bos)
        got = ed.tokenize_prompt(prev_f, prev_i, mine, 24, add_bos_token_id=add_bos)
        np.testing.assert_array_equal(got["input_ids"], expected["input_ids"].numpy())
        np.testing.assert_array_equal(got["attention_mask"], expected["attention_mask"].numpy())


def test_tokenize_prompt_parity_edge(models, tok):
    """Adversarial previous-report rows: empty strings vs None, whitespace-only,
    truncation-boundary lengths (the BOS-forced-into-last-slot rule,
    modelling_longitudinal.py:504-509), and vocab-absent unicode."""
    variant, ref, cfg, variables = models
    if variant != "longitudinal":
        pytest.skip("prompt API is longitudinal-only")
    mine, hf, texts = tok
    long_text = " ".join(texts[:40])
    cases = [
        ([""], [""]),
        ([None], [""]),
        (["   "], ["\t"]),
        ([long_text], [long_text]),          # both sections truncated
        ([long_text], [None]),
        ([texts[0]], [long_text]),
        (["no肺change 🫁"], ["½cm ±0.5"]),   # bytes outside the trained vocab
        ([texts[0], None, "", long_text], [None, texts[1], long_text, ""]),
    ]
    for max_len in (8, 12, 24):
        for prev_f, prev_i in cases:
            for add_bos in (False, True):
                expected = ref.tokenize_prompt(prev_f, prev_i, hf, max_len,
                                               add_bos_token_id=add_bos)
                got = ed.tokenize_prompt(prev_f, prev_i, mine, max_len,
                                         add_bos_token_id=add_bos)
                msg = f"max_len={max_len} add_bos={add_bos} case={prev_f!r}/{prev_i!r}"
                np.testing.assert_array_equal(
                    got["input_ids"], expected["input_ids"].numpy(), err_msg=msg)
                np.testing.assert_array_equal(
                    got["attention_mask"], expected["attention_mask"].numpy(), err_msg=msg)


def test_tokenize_report_teacher_forcing_parity_edge(models, tok):
    """Truncation boundaries and empty sections in TF tokenization."""
    variant, ref, cfg, variables = models
    mine, hf, texts = tok
    long_text = " ".join(texts[:40])
    cases = [
        ([""], [""]),
        ([long_text], [long_text]),
        ([texts[0]], [""]),
        (["", long_text], [long_text, texts[1]]),
    ]
    for max_len in (4, 16, 32):
        for findings, impression in cases:
            expected = ref.tokenize_report_teacher_forcing(findings, impression, hf, max_len)
            got = ed.tokenize_report_teacher_forcing(findings, impression, mine, max_len)
            msg = f"max_len={max_len} case={findings!r}/{impression!r}"
            np.testing.assert_array_equal(
                got["decoder_input_ids"], expected["decoder_input_ids"].numpy(), err_msg=msg)
            np.testing.assert_array_equal(
                got["label_ids"], expected["label_ids"].numpy(), err_msg=msg)
            np.testing.assert_array_equal(
                got["decoder_attention_mask"],
                expected["decoder_attention_mask"].numpy(), err_msg=msg)


def test_split_and_decode_sections_parity_fuzz(models, tok):
    """Random id matrices (arbitrary special placements: repeated SEPs, EOS
    before SEP, missing sections, all-pad rows) — the per-row first-occurrence
    section splitting must match the reference exactly."""
    variant, ref, cfg, variables = models
    mine, hf, texts = tok
    rng = np.random.RandomState(11)
    sp = [mine.bos_token_id, mine.sep_token_id, mine.eos_token_id, mine.pad_token_id]
    for trial in range(20):
        b = rng.randint(1, 5)
        w = rng.randint(2, 18)
        arr = rng.randint(6, len(mine), size=(b, w)).astype(np.int64)
        n_sp = rng.randint(0, b * w)
        for _ in range(n_sp):
            arr[rng.randint(b), rng.randint(w)] = sp[rng.randint(len(sp))]
        if trial == 0:
            arr[0, :] = mine.pad_token_id
        specials = [mine.sep_token_id, mine.eos_token_id]
        expected = ref.split_and_decode_sections(torch.from_numpy(arr), specials, hf)
        got = ed.split_and_decode_sections(arr, specials, mine)
        assert got == tuple(expected), f"trial {trial}"


def test_split_and_decode_sections_parity(models, tok):
    variant, ref, cfg, variables = models
    mine, hf, texts = tok
    rng = np.random.RandomState(2)
    rows = []
    for i in range(4):
        ids = mine.encode(f"{mine.bos_token}{texts[i]}{mine.sep_token}{texts[i+1]}{mine.eos_token}")
        rows.append(ids)
    width = max(len(r) for r in rows)
    arr = np.full((len(rows), width), mine.pad_token_id, dtype=np.int64)
    for r, ids in enumerate(rows):
        arr[r, : len(ids)] = ids
    arr[2, 5:] = mine.pad_token_id  # truncated row: no SEP/EOS present
    specials = [mine.sep_token_id, mine.eos_token_id]
    expected = ref.split_and_decode_sections(torch.from_numpy(arr), specials, hf)
    got = ed.split_and_decode_sections(arr, specials, mine)
    assert got == tuple(expected)
