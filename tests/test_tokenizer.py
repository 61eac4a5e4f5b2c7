"""Tokenizer parity tests vs HF `tokenizers` (the library the reference uses).

The corpus is the reference's frozen generated reports (real MIMIC-CXR-style text),
so byte-level edge cases (numbers, punctuation, unicode) are exercised.
"""

import glob
import json
import os

import pandas as pd
import pytest

from cxrmate_tpu.tokenizer import ByteLevelBPETokenizer, train_bpe

REFERENCE = "/root/reference"


def _corpus(limit=400):
    paths = sorted(glob.glob(os.path.join(REFERENCE, "generated_reports", "*", "*.csv")))
    texts = []
    for p in paths[:2]:
        df = pd.read_csv(p)
        for col in ("findings", "impression"):
            if col in df:
                texts += df[col].dropna().astype(str).tolist()
    assert texts, "no corpus found"
    return texts[:limit]


@pytest.fixture(scope="module")
def hf_trained(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    corpus = _corpus()
    tok = tokenizers.Tokenizer(tokenizers.models.BPE())
    tok.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = tokenizers.trainers.BpeTrainer(
        vocab_size=800, special_tokens=["[UNK]", "[BOS]", "[EOS]", "[SEP]", "[PAD]", "[MASK]"]
    )
    tok.train_from_iterator(corpus, trainer)
    tok.decoder = tokenizers.decoders.ByteLevel()
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return tok, str(path), corpus


def test_trainer_matches_hf(hf_trained):
    hf_tok, _, corpus = hf_trained
    ours = train_bpe(corpus, vocab_size=800)
    hf_vocab = hf_tok.get_vocab()
    assert ours.vocab == hf_vocab


def test_encode_decode_parity(hf_trained):
    hf_tok, path, corpus = hf_trained
    ours = ByteLevelBPETokenizer.from_file(path)
    for text in corpus[:200]:
        expected = hf_tok.encode(text, add_special_tokens=False).ids
        got = ours.encode(text)
        assert got == expected, text
        assert ours.decode(got) == hf_tok.decode(expected)


def test_encode_decode_parity_fuzz(hf_trained):
    """Byte-parity on adversarial random strings (arbitrary unicode, emoji,
    control chars, mixed whitespace, lone surrogate-adjacent codepoints) —
    inputs far outside the training corpus still encode/decode identically to
    HF `tokenizers` (every byte maps into the ByteLevel alphabet)."""
    import random

    hf_tok, path, _ = hf_trained
    ours = ByteLevelBPETokenizer.from_file(path)
    rng = random.Random(0)
    pools = [
        lambda: chr(rng.randrange(0x20, 0x7F)),          # ascii
        lambda: chr(rng.randrange(0xA0, 0x2FF)),         # latin ext / IPA
        lambda: chr(rng.randrange(0x4E00, 0x9FFF)),      # CJK
        lambda: chr(rng.randrange(0x1F300, 0x1F64F)),    # emoji
        lambda: rng.choice(" \t\n\r\x0b\x0c"),           # whitespace
        lambda: chr(rng.randrange(0x00, 0x20)),          # control
    ]
    cases = ["", " ", "  leading", "trailing  ", "\n\n", "½cm ±0.5 µg/mL",
             "Ω≈ç√∫˜µ≤≥÷", "🫁 opacity noted"]
    for _ in range(200):
        n = rng.randrange(1, 60)
        cases.append("".join(rng.choice(pools)() for _ in range(n)))
    for text in cases:
        expected = hf_tok.encode(text, add_special_tokens=False).ids
        got = ours.encode(text)
        assert got == expected, repr(text)
        assert ours.decode(got) == hf_tok.decode(expected), repr(text)


def test_model_unk_token_modes(hf_trained, tmp_path):
    """model.unk_token=null (the reference recipe, tokenizers.models.BPE())
    drops unknown byte symbols BEFORE merging; a file with model.unk_token set
    maps them to that token instead — both matching HF `tokenizers`."""
    tokenizers = pytest.importorskip("tokenizers")
    _, path, _ = hf_trained

    ours = ByteLevelBPETokenizer.from_file(path)
    assert ours.unk_token is None  # HF-saved file: model unk is null
    assert ours.encode("\n\n") == []  # dropped, not [UNK]

    # same vocab/merges, model unk set → unknowns become [UNK]; HF agrees
    with open(path) as f:
        data = json.load(f)
    data["model"]["unk_token"] = "[UNK]"
    unk_path = tmp_path / "tokenizer.json"
    with open(unk_path, "w") as f:
        json.dump(data, f, ensure_ascii=False)
    with_unk = ByteLevelBPETokenizer.from_file(str(unk_path))
    assert with_unk.unk_token == "[UNK]"
    hf_unk = tokenizers.Tokenizer.from_file(str(unk_path))
    for text in ("\n\n", "no肺change.", "½cm"):
        expected = hf_unk.encode(text, add_special_tokens=False).ids
        assert with_unk.encode(text) == expected, repr(text)
        assert with_unk.unk_token_id in with_unk.encode("\n")

    # save round-trip preserves the unk mode
    ours.save(str(tmp_path / "null_unk") + os.sep)
    with open(tmp_path / "null_unk" / "tokenizer.json") as f:
        assert json.load(f)["model"]["unk_token"] is None


def test_specials_and_prompt_format(hf_trained):
    _, path, _ = hf_trained
    with open(path) as f:
        data = json.load(f)
    # add the bpe_prompt additional specials the way the reference tokenizer has them
    for extra in ("[NPF]", "[NPI]", "[PMT]", "[PMT-SEP]"):
        nid = len(data["model"]["vocab"]) + len(
            [t for t in data["added_tokens"] if t["content"] not in data["model"]["vocab"]]
        )
        data["added_tokens"].append({"id": nid, "content": extra, "special": True})
        data["model"]["vocab"][extra] = nid
    path2 = path + ".prompt.json"
    with open(path2, "w") as f:
        json.dump(data, f)
    ours = ByteLevelBPETokenizer.from_file(path2)
    assert ours.additional_special_tokens == ["[NPF]", "[NPI]", "[PMT]", "[PMT-SEP]"]
    text = "[PMT]no change[PMT-SEP]clear lungs[BOS]"
    ids = ours.encode(text)
    pmt = ours.vocab["[PMT]"]
    pmt_sep = ours.vocab["[PMT-SEP]"]
    assert ids[0] == pmt and pmt_sep in ids and ids[-1] == ours.bos_token_id
    # specials must be skipped by decode(skip_special_tokens=True)
    assert "[PMT]" not in ours.decode(ids)
    assert ours.decode(ids, skip_special_tokens=False).startswith("[PMT]")


def test_batch_call_padding(hf_trained):
    _, path, corpus = hf_trained
    ours = ByteLevelBPETokenizer.from_file(path)
    out = ours(corpus[:4], padding="longest", truncation=True, max_length=32)
    assert out["input_ids"].shape == out["attention_mask"].shape
    assert out["input_ids"].shape[1] <= 32
    row0 = out["input_ids"][0]
    m0 = out["attention_mask"][0]
    assert (row0[m0 == 0] == ours.pad_token_id).all()


def test_roundtrip_save_load(hf_trained, tmp_path):
    _, path, corpus = hf_trained
    ours = ByteLevelBPETokenizer.from_file(path)
    ours.save(str(tmp_path) + os.sep)
    again = ByteLevelBPETokenizer.from_file(str(tmp_path))
    for t in corpus[:20]:
        assert ours.encode(t) == again.encode(t)
