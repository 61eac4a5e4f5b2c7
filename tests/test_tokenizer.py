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
