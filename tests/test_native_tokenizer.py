"""Native (C++) BPE encoder parity vs the pure-Python path and HF `tokenizers`."""

import glob
import os

import pandas as pd
import pytest

from cxrmate_tpu.tokenizer import ByteLevelBPETokenizer, train_bpe
from cxrmate_tpu.tokenizer.native_binding import attach


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    paths = sorted(glob.glob("/root/reference/generated_reports/*/*.csv"))
    df = pd.read_csv(paths[0])
    texts = (
        df["findings"].dropna().astype(str).tolist()
        + df["impression"].dropna().astype(str).tolist()
    )[:500]
    tok = train_bpe(
        texts, vocab_size=700,
        additional_special_tokens=["[NPF]", "[NPI]", "[PMT]", "[PMT-SEP]"],
    )
    return tok, texts


def test_native_matches_python(trained):
    tok, texts = trained
    native = attach(tok)
    if native is None:
        pytest.skip("native build unavailable")
    hard_cases = [
        "",
        "no change.",
        "[PMT]prior[PMT-SEP]none[BOS]",
        "multi  spaces   and\ttabs\nnewlines",
        "unicode: naïve café — 37.5°C ±2",
        "numbers 12345 and mixed a1b2",
        "trailing space ",
        " leading",
        "it's we're can't I'll you've he'd I'm",
        "emoji 🙂 bytes",
        "\n\n",
        "a b",  # non-breaking space
        # bytes absent from the trained vocab are dropped BEFORE merging
        # (model unk null, HF semantics) — neighbours may merge across them
        "no肺change.",
        "pleural🫁effusion",
        "心心心心心",
    ]
    import random

    rng = random.Random(5)
    pools = [
        lambda: chr(rng.randrange(0x20, 0x7F)),
        lambda: chr(rng.randrange(0xA0, 0x2FF)),
        lambda: chr(rng.randrange(0x4E00, 0x9FFF)),
        lambda: chr(rng.randrange(0x1F300, 0x1F64F)),
        lambda: rng.choice(" \t\n\r\x0b\x0c"),
        lambda: chr(rng.randrange(0x00, 0x20)),
    ]
    fuzz = ["".join(rng.choice(pools)() for _ in range(rng.randrange(1, 60)))
            for _ in range(100)]
    for text in list(texts[:300]) + hard_cases + fuzz:
        expected = tok._encode_py(text)
        got = native.encode(text)
        assert got == expected, repr(text)


def test_native_matches_hf(trained, tmp_path):
    tokenizers = pytest.importorskip("tokenizers")
    tok, texts = trained
    native = attach(tok)
    if native is None:
        pytest.skip("native build unavailable")
    tok.save(str(tmp_path) + os.sep)
    hf = tokenizers.Tokenizer.from_file(str(tmp_path / "tokenizer.json"))
    for text in texts[:200]:
        assert native.encode(text) == hf.encode(text, add_special_tokens=False).ids, repr(text)


def test_native_speedup(trained):
    import time

    tok, texts = trained
    native = attach(tok)
    if native is None:
        pytest.skip("native build unavailable")
    corpus = (texts * 5)[:1500]
    t0 = time.perf_counter()
    for t in corpus:
        tok._encode_py(t)
    py_dt = time.perf_counter() - t0
    # fresh engine so the memo doesn't carry over from the parity test
    t0 = time.perf_counter()
    for t in corpus:
        native.encode(t)
    nat_dt = time.perf_counter() - t0
    assert nat_dt < py_dt, (nat_dt, py_dt)


def test_malformed_merge_output_drops_in_both_paths():
    """A merge whose concatenation is missing from the vocab (malformed
    tokenizer.json, model unk null): both the Python and native encoders drop
    the orphaned symbol instead of crashing (the Python path used to raise
    KeyError where the native engine dropped)."""
    specials = ["[UNK]", "[BOS]", "[EOS]", "[SEP]", "[PAD]", "[MASK]"]
    vocab = {t: i for i, t in enumerate(specials)}
    for ch in "abc":
        vocab[ch] = len(vocab)
    tok = ByteLevelBPETokenizer(vocab, [("a", "b")], unk_token=None)  # "ab" not in vocab
    assert tok._encode_py("abc") == [vocab["c"]]
    assert tok._encode_py("ab") == []
    native = attach(tok)
    if native is None:
        pytest.skip("native build unavailable")
    for text in ("abc", "ab", "cab", "aabbc"):
        assert native.encode(text) == tok._encode_py(text), repr(text)
