"""Parity tests for the CXR-BERT reward, CheXbert labeler, and WordPiece tokenizer."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cxrmate_tpu.configs import BertDecoderConfig
from cxrmate_tpu.tokenizer.wordpiece import WordPieceTokenizer

VOCAB_WORDS = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the heart is normal no acute lungs are clear "
    "pleural effusion seen stable un ##change ##d card ##iome ##gal ##y small "
    "left right lower lobe a b c , . pneumonia edema without evidence of"
).split()


@pytest.fixture(scope="module")
def wp_vocab(tmp_path_factory):
    d = tmp_path_factory.mktemp("wp")
    path = d / "vocab.txt"
    path.write_text("\n".join(VOCAB_WORDS) + "\n")
    return str(path)


def test_wordpiece_parity_vs_hf(wp_vocab):
    hf = transformers.BertTokenizer(wp_vocab, do_lower_case=True)
    ours = WordPieceTokenizer.from_file(wp_vocab)
    texts = [
        "The heart is normal.",
        "Unchanged small left pleural effusion, no edema.",
        "CARDIOMEGALY is stable without evidence of pneumonia",
        "weird-token xyzzy",
        "a  b\tc",
    ]
    for t in texts:
        assert ours.tokenize(t) == hf.tokenize(t), t
        assert ours.encode(t) == hf(t)["input_ids"], t
    batch_hf = hf(texts, padding="longest", truncation=True, max_length=12, return_tensors="np")
    batch_ours = ours(texts, padding="longest", truncation=True, max_length=12)
    np.testing.assert_array_equal(batch_ours["input_ids"], batch_hf["input_ids"])
    np.testing.assert_array_equal(batch_ours["attention_mask"], batch_hf["attention_mask"])


def test_wordpiece_parity_vs_hf_fuzz(wp_vocab):
    """Random adversarial strings vs HF BertTokenizer: accent stripping, CJK
    spacing, control/format chars (dropped), punctuation splitting, whitespace
    runs, and the >100-char-word → [UNK] rule."""
    import random

    hf = transformers.BertTokenizer(wp_vocab, do_lower_case=True)
    ours = WordPieceTokenizer.from_file(wp_vocab)
    rng = random.Random(3)
    pools = [
        lambda: rng.choice("abcthenorml "),
        lambda: chr(rng.randrange(0xC0, 0x17F)),         # accented latin
        lambda: chr(rng.randrange(0x4E00, 0x4E80)),      # CJK
        lambda: rng.choice(",.;:!?()[]-_/\\\"'"),
        lambda: rng.choice(" \t\n\r  "),
        lambda: chr(rng.randrange(0x00, 0x20)),          # control
        lambda: "‍",                                # zero-width joiner (Cf)
        lambda: "�",
    ]
    cases = ["x" * 120, "the " + "y" * 101 + " heart", "NÓ acute", "ＡＢＣ"]
    for _ in range(150):
        n = rng.randrange(1, 50)
        cases.append("".join(rng.choice(pools)() for _ in range(n)))
    for t in cases:
        assert ours.tokenize(t) == hf.tokenize(t), repr(t)
        assert ours.encode(t) == hf(t)["input_ids"], repr(t)


def _small_bert_pair(seed=0, vocab=40):
    torch.manual_seed(seed)
    hf_cfg = transformers.BertConfig(
        vocab_size=vocab, hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, max_position_embeddings=64, type_vocab_size=2, pad_token_id=0,
    )
    hf_cfg._attn_implementation = "eager"
    model = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = BertDecoderConfig(
        vocab_size=vocab, hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, max_position_embeddings=64, type_vocab_size=2,
        pad_token_id=0, add_cross_attention=False,
    )
    return model, cfg


def test_bert_encoder_parity():
    from cxrmate_tpu.ckpt.hf_convert import convert_bert_decoder
    from cxrmate_tpu.models.bert_encoder import bert_encoder_forward
    from cxrmate_tpu.reward.cxrbert import _fake_lm_head

    model, cfg = _small_bert_pair()
    sd = {f"bert.{k}": v for k, v in model.state_dict().items()}
    params = convert_bert_decoder({**sd, **_fake_lm_head(sd, cfg)}, cfg)
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 40, size=(2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[0, -2:] = 0
    with torch.no_grad():
        expected = model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    got = bert_encoder_forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


def test_cxrbert_reward_parity(wp_vocab):
    """Cosine reward equals a torch replica of tools/rewards/cxrbert.py."""
    from cxrmate_tpu.reward.cxrbert import CXRBERTReward, convert_cxrbert

    model, cfg = _small_bert_pair(seed=3, vocab=len(VOCAB_WORDS))
    torch.manual_seed(4)
    proj = torch.nn.Linear(24, 16, bias=False)
    sd = {f"bert.{k}": v for k, v in model.state_dict().items()}
    sd["cls_projection_head.weight"] = proj.weight
    params = convert_cxrbert(sd, cfg)
    ours_tok = WordPieceTokenizer.from_file(wp_vocab)
    hf_tok = transformers.BertTokenizer(wp_vocab, do_lower_case=True)

    predictions = ["the heart is normal no acute", "stable small left pleural effusion"]
    labels = [["the heart is normal"], ["no pleural effusion seen"]]

    def torch_embed(texts):
        tok = hf_tok(texts, padding="longest", truncation=True, max_length=64, return_tensors="pt")
        with torch.no_grad():
            h = model(input_ids=tok["input_ids"], attention_mask=tok["attention_mask"]).last_hidden_state
            return proj(h[:, 0, :])

    expected = torch.nn.functional.cosine_similarity(
        torch_embed(predictions), torch_embed([l[0] for l in labels])
    ).numpy()

    reward = CXRBERTReward(params, cfg, ours_tok)
    got = reward(predictions, labels)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_chexbert_labeler_parity(wp_vocab):
    """Labeler predictions equal a torch replica of tools/chexbert.py."""
    from cxrmate_tpu.eval.chexbert import chexbert_predict, convert_chexbert

    torch.manual_seed(5)
    vocab = len(VOCAB_WORDS)
    hf_cfg = transformers.BertConfig(
        vocab_size=vocab, hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, max_position_embeddings=64, type_vocab_size=2, pad_token_id=0,
    )
    hf_cfg._attn_implementation = "eager"
    bert = transformers.BertModel(hf_cfg).eval()
    heads = [torch.nn.Linear(24, 4) for _ in range(13)] + [torch.nn.Linear(24, 2)]
    sd = {f"module.bert.{k}": v for k, v in bert.state_dict().items()}
    for i, h in enumerate(heads):
        sd[f"module.linear_heads.{i}.weight"] = h.weight
        sd[f"module.linear_heads.{i}.bias"] = h.bias

    cfg = BertDecoderConfig(
        vocab_size=vocab, hidden_size=24, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, max_position_embeddings=64, type_vocab_size=2,
        pad_token_id=0, add_cross_attention=False,
    )
    params = convert_chexbert(sd, cfg)
    hf_tok = transformers.BertTokenizer(wp_vocab, do_lower_case=True)
    ours_tok = WordPieceTokenizer.from_file(wp_vocab)

    reports = ["The heart is normal.", "stable small pleural effusion without edema"]
    with torch.no_grad():
        tok = hf_tok([r.strip() for r in reports], padding="longest", return_tensors="pt",
                     truncation=True, max_length=64)
        h = bert(**tok).last_hidden_state[:, 0, :]
        expected = torch.stack([head(h).argmax(dim=1) for head in heads], dim=1).numpy()
    got = chexbert_predict(params, cfg, ours_tok, reports, max_length=64)
    np.testing.assert_array_equal(got, expected)


def test_cxrbert_reward_length_bucket_is_exact(wp_vocab):
    """The reward's length bucketing (CXRBERTReward.length_bucket — pads the
    tokenised batch up to a multiple of the bucket so SCST's per-step reward
    calls compile a bounded number of BERT-forward shapes) is exact: padded
    keys carry attention_mask 0, so padding_additive_mask drives their softmax
    weights to exactly 0.0f and the CLS embedding is unchanged up to f32
    reduction-order ulps."""
    from cxrmate_tpu.reward.cxrbert import CXRBERTReward, convert_cxrbert

    model, cfg = _small_bert_pair(seed=9, vocab=len(VOCAB_WORDS))
    torch.manual_seed(10)
    proj = torch.nn.Linear(24, 16, bias=False)
    sd = {f"bert.{k}": v for k, v in model.state_dict().items()}
    sd["cls_projection_head.weight"] = proj.weight
    params = convert_cxrbert(sd, cfg)
    tok = WordPieceTokenizer.from_file(wp_vocab)

    predictions = ["the heart is normal no acute", "effusion"]
    labels = [["the heart is normal"], ["no pleural effusion seen"]]
    exact = CXRBERTReward(params, cfg, tok, length_bucket=0)(predictions, labels)
    for bucket in (8, 32):
        reward = CXRBERTReward(params, cfg, tok, length_bucket=bucket)
        # the padded widths really are bucket multiples (capped at max_pos)
        ids, mask = reward._tokenize(predictions, cfg.max_position_embeddings)
        assert ids.shape == mask.shape and ids.shape[1] % bucket == 0
        np.testing.assert_allclose(
            reward(predictions, labels), exact, rtol=1e-6, atol=1e-6
        )
