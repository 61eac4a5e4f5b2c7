"""BERTScore parity vs a torch replica of the published algorithm."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from cxrmate_tpu.eval.bertscore import BERTScorer
from cxrmate_tpu.tokenizer.wordpiece import WordPieceTokenizer
from tests.test_reward_chexbert import VOCAB_WORDS, wp_vocab  # noqa: F401 fixture reuse


def test_bertscore_matches_torch_replica(wp_vocab):  # noqa: F811
    from cxrmate_tpu.ckpt.hf_convert import convert_bert_decoder
    from cxrmate_tpu.configs import BertDecoderConfig
    from cxrmate_tpu.reward.cxrbert import _fake_lm_head

    torch.manual_seed(11)
    vocab = len(VOCAB_WORDS)
    hf_cfg = transformers.BertConfig(
        vocab_size=vocab, hidden_size=24, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=48, max_position_embeddings=64, type_vocab_size=2, pad_token_id=0,
    )
    hf_cfg._attn_implementation = "eager"
    model = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = BertDecoderConfig(
        vocab_size=vocab, hidden_size=24, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=48, max_position_embeddings=64, type_vocab_size=2,
        pad_token_id=0, add_cross_attention=False,
    )
    sd = {f"bert.{k}": v for k, v in model.state_dict().items()}
    params = convert_bert_decoder({**sd, **_fake_lm_head(sd, cfg)}, cfg)
    hf_tok = transformers.BertTokenizer(wp_vocab, do_lower_case=True)
    ours_tok = WordPieceTokenizer.from_file(wp_vocab)

    num_layers = 2  # intermediate layer, like roberta-large L17
    preds = ["the heart is normal", "small left pleural effusion without edema"]
    refs = ["heart is normal no acute", "stable small effusion"]

    def torch_embed(texts):
        tok = hf_tok(texts, padding="longest", return_tensors="pt")
        with torch.no_grad():
            out = model(**{k: v for k, v in tok.items() if k != "token_type_ids"},
                        output_hidden_states=True)
        return out.hidden_states[num_layers], tok["attention_mask"]

    ch, cm = torch_embed(preds)
    rh, rm = torch_embed(refs)

    def norm(x):
        return torch.nn.functional.normalize(x, dim=-1)

    expected_f1 = []
    for i in range(2):
        c = norm(ch[i][cm[i].bool()][1:-1])
        r = norm(rh[i][rm[i].bool()][1:-1])
        sim = c @ r.T
        p = sim.max(dim=1)[0].mean().item()
        rr = sim.max(dim=0)[0].mean().item()
        expected_f1.append(2 * p * rr / (p + rr))

    scorer = BERTScorer(params, cfg, ours_tok, num_layers=num_layers)
    out = scorer.score(preds, refs)
    np.testing.assert_allclose(out["f1"], expected_f1, rtol=1e-4, atol=1e-5)
    assert (out["f1"] <= 1.0 + 1e-6).all()
