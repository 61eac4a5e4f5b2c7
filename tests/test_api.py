"""High-level API test: ingest a saved HF checkpoint directory end-to-end."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cxrmate_tpu.models.api import CXRMate
from cxrmate_tpu.tokenizer import train_bpe
from tests.oracles import build_reference_model

TEXTS = [
    "the heart is normal", "no acute process", "small left pleural effusion",
    "stable cardiomegaly", "lungs are clear",
]


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hub") / "cxrmate-multi-tf"
    model = build_reference_model("multi", vocab_size=97)
    model.save_pretrained(str(d))
    tok = train_bpe(
        TEXTS, vocab_size=97,
        additional_special_tokens=["[NPF]", "[NPI]", "[PMT]", "[PMT-SEP]"],
    )
    # vocab may come out below 97; the test model vocab is 97 — pad the tokenizer
    # vocab deterministically so ids stay in range
    i = 0
    while len(tok.vocab) < 97:
        tok.vocab.setdefault(f"<filler{i}>", len(tok.vocab))
        i += 1
    tok.id_to_token = {v: k for k, v in tok.vocab.items()}
    tok.save(str(d) + os.sep)
    return str(d), model


def test_from_hf_checkpoint_and_generate(hf_dir, monkeypatch):
    path, ref_model = hf_dir
    import cxrmate_tpu.models.api as api
    import cxrmate_tpu.configs as cfgs
    from tests.oracles import small_cvt_cfg_dataclass, small_bert_cfg_dataclass

    # the saved test checkpoint is the small config, not CvT-21; patch the presets
    monkeypatch.setattr(
        cfgs, "multi_tf_config",
        lambda vocab_size=97: cfgs.EncoderDecoderConfig(
            encoder=small_cvt_cfg_dataclass(projection_size=32),
            decoder=small_bert_cfg_dataclass(vocab_size=vocab_size, cross_dim=32),
            variant="multi", image_size=64,
        ),
    )
    monkeypatch.setattr(api.model_configs, "multi_tf_config", cfgs.multi_tf_config)
    model = CXRMate.from_hf_checkpoint(path, variant="multi")
    assert len(model.tokenizer) == 97

    pixels = np.random.RandomState(0).randn(2, 2, 3, 64, 64).astype(np.float32)
    pixels[1, 1] = 0.0
    findings, impression = model.generate_report(pixels, num_beams=2, max_new_tokens=8)
    assert len(findings) == 2 and len(impression) == 2
    assert all(isinstance(f, str) for f in findings)

    # converted params equal the direct converter output
    from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder

    direct = convert_encoder_decoder(
        ref_model.state_dict(), model.config.encoder, model.config.decoder
    )
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(direct["params"]),
        jax.tree_util.tree_leaves(model.variables["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_export_roundtrip(hf_dir):
    """our params → torch-layout state dict → converted back == identity."""
    import jax
    from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder, export_encoder_decoder
    from tests.oracles import small_bert_cfg_dataclass, small_cvt_cfg_dataclass

    path, ref_model = hf_dir
    enc_cfg = small_cvt_cfg_dataclass(projection_size=32)
    dec_cfg = small_bert_cfg_dataclass(vocab_size=97, cross_dim=32)
    variables = convert_encoder_decoder(ref_model.state_dict(), enc_cfg, dec_cfg)
    exported = export_encoder_decoder(variables, enc_cfg, dec_cfg)
    back = convert_encoder_decoder(exported, enc_cfg, dec_cfg)
    for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the exported dict round-trips through the reference model itself
    import torch as _torch

    ref_model.load_state_dict({k: _torch.from_numpy(np.array(v)) for k, v in exported.items()})
