"""Training-gradient parity vs torch autograd through the reference model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder
from cxrmate_tpu.configs import EncoderDecoderConfig
from cxrmate_tpu.models import encoder_decoder as ed
from cxrmate_tpu.train.tf_trainer import cross_entropy_ignore_pad
from tests.oracles import (
    build_reference_model,
    small_bert_cfg_dataclass,
    small_cvt_cfg_dataclass,
)


def test_tf_gradients_match_torch():
    """∂loss/∂θ of the teacher-forcing step equals torch autograd (eval-mode BN,
    no dropout) for representative parameters across encoder and decoder."""
    ref = build_reference_model("multi", vocab_size=97, seed=21)
    cfg = EncoderDecoderConfig(
        encoder=small_cvt_cfg_dataclass(projection_size=32),
        decoder=small_bert_cfg_dataclass(vocab_size=97, cross_dim=32),
        variant="multi",
        image_size=64,
    )
    variables = convert_encoder_decoder(ref.state_dict(), cfg.encoder, cfg.decoder)
    rng = np.random.RandomState(7)
    b, l = 2, 8
    pixels = rng.randn(b, 2, 3, 64, 64).astype(np.float32)
    ids = rng.randint(6, 97, size=(b, l)).astype(np.int64)
    mask = np.ones((b, l), dtype=np.int64)
    types = np.zeros((b, l), dtype=np.int64)
    labels = rng.randint(6, 97, size=(b, l)).astype(np.int64)
    labels[0, -2:] = 4  # pad-ignored positions

    # torch side: train() would enable dropout; zero the dropout probs instead and
    # keep BN in eval mode to compare deterministic gradients
    ref_train = ref
    ref_train.train()
    for m in ref_train.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()
    out = ref_train(
        pixel_values=torch.from_numpy(pixels),
        decoder_input_ids=torch.from_numpy(ids),
        decoder_attention_mask=torch.from_numpy(mask),
        decoder_token_type_ids=torch.from_numpy(types),
        return_dict=True,
    )
    loss_t = torch.nn.functional.cross_entropy(
        out.logits.permute(0, 2, 1), torch.from_numpy(labels), ignore_index=4
    )
    loss_t.backward()
    named = dict(ref_train.named_parameters())

    def loss_fn(params):
        logits, _ = ed.forward(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(pixels), jnp.asarray(ids), cfg,
            decoder_attention_mask=jnp.asarray(mask),
            decoder_token_type_ids=jnp.asarray(types),
            train=False,  # deterministic: BN eval + no dropout, matching the torch setup
        )
        return cross_entropy_ignore_pad(logits, jnp.asarray(labels), 4)

    loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert abs(float(loss_j) - float(loss_t)) < 2e-5

    checks = [
        # (our grad leaf, torch param name, transpose)
        (grads["decoder"]["embeddings"]["word"], "decoder.bert.embeddings.word_embeddings.weight", False),
        (grads["decoder"]["layers"][0]["self"]["q"]["w"], "decoder.bert.encoder.layer.0.attention.self.query.weight", True),
        (grads["decoder"]["layers"][1]["cross"]["k"]["w"], "decoder.bert.encoder.layer.1.crossattention.self.key.weight", True),
        (grads["decoder"]["lm_head"]["decoder"]["b"], "decoder.cls.predictions.bias", False),
        (grads["encoder"]["projection_head"]["proj"]["w"], "encoder.projection_head.projection.weight", True),
        (grads["encoder"]["stages"][2]["layers"][0]["mlp"]["fc1"]["w"], "encoder.cvt.encoder.stages.2.layers.0.intermediate.dense.weight", True),
        (grads["encoder"]["stages"][0]["embed"]["ln"]["scale"], "encoder.cvt.encoder.stages.0.embedding.convolution_embeddings.normalization.weight", False),
    ]
    for ours, name, transpose in checks:
        expected = named[name].grad.numpy()
        got = np.asarray(ours)
        if transpose:
            got = got.T
        np.testing.assert_allclose(got, expected, rtol=5e-3, atol=1e-5, err_msg=name)
