"""Hub-export roundtrip: our pytrees → torch state dict → the REFERENCE torch
class → identical logits (closing SURVEY L0: the `*_model_to_hub.ipynb` flow,
`/root/reference/modules/transformers/multi_tf_model_to_hub.ipynb:57`).

Model A (reference, random) → convert → our variables → export → load into a
fresh reference model B. A lossless roundtrip makes A and B bit-identical, so
their logits must be exactly equal."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder, export_encoder_decoder
from tests.oracles import (
    build_reference_model,
    small_bert_cfg_dataclass,
    small_cvt_cfg_dataclass,
)


@pytest.mark.parametrize("variant", ["single", "multi", "longitudinal"])
def test_export_roundtrip_into_reference_class(variant):
    ref_a = build_reference_model(variant, vocab_size=97, seed=0)
    enc_cfg = small_cvt_cfg_dataclass(projection_size=32)
    dec_cfg = small_bert_cfg_dataclass(vocab_size=97, cross_dim=32)
    variables = convert_encoder_decoder(ref_a.state_dict(), enc_cfg, dec_cfg)
    exported = export_encoder_decoder(variables, enc_cfg, dec_cfg)

    ref_b = build_reference_model(variant, vocab_size=97, seed=1)  # different init
    missing, unexpected = ref_b.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()},
        strict=False,
    )
    # every exported tensor must land somewhere in the reference class
    assert not unexpected, unexpected
    # the only tolerable missing keys are non-parameter buffers/aliases
    # (position_ids buffer, tied-weight aliases); no *.weight/*.bias of real layers
    real_missing = [
        k for k in missing
        if "position_ids" not in k
        and not k.endswith(("cls.predictions.decoder.weight", "cls.predictions.decoder.bias"))
        and "num_batches_tracked" not in k
    ]
    assert not real_missing, real_missing

    # bit-identical params ⇒ exactly equal logits through the reference forward
    rng = np.random.RandomState(0)
    b, l = 2, 7
    if variant == "single":
        pixels = rng.randn(b, 3, 64, 64).astype(np.float32)
    else:
        pixels = rng.randn(b, 2, 3, 64, 64).astype(np.float32)
    ids = rng.randint(6, 97, size=(b, l)).astype(np.int64)
    mask = np.ones((b, l), dtype=np.int64)
    types = np.zeros((b, l), dtype=np.int64)
    kwargs = dict(
        pixel_values=torch.from_numpy(pixels),
        decoder_input_ids=torch.from_numpy(ids),
        decoder_attention_mask=torch.from_numpy(mask),
        decoder_token_type_ids=torch.from_numpy(types),
        return_dict=True,
    )
    with torch.no_grad():
        la = ref_a(**kwargs).logits.numpy()
        lb = ref_b(**kwargs).logits.numpy()
    np.testing.assert_array_equal(la, lb)


def test_export_tensor_roundtrip_multi():
    """sd → variables → sd is value-exact for every parameter tensor."""
    ref = build_reference_model("multi", vocab_size=97, seed=0)
    enc_cfg = small_cvt_cfg_dataclass(projection_size=32)
    dec_cfg = small_bert_cfg_dataclass(vocab_size=97, cross_dim=32)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_encoder_decoder(ref.state_dict(), enc_cfg, dec_cfg)
    exported = export_encoder_decoder(variables, enc_cfg, dec_cfg)
    for k, v in exported.items():
        assert k in sd, f"exported key {k} not in reference state dict"
        np.testing.assert_array_equal(v, sd[k], err_msg=k)
