"""Load the reference's HF model classes (read-only) as parity oracles.

The reference at /root/reference is the behavioural spec; importing its modelling
files in tests gives us the exact torch behaviour (including HF generate glue) to
assert token/logit parity against. Nothing is copied into the framework."""

import importlib.util
import sys

import torch
import transformers

REF = "/root/reference/modules/transformers"


def _load(name, path):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def reference_single():
    return _load("ref_modelling_single", f"{REF}/single_model/modelling_single.py")


def reference_multi():
    return _load("ref_modelling_multi", f"{REF}/multi_model/modelling_multi.py")


def reference_longitudinal():
    return _load("ref_modelling_longitudinal", f"{REF}/longitudinal_model/modelling_longitudinal.py")


def small_bert_config(vocab_size=97, cross_dim=64):
    cfg = transformers.BertConfig(
        vocab_size=vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=96,
        type_vocab_size=2,
        pad_token_id=4,
    )
    cfg.is_decoder = True
    cfg.add_cross_attention = True
    cfg.cross_attention_hidden_size = None
    return cfg


def small_cvt_hf_config(mod, projection_size=32):
    return mod.CvtWithProjectionHeadConfig(
        num_channels=3,
        patch_sizes=[7, 3, 3],
        patch_stride=[4, 2, 2],
        patch_padding=[2, 1, 1],
        embed_dim=[16, 24, 40],
        num_heads=[1, 2, 4],
        depth=[1, 2, 3],
        mlp_ratio=[4.0, 4.0, 4.0],
        attention_drop_rate=[0.0, 0.0, 0.0],
        drop_rate=[0.0, 0.0, 0.0],
        drop_path_rate=[0.0, 0.0, 0.0],
        qkv_bias=[True, True, True],
        cls_token=[False, False, True],
        qkv_projection_method=["dw_bn", "dw_bn", "dw_bn"],
        kernel_qkv=[3, 3, 3],
        padding_kv=[1, 1, 1],
        stride_kv=[2, 2, 2],
        padding_q=[1, 1, 1],
        stride_q=[1, 1, 1],
        projection_size=projection_size,
    )


def small_cvt_cfg_dataclass(projection_size=32):
    from cxrmate_tpu.configs import CvtConfig

    return CvtConfig(
        embed_dim=(16, 24, 40),
        num_heads=(1, 2, 4),
        depth=(1, 2, 3),
        drop_path_rate=(0.0, 0.0, 0.0),
        projection_size=projection_size,
    )


def small_bert_cfg_dataclass(vocab_size=97, cross_dim=32):
    from cxrmate_tpu.configs import BertDecoderConfig

    return BertDecoderConfig(
        vocab_size=vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=96,
        type_vocab_size=2,
        pad_token_id=4,
        cross_attention_hidden_size=cross_dim,
    )


def _legacy_decoder_prepare(decoder):
    """transformers 4.57 changed BertLMHeadModel.prepare_inputs_for_generation to
    require cache_position; the reference models (written for ~4.41) call it without.
    Restore the legacy behaviour the reference was built against."""

    def prepare(input_ids, past_key_values=None, attention_mask=None, **kw):
        if attention_mask is None:
            attention_mask = input_ids.new_ones(input_ids.shape)
        if past_key_values is not None:
            past_len = past_key_values.get_seq_length()
            if past_len:
                input_ids = input_ids[:, past_len:]
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "past_key_values": past_key_values,
        }

    return prepare


def build_reference_model(variant: str, vocab_size=97, seed=0):
    """Construct a randomly-initialised reference model of the given variant."""
    torch.manual_seed(seed)
    if variant == "single":
        mod = reference_single()
        cls = mod.SingleCXREncoderDecoderModel
    elif variant == "multi":
        mod = reference_multi()
        cls = mod.MultiCXREncoderDecoderModel
    else:
        mod = reference_longitudinal()
        cls = mod.LongitudinalPromptMultiCXREncoderDecoderModel
    enc_cfg = small_cvt_hf_config(mod)
    dec_cfg = small_bert_config(vocab_size)
    config = transformers.VisionEncoderDecoderConfig.from_encoder_decoder_configs(enc_cfg, dec_cfg)
    model = cls(config=config)
    model.eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.8, 1.2)
        if variant == "longitudinal":
            # randomise LoRA so the adapters actually contribute
            for n, p in model.named_parameters():
                if "lora_A" in n or "lora_B" in n:
                    p.normal_(0, 0.05)
    model.decoder.prepare_inputs_for_generation = _legacy_decoder_prepare(model.decoder)
    return model
