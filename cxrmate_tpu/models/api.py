"""High-level inference API.

The cxrmate_tpu equivalent of the reference's Hub usage
(`/root/reference/examples/cxrmate.ipynb`):

    model = CXRMate.from_hf_checkpoint("/path/to/aehrc-cxrmate", variant="longitudinal")
    findings, impression = model.generate_report(images, prev_findings, prev_impression,
                                                 num_beams=4)

Accepts the released HF checkpoint directories (safetensors/bin + tokenizer.json)
via the converters in ckpt/hf_convert.py, or randomly-initialised models for
benchmarking."""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cxrmate_tpu import configs as model_configs
from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder
from cxrmate_tpu.generate import GenerationConfig, generate
from cxrmate_tpu.generate.beam import beam_search
from cxrmate_tpu.models import bert as bert_mod
from cxrmate_tpu.models import encoder_decoder as ed
from cxrmate_tpu.models.cvt import init_cvt_variables
from cxrmate_tpu.tokenizer import ByteLevelBPETokenizer
from cxrmate_tpu.utils.precision import cast_floats


def config_from_hf_dir(path: str, variant: str, vocab_size: int) -> model_configs.EncoderDecoderConfig:
    """Build the model config from a checkpoint directory's config.json
    (VisionEncoderDecoderConfig layout: nested encoder/decoder dicts), falling back
    to the cxrmate presets for missing fields."""
    import json

    if variant == "single":
        config = model_configs.single_tf_config(vocab_size)
    elif variant == "multi":
        config = model_configs.multi_tf_config(vocab_size)
    else:
        config = model_configs.longitudinal_config(vocab_size)
    cfg_path = os.path.join(path, "config.json")
    if not os.path.exists(cfg_path):
        return config
    with open(cfg_path) as f:
        hf = json.load(f)
    enc, dec = hf.get("encoder", {}), hf.get("decoder", {})

    def tup(v, default):
        return tuple(v) if v is not None else default

    e = config.encoder
    encoder = dataclasses.replace(
        e,
        num_channels=enc.get("num_channels", e.num_channels),
        patch_sizes=tup(enc.get("patch_sizes"), e.patch_sizes),
        patch_stride=tup(enc.get("patch_stride"), e.patch_stride),
        patch_padding=tup(enc.get("patch_padding"), e.patch_padding),
        embed_dim=tup(enc.get("embed_dim"), e.embed_dim),
        num_heads=tup(enc.get("num_heads"), e.num_heads),
        depth=tup(enc.get("depth"), e.depth),
        mlp_ratio=tup(enc.get("mlp_ratio"), e.mlp_ratio),
        qkv_bias=tup(enc.get("qkv_bias"), e.qkv_bias),
        cls_token=tup(enc.get("cls_token"), e.cls_token),
        kernel_qkv=tup(enc.get("kernel_qkv"), e.kernel_qkv),
        padding_kv=tup(enc.get("padding_kv"), e.padding_kv),
        stride_kv=tup(enc.get("stride_kv"), e.stride_kv),
        padding_q=tup(enc.get("padding_q"), e.padding_q),
        stride_q=tup(enc.get("stride_q"), e.stride_q),
        drop_path_rate=tup(enc.get("drop_path_rate"), e.drop_path_rate),
        layer_norm_eps=enc.get("layer_norm_eps", e.layer_norm_eps),
        projection_size=enc.get("projection_size", e.projection_size),
    )
    d = config.decoder
    decoder = dataclasses.replace(
        d,
        vocab_size=dec.get("vocab_size", vocab_size),
        hidden_size=dec.get("hidden_size", d.hidden_size),
        num_hidden_layers=dec.get("num_hidden_layers", d.num_hidden_layers),
        num_attention_heads=dec.get("num_attention_heads", d.num_attention_heads),
        intermediate_size=dec.get("intermediate_size", d.intermediate_size),
        max_position_embeddings=dec.get("max_position_embeddings", d.max_position_embeddings),
        type_vocab_size=dec.get("type_vocab_size", d.type_vocab_size),
        layer_norm_eps=dec.get("layer_norm_eps", d.layer_norm_eps),
        pad_token_id=dec.get("pad_token_id", d.pad_token_id),
        cross_attention_hidden_size=enc.get("projection_size", d.cross_attention_hidden_size),
    )
    return dataclasses.replace(config, encoder=encoder, decoder=decoder)


@dataclasses.dataclass
class CXRMate:
    config: model_configs.EncoderDecoderConfig
    variables: dict
    tokenizer: ByteLevelBPETokenizer

    # ------------------------------------------------------------- constructors
    @classmethod
    def from_hf_checkpoint(
        cls, path: str, variant: str = "longitudinal", dtype=jnp.float32
    ) -> "CXRMate":
        from cxrmate_tpu.ckpt.orbax_io import load_hf_pretrained_dir

        tokenizer = ByteLevelBPETokenizer.from_file(path)
        sd = load_hf_pretrained_dir(path)
        config = config_from_hf_dir(path, variant, len(tokenizer))
        variables = convert_encoder_decoder(sd, config.encoder, config.decoder)
        if not any(
            "lora_a" in layer.get("self", {}).get("q", {})
            for layer in variables["params"]["decoder"]["layers"]
        ) and config.lora is not None:
            config = dataclasses.replace(config, lora=None)
        return cls(config, cast_floats(variables, dtype), tokenizer)

    @classmethod
    def random_init(
        cls, tokenizer: ByteLevelBPETokenizer, variant: str = "multi", dtype=jnp.float32, seed: int = 0
    ) -> "CXRMate":
        if variant == "single":
            config = model_configs.single_tf_config(len(tokenizer))
        elif variant == "multi":
            config = model_configs.multi_tf_config(len(tokenizer))
        else:
            config = model_configs.longitudinal_config(len(tokenizer))
        enc = init_cvt_variables(jax.random.PRNGKey(seed), config.encoder)
        dec = bert_mod.init_bert_params(
            jax.random.PRNGKey(seed + 1), config.decoder, lora=config.lora
        )
        variables = {
            "params": {"encoder": enc["params"], "decoder": dec},
            "batch_stats": enc["batch_stats"],
        }
        return cls(config, cast_floats(variables, dtype), tokenizer)

    # ---------------------------------------------------------------- inference
    def _gen_cfg(self, num_beams: int, max_new: Optional[int], do_sample=False,
                 top_k=0, top_p=1.0, temperature=1.0) -> GenerationConfig:
        tok = self.tokenizer
        if self.config.variant == "longitudinal":
            pmt_sep = tok.vocab["[PMT-SEP]"]
            return GenerationConfig(
                max_new_tokens=max_new or self.config.decoder_max_len - 1,
                bos_token_id=tok.bos_token_id, eos_token_id=tok.eos_token_id,
                pad_token_id=tok.pad_token_id, mask_token_id=tok.pad_token_id,
                special_token_ids=(pmt_sep, tok.bos_token_id, tok.sep_token_id),
                token_type_sections=(0, 1, 0, 1), num_beams=num_beams,
                do_sample=do_sample, top_k=top_k, top_p=top_p, temperature=temperature,
            )
        return GenerationConfig(
            max_new_tokens=max_new or self.config.decoder_max_len - 1,
            bos_token_id=tok.bos_token_id, eos_token_id=tok.eos_token_id,
            pad_token_id=tok.pad_token_id,
            special_token_ids=(tok.sep_token_id,), num_beams=num_beams,
            do_sample=do_sample, top_k=top_k, top_p=top_p, temperature=temperature,
        )

    def encode(self, pixel_values: np.ndarray):
        """pixel_values: [B, 3, H, W] (single) or [B, N, 3, H, W] (multi/longitudinal),
        zero-padded image slots for variable image counts."""
        dtype = jax.tree_util.tree_leaves(self.variables["params"])[0].dtype
        enc_hidden, enc_mask, _ = ed.encode_images(
            self.variables, jnp.asarray(pixel_values, dtype), self.config
        )
        if self.config.variant == "single":
            enc_mask = jnp.ones_like(enc_mask)
        return enc_hidden, enc_mask

    def generate_report(
        self,
        pixel_values: np.ndarray,
        previous_findings: Optional[Sequence[Optional[str]]] = None,
        previous_impression: Optional[Sequence[Optional[str]]] = None,
        num_beams: int = 4,
        max_new_tokens: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        do_sample: bool = False,
        top_k: int = 0,
        top_p: float = 1.0,
        temperature: float = 1.0,
    ) -> Tuple[List[str], List[str]]:
        """→ (findings, impression) strings per batch element."""
        tok = self.tokenizer
        enc_hidden, enc_mask = self.encode(pixel_values)
        b = enc_hidden.shape[0]
        if self.config.variant == "longitudinal":
            assert previous_findings is not None and previous_impression is not None
            prompt = ed.tokenize_prompt(
                previous_findings, previous_impression, tok,
                self.config.prompt_max_len, add_bos_token_id=True,
            )
            true_width = prompt["input_ids"].shape[1]
            ids_b, mask_b = ed.bucket_prompt(
                prompt["input_ids"], prompt["attention_mask"], tok.pad_token_id,
                bucket=32, max_len=self.config.prompt_max_len,
            )
            prompt_ids = jnp.asarray(ids_b.astype(np.int32))
            prompt_mask = jnp.asarray(mask_b.astype(np.int32))
            prompt_logits_col = true_width - 1
            split_specials = [tok.bos_token_id, tok.sep_token_id, tok.eos_token_id]
        else:
            prompt_ids = jnp.full((b, 1), tok.bos_token_id, jnp.int32)
            prompt_mask = jnp.ones((b, 1), jnp.int32)
            prompt_logits_col = None
            split_specials = [tok.sep_token_id, tok.eos_token_id]

        gen_cfg = self._gen_cfg(num_beams, max_new_tokens, do_sample, top_k, top_p, temperature)
        if num_beams > 1:
            seqs, _ = beam_search(
                self.variables, self.config, gen_cfg, enc_hidden, enc_mask,
                prompt_ids, prompt_mask, prompt_logits_col=prompt_logits_col,
            )
        else:
            seqs = generate(
                self.variables, self.config, gen_cfg, enc_hidden, enc_mask,
                prompt_ids, prompt_mask, rng, prompt_logits_col=prompt_logits_col,
            )
        sections = ed.split_and_decode_sections(np.asarray(seqs), split_specials, tok)
        if self.config.variant == "longitudinal":
            _, findings, impression = sections
        else:
            findings, impression = sections
        return list(findings), list(impression)

    def tokenize_report_teacher_forcing(self, findings, impression, max_len=None):
        return ed.tokenize_report_teacher_forcing(
            findings, impression, self.tokenizer, max_len or self.config.decoder_max_len
        )

    def tokenize_prompt(self, previous_findings, previous_impression, max_len=None,
                        add_bos_token_id=False):
        return ed.tokenize_prompt(
            previous_findings, previous_impression, self.tokenizer,
            max_len or self.config.prompt_max_len, add_bos_token_id,
        )

    def split_and_decode_sections(self, token_ids, special_token_ids):
        return ed.split_and_decode_sections(token_ids, special_token_ids, self.tokenizer)
