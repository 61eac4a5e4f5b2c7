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
        if variant == "single":
            config = model_configs.single_tf_config(len(tokenizer))
        elif variant == "multi":
            config = model_configs.multi_tf_config(len(tokenizer))
        else:
            config = model_configs.longitudinal_config(len(tokenizer))
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
            prompt_ids = jnp.asarray(prompt["input_ids"].astype(np.int32))
            prompt_mask = jnp.asarray(prompt["attention_mask"].astype(np.int32))
            split_specials = [tok.bos_token_id, tok.sep_token_id, tok.eos_token_id]
        else:
            prompt_ids = jnp.full((b, 1), tok.bos_token_id, jnp.int32)
            prompt_mask = jnp.ones((b, 1), jnp.int32)
            split_specials = [tok.sep_token_id, tok.eos_token_id]

        gen_cfg = self._gen_cfg(num_beams, max_new_tokens, do_sample, top_k, top_p, temperature)
        if num_beams > 1:
            seqs, _ = beam_search(
                self.variables, self.config, gen_cfg, enc_hidden, enc_mask, prompt_ids, prompt_mask
            )
        else:
            seqs = generate(
                self.variables, self.config, gen_cfg, enc_hidden, enc_mask,
                prompt_ids, prompt_mask, rng,
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
