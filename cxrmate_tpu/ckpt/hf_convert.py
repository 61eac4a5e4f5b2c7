"""HF/torch checkpoint → cxrmate_tpu parameter-pytree converters.

Key layouts follow the released cxrmate checkpoints (the state-dict key remaps are
documented in the reference's ``modules/transformers/*_model_to_hub.ipynb``; the final
on-Hub names are plain HF ``CvtModel``/``BertLMHeadModel`` names, optionally wrapped by
PEFT for the longitudinal checkpoints).

Transpositions:
  * torch Linear ``[out, in]``       → ``w: [in, out]``
  * torch Conv2d ``[out, in/g, kh, kw]`` → ``w: [kh, kw, in/g, out]`` (HWIO)
  * embeddings keep ``[num, dim]``
  * LoRA: ``lora_A [r, in]`` → ``[in, r]``; ``lora_B [out, r]`` → ``[r, out]``
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from cxrmate_tpu.configs import BertDecoderConfig, CvtConfig


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _lin(sd, key):
    p = {"w": jnp.asarray(_np(sd[f"{key}.weight"]).T)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{key}.bias"]))
    return p


def _ln(sd, key):
    return {
        "scale": jnp.asarray(_np(sd[f"{key}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{key}.bias"])),
    }


def _conv(sd, key):
    return {"w": jnp.asarray(_np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0))}


def convert_cvt_encoder(sd: Dict, config: CvtConfig, prefix: str = "") -> Dict:
    """Convert a ``CvtWithProjectionHead`` state dict (keys ``cvt.*`` +
    ``projection_head.*``, optionally under ``prefix``)."""
    p = prefix
    params, stats = {"stages": []}, {"stages": []}
    for s in range(config.num_stages):
        st = f"{p}cvt.encoder.stages.{s}"
        emb = f"{st}.embedding.convolution_embeddings"
        stage_p = {
            "embed": {
                "w": jnp.asarray(_np(sd[f"{emb}.projection.weight"]).transpose(2, 3, 1, 0)),
                "b": jnp.asarray(_np(sd[f"{emb}.projection.bias"])),
                "ln": _ln(sd, f"{emb}.normalization"),
            },
            "layers": [],
        }
        stage_s = {"layers": []}
        if config.cls_token[s]:
            stage_p["cls_token"] = jnp.asarray(_np(sd[f"{st}.cls_token"]))
        for l in range(config.depth[s]):
            ly = f"{st}.layers.{l}"
            at = f"{ly}.attention.attention"
            layer_p = {
                "ln_before": _ln(sd, f"{ly}.layernorm_before"),
                "ln_after": _ln(sd, f"{ly}.layernorm_after"),
                "attn": {
                    "out": _lin(sd, f"{ly}.attention.output.dense"),
                },
                "mlp": {
                    "fc1": _lin(sd, f"{ly}.intermediate.dense"),
                    "fc2": _lin(sd, f"{ly}.output.dense"),
                },
            }
            layer_s = {}
            for name, hf in (("q", "query"), ("k", "key"), ("v", "value")):
                cp = f"{at}.convolution_projection_{hf}.convolution_projection"
                layer_p["attn"][f"conv_{name}"] = _conv(sd, cp + ".convolution")
                layer_p["attn"][f"bn_{name}"] = _ln(sd, cp + ".normalization")
                layer_s[f"bn_{name}"] = {
                    "mean": jnp.asarray(_np(sd[f"{cp}.normalization.running_mean"])),
                    "var": jnp.asarray(_np(sd[f"{cp}.normalization.running_var"])),
                }
                layer_p["attn"][name] = _lin(sd, f"{at}.projection_{hf}")
            stage_p["layers"].append(layer_p)
            stage_s["layers"].append(layer_s)
        params["stages"].append(stage_p)
        stats["stages"].append(stage_s)

    params["projection_head"] = {
        "ln": _ln(sd, f"{p}projection_head.layer_norm"),
        "proj": {"w": jnp.asarray(_np(sd[f"{p}projection_head.projection.weight"]).T)},
    }
    return {"params": params, "batch_stats": stats}


def convert_bert_decoder(sd: Dict, config: BertDecoderConfig, prefix: str = "") -> Dict:
    """Convert a ``BertLMHeadModel`` state dict (keys ``bert.*`` + ``cls.*``).

    Handles PEFT-wrapped decoders (``base_model.model.`` prefix, ``base_layer`` and
    ``lora_A/lora_B.default`` leaves) transparently: LoRA factors become
    ``lora_a``/``lora_b`` entries on the q/k linears."""
    # Normalise PEFT prefixes.
    norm = {}
    for k, v in sd.items():
        k = k.replace("base_model.model.", "").replace(".base_layer.", ".")
        norm[k] = v
    sd = norm
    p = prefix

    def lora(key):
        extra = {}
        a = f"{p}{key}.lora_A.default.weight"
        b = f"{p}{key}.lora_B.default.weight"
        if a in sd:
            extra["lora_a"] = jnp.asarray(_np(sd[a]).T)
            extra["lora_b"] = jnp.asarray(_np(sd[b]).T)
        return extra

    params = {
        "embeddings": {
            "word": jnp.asarray(_np(sd[f"{p}bert.embeddings.word_embeddings.weight"])),
            "position": jnp.asarray(_np(sd[f"{p}bert.embeddings.position_embeddings.weight"])),
            "token_type": jnp.asarray(_np(sd[f"{p}bert.embeddings.token_type_embeddings.weight"])),
            "ln": _ln(sd, f"{p}bert.embeddings.LayerNorm"),
        },
        "layers": [],
        "lm_head": {
            "transform": _lin(sd, f"{p}cls.predictions.transform.dense"),
            "ln": _ln(sd, f"{p}cls.predictions.transform.LayerNorm"),
            "decoder": {"b": jnp.asarray(_np(sd[f"{p}cls.predictions.bias"]))},
        },
    }
    # BertLMHeadModel ties the LM projection to the word embeddings by default
    # (safetensors checkpoints drop the alias entirely). Keep a separate weight only
    # for genuinely untied checkpoints; tied heads reuse embeddings.word so training
    # gradients flow like torch's.
    head_key = f"{p}cls.predictions.decoder.weight"
    if head_key in sd:
        head_w = _np(sd[head_key])
        if not np.array_equal(head_w, _np(sd[f"{p}bert.embeddings.word_embeddings.weight"])):
            params["lm_head"]["decoder"]["w"] = jnp.asarray(head_w.T)
    for l in range(config.num_hidden_layers):
        ly = f"{p}bert.encoder.layer.{l}"
        layer = {
            "self": {
                "q": {**_lin(sd, f"{ly}.attention.self.query"), **lora(f"bert.encoder.layer.{l}.attention.self.query")},
                "k": {**_lin(sd, f"{ly}.attention.self.key"), **lora(f"bert.encoder.layer.{l}.attention.self.key")},
                "v": _lin(sd, f"{ly}.attention.self.value"),
                "out": _lin(sd, f"{ly}.attention.output.dense"),
                "ln": _ln(sd, f"{ly}.attention.output.LayerNorm"),
            },
            "mlp": {
                "fc1": _lin(sd, f"{ly}.intermediate.dense"),
                "fc2": _lin(sd, f"{ly}.output.dense"),
                "ln": _ln(sd, f"{ly}.output.LayerNorm"),
            },
        }
        if config.add_cross_attention:
            layer["cross"] = {
                "q": _lin(sd, f"{ly}.crossattention.self.query"),
                "k": _lin(sd, f"{ly}.crossattention.self.key"),
                "v": _lin(sd, f"{ly}.crossattention.self.value"),
                "out": _lin(sd, f"{ly}.crossattention.output.dense"),
                "ln": _ln(sd, f"{ly}.crossattention.output.LayerNorm"),
            }
        params["layers"].append(layer)
    return params


def export_encoder_decoder(variables: Dict, enc_cfg: CvtConfig, dec_cfg: BertDecoderConfig) -> Dict:
    """Inverse of :func:`convert_encoder_decoder`: our pytrees → a torch-layout
    state dict (numpy tensors) usable with the reference's HF classes / push-to-hub
    flow (the role of the reference's ``*_model_to_hub.ipynb`` notebooks)."""
    out: Dict[str, np.ndarray] = {}

    def put_lin(key, p):
        out[f"{key}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            out[f"{key}.bias"] = np.asarray(p["b"])

    def put_ln(key, p):
        out[f"{key}.weight"] = np.asarray(p["scale"])
        out[f"{key}.bias"] = np.asarray(p["bias"])

    enc, stats = variables["params"]["encoder"], variables["batch_stats"]
    for s in range(enc_cfg.num_stages):
        st = f"encoder.cvt.encoder.stages.{s}"
        emb = f"{st}.embedding.convolution_embeddings"
        sp = enc["stages"][s]
        out[f"{emb}.projection.weight"] = np.asarray(sp["embed"]["w"]).transpose(3, 2, 0, 1)
        out[f"{emb}.projection.bias"] = np.asarray(sp["embed"]["b"])
        put_ln(f"{emb}.normalization", sp["embed"]["ln"])
        if enc_cfg.cls_token[s]:
            out[f"{st}.cls_token"] = np.asarray(sp["cls_token"])
        for l, lp in enumerate(sp["layers"]):
            ly = f"{st}.layers.{l}"
            at = f"{ly}.attention.attention"
            ls = stats["stages"][s]["layers"][l]
            for name, hf in (("q", "query"), ("k", "key"), ("v", "value")):
                cp = f"{at}.convolution_projection_{hf}.convolution_projection"
                out[f"{cp}.convolution.weight"] = np.asarray(lp["attn"][f"conv_{name}"]["w"]).transpose(3, 2, 0, 1)
                put_ln(f"{cp}.normalization", lp["attn"][f"bn_{name}"])
                out[f"{cp}.normalization.running_mean"] = np.asarray(ls[f"bn_{name}"]["mean"])
                out[f"{cp}.normalization.running_var"] = np.asarray(ls[f"bn_{name}"]["var"])
                put_lin(f"{at}.projection_{hf}", lp["attn"][name])
            put_lin(f"{ly}.attention.output.dense", lp["attn"]["out"])
            put_lin(f"{ly}.intermediate.dense", lp["mlp"]["fc1"])
            put_lin(f"{ly}.output.dense", lp["mlp"]["fc2"])
            put_ln(f"{ly}.layernorm_before", lp["ln_before"])
            put_ln(f"{ly}.layernorm_after", lp["ln_after"])
    put_ln("encoder.projection_head.layer_norm", enc["projection_head"]["ln"])
    out["encoder.projection_head.projection.weight"] = np.asarray(enc["projection_head"]["proj"]["w"]).T

    dec = variables["params"]["decoder"]
    # a LoRA-carrying decoder is PEFT-wrapped in the reference class, which
    # inserts `base_model.model.` into every decoder key (the released
    # longitudinal hub checkpoints use these names)
    has_lora = any("lora_a" in layer["self"][n] for layer in dec["layers"] for n in ("q", "k"))
    dp = "decoder.base_model.model." if has_lora else "decoder."
    e = dec["embeddings"]
    out[f"{dp}bert.embeddings.word_embeddings.weight"] = np.asarray(e["word"])
    out[f"{dp}bert.embeddings.position_embeddings.weight"] = np.asarray(e["position"])
    out[f"{dp}bert.embeddings.token_type_embeddings.weight"] = np.asarray(e["token_type"])
    put_ln(f"{dp}bert.embeddings.LayerNorm", e["ln"])
    for l, layer in enumerate(dec["layers"]):
        ly = f"{dp}bert.encoder.layer.{l}"
        for name, src in (("q", "query"), ("k", "key")):
            p_attn = layer["self"][name]
            base = {k: v for k, v in p_attn.items() if k in ("w", "b")}
            if "lora_a" in p_attn:
                # PEFT-wrapped naming, as in the released hub checkpoints (the
                # longitudinal class wraps q/k in LoraModel before load_state_dict,
                # longitudinal_gen_prompt_cxr-bert_model_to_hub.ipynb cell 7)
                put_lin(f"{ly}.attention.self.{src}.base_layer", base)
                out[f"{ly}.attention.self.{src}.lora_A.default.weight"] = np.asarray(p_attn["lora_a"]).T
                out[f"{ly}.attention.self.{src}.lora_B.default.weight"] = np.asarray(p_attn["lora_b"]).T
            else:
                put_lin(f"{ly}.attention.self.{src}", base)
        put_lin(f"{ly}.attention.self.value", layer["self"]["v"])
        put_lin(f"{ly}.attention.output.dense", layer["self"]["out"])
        put_ln(f"{ly}.attention.output.LayerNorm", layer["self"]["ln"])
        if "cross" in layer:
            put_lin(f"{ly}.crossattention.self.query", layer["cross"]["q"])
            put_lin(f"{ly}.crossattention.self.key", layer["cross"]["k"])
            put_lin(f"{ly}.crossattention.self.value", layer["cross"]["v"])
            put_lin(f"{ly}.crossattention.output.dense", layer["cross"]["out"])
            put_ln(f"{ly}.crossattention.output.LayerNorm", layer["cross"]["ln"])
        put_lin(f"{ly}.intermediate.dense", layer["mlp"]["fc1"])
        put_lin(f"{ly}.output.dense", layer["mlp"]["fc2"])
        put_ln(f"{ly}.output.LayerNorm", layer["mlp"]["ln"])
    put_lin(f"{dp}cls.predictions.transform.dense", dec["lm_head"]["transform"])
    put_ln(f"{dp}cls.predictions.transform.LayerNorm", dec["lm_head"]["ln"])
    head = dec["lm_head"]["decoder"]
    head_w = np.asarray(head["w"]).T if "w" in head else np.asarray(e["word"])
    out[f"{dp}cls.predictions.decoder.weight"] = head_w
    out[f"{dp}cls.predictions.bias"] = np.asarray(head["b"])
    out[f"{dp}cls.predictions.decoder.bias"] = out[f"{dp}cls.predictions.bias"]
    return out


def convert_encoder_decoder(sd: Dict, enc_cfg: CvtConfig, dec_cfg: BertDecoderConfig) -> Dict:
    """Convert a full ``*CXREncoderDecoderModel`` state dict (keys ``encoder.*`` +
    ``decoder.*``) into {'params': {'encoder','decoder'}, 'batch_stats': ...}."""
    enc = convert_cvt_encoder(sd, enc_cfg, prefix="encoder.")
    dec = convert_bert_decoder(sd, dec_cfg, prefix="decoder.")
    return {
        "params": {"encoder": enc["params"], "decoder": dec},
        "batch_stats": enc["batch_stats"],
    }
