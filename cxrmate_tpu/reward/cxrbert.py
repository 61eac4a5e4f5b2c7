"""CXR-BERT cosine-similarity reward, on-device.

Re-implements the SCST reward of the reference (`tools/rewards/cxrbert.py:9-73`):
embed predictions and labels with ``microsoft/BiomedVLP-CXR-BERT-specialized``
(a BERT encoder whose [CLS] last-hidden state is passed through a projection head)
and score each prediction by the cosine similarity of the projected embeddings.

The text→ids step stays on host (the model uses a WordPiece tokenizer); the two BERT
forwards + cosine similarity run in one jitted device call. The projection head
(`cls_projected_embedding``) is a bias-free linear layer on the CLS hidden state;
its width comes from the checkpoint at conversion time."""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cxrmate_tpu.configs import BertDecoderConfig
from cxrmate_tpu.models.bert_encoder import bert_encoder_forward, cls_embedding
from cxrmate_tpu.ops.layers import linear


@functools.partial(jax.jit, static_argnames=("config",))
def projected_cls(params, config: BertDecoderConfig, input_ids, attention_mask):
    hidden = bert_encoder_forward(params["bert"], config, input_ids, attention_mask)
    return linear(params["projection"], cls_embedding(hidden))


@functools.partial(jax.jit, static_argnames=("config",))
def cosine_reward(params, config: BertDecoderConfig, pred_ids, pred_mask, label_ids, label_mask):
    """cosine similarity (torch semantics: eps 1e-8 on norms) between projected
    prediction and label embeddings → [B]."""
    a = projected_cls(params, config, pred_ids, pred_mask).astype(jnp.float32)
    b = projected_cls(params, config, label_ids, label_mask).astype(jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), 1e-8)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), 1e-8)
    return jnp.sum(a * b, axis=-1) / (na * nb)


class CXRBERTReward:
    """Callable mirroring ``tools/rewards/cxrbert.py``: (predictions, labels) → [B]
    rewards. ``tokenizer`` must provide ``__call__(texts, padding, truncation,
    max_length) → {'input_ids','attention_mask'}`` (our WordPiece tokenizer).

    ``length_bucket``: after the tokenizer's longest-padding, the ids/mask are
    zero-padded up to the next multiple of this (capped at the model's
    max_position_embeddings). EXACT — padded keys carry attention_mask 0, so
    ``padding_additive_mask`` excludes them from every softmax and the CLS
    embedding is unchanged (tests/test_reward.py asserts equality) — and it
    bounds the number of distinct compiled ``cosine_reward`` shapes: SCST calls
    the reward every step with fresh sampled text whose longest-length varies
    per batch, which under pure longest-padding would recompile the BERT
    forward almost every step (each compile is minutes through the axon
    tunnel). 0 disables (the reference's effective behaviour — torch has no
    recompile cost to bound, `tools/rewards/cxrbert.py:23`)."""

    def __init__(self, params: Dict, config: BertDecoderConfig, tokenizer,
                 length_bucket: int = 32):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.length_bucket = length_bucket

    def _tokenize(self, texts: Sequence[str], max_len: int):
        out = self.tokenizer(list(texts), padding="longest", truncation=True,
                             max_length=max_len)
        ids = np.asarray(out["input_ids"], np.int32)
        mask = np.asarray(out["attention_mask"], np.int32)
        if self.length_bucket:
            target = min(-(-ids.shape[1] // self.length_bucket) * self.length_bucket,
                         max_len)
            pad = target - ids.shape[1]
            if pad > 0:
                pad_id = getattr(self.tokenizer, "pad_token_id", 0)
                ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=pad_id)
                mask = np.pad(mask, ((0, 0), (0, pad)))
        return ids, mask

    def __call__(self, predictions: Sequence[str], labels: Sequence[Sequence[str]]) -> np.ndarray:
        assert all(isinstance(p, str) for p in predictions)
        flat_labels = [l[0] for l in labels]
        max_len = self.config.max_position_embeddings
        pred_ids, pred_mask = self._tokenize(predictions, max_len)
        lab_ids, lab_mask = self._tokenize(flat_labels, max_len)
        sim = cosine_reward(
            self.params, self.config,
            jnp.asarray(pred_ids), jnp.asarray(pred_mask),
            jnp.asarray(lab_ids), jnp.asarray(lab_mask),
        )
        return np.asarray(sim)


def convert_cxrbert(sd: Dict, config: BertDecoderConfig) -> Dict:
    """Convert a CXR-BERT-style torch state dict: a ``bert.*`` encoder plus a
    ``cls_projection_head``-like linear (any key ending in ``projection_head.weight``
    or named ``cls_projection_head.weight``)."""
    from cxrmate_tpu.ckpt.hf_convert import _np, convert_bert_decoder

    enc_cfg = BertDecoderConfig(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        intermediate_size=config.intermediate_size,
        max_position_embeddings=config.max_position_embeddings,
        type_vocab_size=config.type_vocab_size,
        pad_token_id=config.pad_token_id,
        add_cross_attention=False,
    )
    # strip an lm head if present; reuse the embedding/layer converter
    bert = convert_bert_decoder({**sd, **_fake_lm_head(sd, enc_cfg)}, enc_cfg)
    bert.pop("lm_head", None)
    proj_key = next(
        (k for k in sd if k.endswith("projection_head.weight") or k == "cls_projection_head.weight"),
        None,
    )
    assert proj_key is not None, "no projection head found in state dict"
    proj = {"w": jnp.asarray(_np(sd[proj_key]).T)}
    bias_key = proj_key.replace(".weight", ".bias")
    if bias_key in sd:
        proj["b"] = jnp.asarray(_np(sd[bias_key]))
    return {"bert": bert, "projection": proj}


def _fake_lm_head(sd: Dict, cfg: BertDecoderConfig) -> Dict:
    """The shared converter expects cls.predictions.*; synthesise zeros if absent."""
    if "cls.predictions.transform.dense.weight" in sd:
        return {}
    import numpy as _np_mod

    d, v = cfg.hidden_size, cfg.vocab_size
    return {
        "cls.predictions.transform.dense.weight": _np_mod.zeros((d, d), _np_mod.float32),
        "cls.predictions.transform.dense.bias": _np_mod.zeros((d,), _np_mod.float32),
        "cls.predictions.transform.LayerNorm.weight": _np_mod.ones((d,), _np_mod.float32),
        "cls.predictions.transform.LayerNorm.bias": _np_mod.zeros((d,), _np_mod.float32),
        "cls.predictions.decoder.weight": _np_mod.zeros((v, d), _np_mod.float32),
        "cls.predictions.bias": _np_mod.zeros((v,), _np_mod.float32),
    }
