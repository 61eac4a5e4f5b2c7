"""Plain (bidirectional) BERT encoder — the backbone of the CheXbert labeler
(`/root/reference/tools/chexbert.py:9`) and the CXR-BERT reward/metric model
(`tools/rewards/cxrbert.py:9`). Reuses the decoder's layer primitives with a
non-causal mask, no cross-attention, and an optional pooler."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cxrmate_tpu.configs import BertDecoderConfig
from cxrmate_tpu.models.bert import _mlp, _self_attention, bert_embed, padding_additive_mask
from cxrmate_tpu.ops.layers import linear


def bert_encoder_forward(
    params,
    config: BertDecoderConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """→ last_hidden_state [B, L, D] (inference only)."""
    b, l = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, l), jnp.int32)
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(l), (b, l))
    mask = padding_additive_mask(attention_mask)  # [B,1,1,L] — bidirectional
    hidden = bert_embed(params, config, input_ids, token_type_ids, position_ids)
    for layer in params["layers"]:
        hidden = _self_attention(layer["self"], hidden, mask, config, None)
        hidden = _mlp(layer["mlp"], hidden, config)
    return hidden


def cls_embedding(hidden: jnp.ndarray) -> jnp.ndarray:
    return hidden[:, 0, :]


def pooler(params, hidden: jnp.ndarray) -> jnp.ndarray:
    """HF BertPooler: tanh(dense(cls))."""
    return jnp.tanh(linear(params["pooler"], cls_embedding(hidden)))
