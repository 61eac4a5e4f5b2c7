"""CheXbert labeler + classification metrics.

Port of `/root/reference/tools/chexbert.py` (BERT-base encoder + 13 four-class heads
+ 1 two-class head, Stanford checkpoint key remap) and
`tools/metrics/chexbert.py` (14-pathology example/macro/micro accuracy, precision,
recall, F1 — including ``val_report_chexbert_f1_macro``, the reference's checkpoint-
selection metric)."""

from __future__ import annotations

import functools
import re
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cxrmate_tpu.configs import BertDecoderConfig
from cxrmate_tpu.models.bert_encoder import bert_encoder_forward, cls_embedding
from cxrmate_tpu.ops.layers import linear

PATHOLOGIES = [
    "enlarged_cardiomediastinum", "cardiomegaly", "lung_opacity", "lung_lesion",
    "edema", "consolidation", "pneumonia", "atelectasis", "pneumothorax",
    "pleural_effusion", "pleural_other", "fracture", "support_devices", "no_finding",
]

BERT_BASE = BertDecoderConfig(
    vocab_size=30522, hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
    intermediate_size=3072, max_position_embeddings=512, type_vocab_size=2,
    pad_token_id=0, add_cross_attention=False,
)


def normalize_report(text: str) -> str:
    """tools/chexbert.py:53-58 (literal-string replaces, as in the reference)."""
    text = text.strip()
    text = text.replace("\n", " ")
    text = text.replace("\\s+", " ")
    text = text.replace("\\s+(?=[\\.,])", "")
    return text.strip()


@functools.partial(jax.jit, static_argnames=("config",))
def chexbert_logits(params, config: BertDecoderConfig, input_ids, attention_mask):
    hidden = bert_encoder_forward(params["bert"], config, input_ids, attention_mask)
    cls = cls_embedding(hidden)
    return [linear(head, cls) for head in params["heads"]]


def chexbert_predict(params, config, tokenizer, reports: Sequence[str], max_length: int = 512) -> np.ndarray:
    """→ [B, 14] class predictions (argmax per head), as tools/chexbert.py:60-81."""
    reports = [normalize_report(r) for r in reports]
    tok = tokenizer(list(reports), padding="longest", truncation=True, max_length=max_length)
    logits = chexbert_logits(
        params, config, jnp.asarray(tok["input_ids"]), jnp.asarray(tok["attention_mask"])
    )
    return np.stack([np.asarray(jnp.argmax(l, axis=-1)) for l in logits], axis=1)


def convert_chexbert(sd: Dict, config: BertDecoderConfig = BERT_BASE) -> Dict:
    """Convert the Stanford CheXbert checkpoint state dict (keys
    ``module.bert.* / module.linear_heads.*`` or already-remapped ``bert.*``)."""
    from cxrmate_tpu.ckpt.hf_convert import _lin, convert_bert_decoder

    norm = {}
    for k, v in sd.items():
        k = k.replace("module.", "")
        norm[k] = v
    sd = norm
    from cxrmate_tpu.reward.cxrbert import _fake_lm_head

    bert = convert_bert_decoder({**sd, **_fake_lm_head(sd, config)}, config)
    bert.pop("lm_head", None)
    heads = [_lin(sd, f"linear_heads.{i}") for i in range(14)]
    return {"bert": bert, "heads": heads}


# ------------------------------------------------------------ classification metrics
def chexbert_scores(y_hat: np.ndarray, y: np.ndarray) -> Dict[str, float]:
    """tp/tn/fp/fn → example/macro/micro accuracy/precision/recall/F1
    (tools/metrics/chexbert.py:201-292). Class semantics: prediction classes are
    {blank:0, positive:1, negative:2, uncertain:3}; the metric binarises on
    class == 1 (positive)."""
    tp = ((y_hat == 1) & (y == 1)).astype(np.float64)
    tn = ((y_hat != 1) & (y != 1)).astype(np.float64)
    fp = ((y_hat == 1) & (y != 1)).astype(np.float64)
    fn = ((y_hat != 1) & (y == 1)).astype(np.float64)

    eps = 1e-11  # avoid 0/0 like the torch implementation's masking

    def safe_div(a, b):
        return np.where(b > 0, a / np.maximum(b, eps), 0.0)

    scores: Dict[str, float] = {}
    # example-based: mean over examples of per-example scores across the 14 classes
    ex_p = safe_div(tp.sum(1), (tp + fp).sum(1))
    ex_r = safe_div(tp.sum(1), (tp + fn).sum(1))
    ex_f1 = safe_div(2 * ex_p * ex_r, ex_p + ex_r)
    ex_acc = safe_div((tp + tn).sum(1), (tp + tn + fp + fn).sum(1))
    scores["accuracy_example"] = float(ex_acc.mean())
    scores["precision_example"] = float(ex_p.mean())
    scores["recall_example"] = float(ex_r.mean())
    scores["f1_example"] = float(ex_f1.mean())

    # class-based (macro): per-class over all examples, then mean
    cl_tp, cl_tn, cl_fp, cl_fn = tp.sum(0), tn.sum(0), fp.sum(0), fn.sum(0)
    cl_p = safe_div(cl_tp, cl_tp + cl_fp)
    cl_r = safe_div(cl_tp, cl_tp + cl_fn)
    cl_f1 = safe_div(2 * cl_p * cl_r, cl_p + cl_r)
    cl_acc = safe_div(cl_tp + cl_tn, cl_tp + cl_tn + cl_fp + cl_fn)
    for name, val in zip(PATHOLOGIES, cl_f1):
        scores[f"f1_{name}"] = float(val)
    scores["accuracy_macro"] = float(cl_acc.mean())
    scores["precision_macro"] = float(cl_p.mean())
    scores["recall_macro"] = float(cl_r.mean())
    scores["f1_macro"] = float(cl_f1.mean())

    # micro: pooled
    scores["accuracy_micro"] = float(safe_div(tp.sum() + tn.sum(), tp.sum() + tn.sum() + fp.sum() + fn.sum()))
    scores["precision_micro"] = float(safe_div(tp.sum(), tp.sum() + fp.sum()))
    scores["recall_micro"] = float(safe_div(tp.sum(), tp.sum() + fn.sum()))
    scores["f1_micro"] = float(
        safe_div(2 * scores["precision_micro"] * scores["recall_micro"],
                 scores["precision_micro"] + scores["recall_micro"])
    )
    scores["num_study_ids"] = float(len(y_hat))
    return scores
