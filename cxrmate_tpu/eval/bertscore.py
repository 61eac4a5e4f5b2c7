"""BERTScore metric.

Port of the reference's ``BERTScoreRoBERTaLarge`` (`tools/metrics/bertscore.py`:
roberta-large hidden layer 17, F1/precision/recall). The scoring algorithm is the
published one (greedy token matching on L2-normalised hidden states); the encoder is
pluggable — a converted RoBERTa/BERT checkpoint from the zoo. ``rescale_with_baseline``
takes the baseline triple from the bert-score package's baseline file when available
(the reference downloads it; offline it is optional)."""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cxrmate_tpu.configs import BertDecoderConfig
from cxrmate_tpu.models.bert import _mlp, _self_attention, bert_embed, padding_additive_mask


def bert_hidden_states(
    params, config: BertDecoderConfig, input_ids, attention_mask, *, num_layers: int,
    position_ids=None,
) -> jnp.ndarray:
    """Bidirectional encoder forward cut at ``num_layers`` → hidden [B, L, D]."""
    b, l = input_ids.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(l), (b, l))
    mask = padding_additive_mask(attention_mask)
    hidden = bert_embed(params, config, input_ids, None, position_ids)
    for layer in params["layers"][:num_layers]:
        hidden = _self_attention(layer["self"], hidden, mask, config, None)
        hidden = _mlp(layer["mlp"], hidden, config)
    return hidden


def roberta_position_ids(attention_mask: jnp.ndarray, padding_idx: int = 1) -> jnp.ndarray:
    """RoBERTa's position scheme: padding_idx + cumsum(mask) on real tokens."""
    m = attention_mask.astype(jnp.int32)
    return (jnp.cumsum(m, axis=1) * m) + padding_idx


@functools.partial(jax.jit, static_argnames=())
def _greedy_match_f1(
    cand: jnp.ndarray, cand_mask: jnp.ndarray, ref: jnp.ndarray, ref_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """BERTScore P/R/F1 from hidden states [B, L, D] (special tokens excluded by the
    caller via the masks)."""
    def norm(x):
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    c, r = norm(cand), norm(ref)
    sim = jnp.einsum("bid,bjd->bij", c, r)
    neg = -1e9
    sim = sim + (1 - cand_mask[:, :, None]) * neg + (1 - ref_mask[:, None, :]) * neg
    p = jnp.sum(jnp.max(sim, axis=2) * cand_mask, axis=1) / jnp.maximum(jnp.sum(cand_mask, 1), 1)
    rr = jnp.sum(jnp.max(sim, axis=1) * ref_mask, axis=1) / jnp.maximum(jnp.sum(ref_mask, 1), 1)
    f1 = 2 * p * rr / jnp.maximum(p + rr, 1e-12)
    return p, rr, f1


class BERTScorer:
    """(predictions, references) → dict of per-item P/R/F1 arrays.

    tokenizer: WordPiece/BPE tokenizer with __call__ batching (specials included;
    they are masked out of matching like bert-score does)."""

    def __init__(
        self,
        params: Dict,
        config: BertDecoderConfig,
        tokenizer,
        num_layers: int = 17,
        roberta_positions: bool = False,
        baseline: Optional[Tuple[float, float, float]] = None,
        max_length: int = 512,
    ):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self.num_layers = num_layers
        self.roberta_positions = roberta_positions
        self.baseline = baseline
        self.max_length = max_length

    def _embed(self, texts: Sequence[str]):
        tok = self.tokenizer(list(texts), padding="longest", truncation=True, max_length=self.max_length)
        ids = jnp.asarray(tok["input_ids"])
        mask = jnp.asarray(tok["attention_mask"])
        pos = roberta_position_ids(mask) if self.roberta_positions else None
        hidden = bert_hidden_states(
            self.params, self.config, ids, mask, num_layers=self.num_layers, position_ids=pos
        )
        # exclude [CLS]/[SEP]-style specials from matching (first + last real token)
        b, l = mask.shape
        idx = jnp.arange(l)[None, :]
        last_real = jnp.sum(mask, axis=1) - 1
        match_mask = mask.astype(jnp.float32)
        match_mask = match_mask * (idx != 0) * (idx != last_real[:, None])
        return hidden, match_mask

    def score(self, predictions: Sequence[str], references: Sequence[str]) -> Dict[str, np.ndarray]:
        cand, cand_mask = self._embed(predictions)
        ref, ref_mask = self._embed(references)
        lc, lr = cand.shape[1], ref.shape[1]
        width = max(lc, lr)
        cand = jnp.pad(cand, ((0, 0), (0, width - lc), (0, 0)))
        cand_mask = jnp.pad(cand_mask, ((0, 0), (0, width - lc)))
        ref = jnp.pad(ref, ((0, 0), (0, width - lr), (0, 0)))
        ref_mask = jnp.pad(ref_mask, ((0, 0), (0, width - lr)))
        p, r, f1 = _greedy_match_f1(cand, cand_mask, ref, ref_mask)
        p, r, f1 = np.asarray(p), np.asarray(r), np.asarray(f1)
        if self.baseline is not None:
            bp, br, bf = self.baseline
            p, r, f1 = (p - bp) / (1 - bp), (r - br) / (1 - br), (f1 - bf) / (1 - bf)
        return {"precision": p, "recall": r, "f1": f1}


class RobertaBPETokenizer:
    """RoBERTa tokenisation conventions over the in-tree byte-level BPE.

    Loads an HF ``roberta-large``-style checkpoint dir (``vocab.json`` +
    ``merges.txt``, or a ``tokenizer.json``) and reproduces what bert-score's
    ``sent_encode`` does with the HF tokenizer (`tools/metrics/bertscore.py` uses
    the bert-score package, whose roberta path is
    ``tokenizer.encode(sent, add_special_tokens=True, truncation=True)``):
    ``<s> + BPE(text) + </s>`` with content truncated to fit ``max_length``."""

    def __init__(self, vocab: Dict[str, int], merges):
        from cxrmate_tpu.tokenizer.bpe import ByteLevelBPETokenizer

        specials = [t for t in ("<s>", "</s>", "<pad>", "<unk>", "<mask>") if t in vocab]
        self._bpe = ByteLevelBPETokenizer(
            vocab, merges, special_tokens=("<unk>",) if "<unk>" in vocab else (),
            additional_special_tokens=[t for t in specials if t != "<unk>"],
            unk_token="<unk>",
        )
        self.bos_token_id = vocab["<s>"]
        self.eos_token_id = vocab["</s>"]
        self.pad_token_id = vocab["<pad>"]

    @classmethod
    def from_dir(cls, path: str) -> "RobertaBPETokenizer":
        import json
        import os

        vocab_json = os.path.join(path, "vocab.json")
        if os.path.exists(vocab_json):
            with open(vocab_json) as f:
                vocab = json.load(f)
            merges = []
            with open(os.path.join(path, "merges.txt")) as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line or line.startswith("#version"):
                        continue
                    merges.append(tuple(line.split(" ", 1)))
            return cls(vocab, merges)
        tok_json = os.path.join(path, "tokenizer.json")
        with open(tok_json) as f:
            data = json.load(f)
        model = data["model"]
        merges = [tuple(m.split(" ", 1)) if isinstance(m, str) else tuple(m)
                  for m in model["merges"]]
        vocab = dict(model["vocab"])
        for t in data.get("added_tokens", []):
            vocab.setdefault(t["content"], t["id"])
        return cls(vocab, merges)

    def __call__(self, texts: Sequence[str], padding: str = "longest",
                 truncation: bool = False, max_length: Optional[int] = None):
        encoded = []
        for t in texts:
            ids = self._bpe.encode(t)
            if truncation and max_length is not None:
                ids = ids[: max_length - 2]
            encoded.append([self.bos_token_id] + ids + [self.eos_token_id])
        width = max((len(e) for e in encoded), default=0)
        n = len(encoded)
        input_ids = np.full((n, width), self.pad_token_id, np.int32)
        attention_mask = np.zeros((n, width), np.int32)
        for r, e in enumerate(encoded):
            input_ids[r, : len(e)] = e
            attention_mask[r, : len(e)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}


def convert_roberta(sd: Dict, num_attention_heads: Optional[int] = None) -> Tuple[Dict, BertDecoderConfig]:
    """Convert an HF RoBERTa encoder state dict (``roberta.*`` keys, e.g.
    roberta-large as bert-score downloads it) into the in-tree BERT pytree; the
    config is derived from the tensor shapes. RoBERTa differs from BERT only in
    naming (remapped here) and the position scheme (``roberta_position_ids``).

    ``num_attention_heads`` is NOT recoverable from shapes and changes the
    attention partitioning — pass it from the checkpoint's config.json
    (build_bertscorer does); the fallback assumes RoBERTa's 64-dim heads."""
    from cxrmate_tpu.ckpt.hf_convert import convert_bert_decoder
    from cxrmate_tpu.reward.cxrbert import _fake_lm_head

    sd = {k.replace("roberta.", "bert.", 1): v for k, v in sd.items()}
    word = sd["bert.embeddings.word_embeddings.weight"]
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("bert.encoder.layer.")
    )
    hidden = int(word.shape[1])
    inter = int(sd["bert.encoder.layer.0.intermediate.dense.weight"].shape[0])
    cfg = BertDecoderConfig(
        vocab_size=int(word.shape[0]), hidden_size=hidden,
        num_hidden_layers=n_layers,
        num_attention_heads=num_attention_heads or max(1, hidden // 64),
        intermediate_size=inter,
        max_position_embeddings=int(sd["bert.embeddings.position_embeddings.weight"].shape[0]),
        type_vocab_size=int(sd["bert.embeddings.token_type_embeddings.weight"].shape[0]),
        pad_token_id=1, add_cross_attention=False,
    )
    params = convert_bert_decoder({**sd, **_fake_lm_head(sd, cfg)}, cfg)
    params.pop("lm_head", None)
    return params, cfg


def load_rescale_baseline(path: str, num_layers: int) -> Optional[Tuple[float, float, float]]:
    """Parse a bert-score rescale-baseline file (CSV ``LAYER,P,R,F``, one row per
    layer — the package's ``rescale_baseline/en/roberta-large.tsv``) and return
    the (P, R, F) triple for ``num_layers``."""
    import csv

    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader)
        cols = {c.strip().upper(): i for i, c in enumerate(header)}
        for row in reader:
            if not row:
                continue
            if int(float(row[cols.get("LAYER", 0)])) == num_layers:
                return (
                    float(row[cols.get("P", 1)]),
                    float(row[cols.get("R", 2)]),
                    float(row[cols.get("F", 3)]),
                )
    return None


class BERTScoreMetric:
    """Accumulating metric mirroring tools/metrics/bertscore.py: dedup by id,
    per-item CSV dump, mean f1/precision/recall."""

    def __init__(self, split, exp_dir, accumulate_over_dicoms, scorer: BERTScorer,
                 mbatch_size: int = 16):
        from cxrmate_tpu.eval.metrics import _Accumulator

        self._acc = _Accumulator(split, exp_dir, "bertscore", accumulate_over_dicoms)
        self.scorer = scorer
        self.mbatch_size = mbatch_size

    def update(self, predictions, labels, study_ids, dicom_ids=None):
        labels = [l[0] if isinstance(l, list) else l for l in labels]
        rows = self._acc.rows
        if self._acc.accumulate_over_dicoms:
            for p, l, s, d in zip(predictions, labels, study_ids, dicom_ids):
                rows.append({"prediction": p, "label": l, "study_id": s, "dicom_id": d})
        else:
            for p, l, s in zip(predictions, labels, study_ids):
                rows.append({"prediction": p, "label": l, "study_id": s})

    def reset(self):
        self._acc.reset()

    def compute(self, epoch=0) -> Dict[str, float]:
        from cxrmate_tpu.eval.metrics import _gather_rows

        rows = _gather_rows(self._acc.rows)
        df = self._acc._dedup_df(rows)
        outs = {"precision": [], "recall": [], "f1": []}
        preds, labels = df["prediction"].tolist(), df["label"].tolist()
        for s in range(0, len(df), self.mbatch_size):
            out = self.scorer.score(preds[s : s + self.mbatch_size], labels[s : s + self.mbatch_size])
            for k in outs:
                outs[k].append(out[k])
        # raw and rescaled BERTScore live on very different scales (the
        # reference ALWAYS rescales, tools/metrics/bertscore.py:93) — when the
        # baseline TSV is missing, suffix every emitted key/column so a
        # downstream consumer can never silently compare
        # `..._bertscore_f1` across runs with and without the baseline
        suffix = "" if self.scorer.baseline is not None else "_unrescaled"
        out_df = df.drop(columns=["prediction", "label"]).copy()
        for k in outs:
            out_df[k + suffix] = np.concatenate(outs[k]) if outs[k] else []
        self._acc._save(out_df, epoch)
        return {k + suffix: float(np.mean(np.concatenate(v))) for k, v in outs.items() if v}
