"""Metric accumulators + report loggers.

Mirrors the reference's torchmetrics classes (`/root/reference/tools/metrics/`):
accumulate (prediction, label, ids) dicts per step, gather across hosts at
``compute`` time, dedup by id (oversampled examples appear once), score, CSV-dump
per-item scores, and aggregate DICOM→study→mean.

Cross-host gather: the reference uses ``torch.distributed.all_gather_object`` of
python lists (coco.py:119-121); multi-host JAX exchanges the same payloads with
``multihost_utils.process_allgather`` on serialised rows — single-process runs skip
it entirely."""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from cxrmate_tpu.eval import nlg
from cxrmate_tpu.eval.ptb import ptb_tokenize


def _gather_rows(rows: List[dict]) -> List[dict]:
    import jax

    if jax.process_count() == 1:
        return rows
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(rows), dtype=np.uint8)
    # pad to the max length across hosts, exchange lengths first
    n = np.asarray([payload.size])
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: payload.size] = payload
    gathered = multihost_utils.process_allgather(buf)
    out: List[dict] = []
    for i, size in enumerate(sizes):
        out.extend(pickle.loads(gathered[i, : int(size)].tobytes()))
    return out


class _Accumulator:
    def __init__(self, split: str, exp_dir: str, subdir: str, accumulate_over_dicoms: bool):
        self.split = split
        self.accumulate_over_dicoms = accumulate_over_dicoms
        self.save_dir = os.path.join(exp_dir, subdir)
        Path(self.save_dir).mkdir(parents=True, exist_ok=True)
        self.rows: List[dict] = []

    def reset(self):
        self.rows = []

    def _key(self) -> str:
        return "dicom_id" if self.accumulate_over_dicoms else "study_id"

    def _dedup_df(self, rows: List[dict]) -> pd.DataFrame:
        df = pd.DataFrame(rows)
        return df.drop_duplicates(subset=[self._key()])

    def _save(self, df: pd.DataFrame, epoch) -> None:
        import jax

        if jax.process_index() == 0:
            df.to_csv(
                os.path.join(
                    self.save_dir,
                    f"{self.split}_epoch-{epoch}_{time.strftime('%d-%m-%Y_%H-%M-%S')}.csv",
                ),
                index=False,
            )


class COCONLGMetrics(_Accumulator):
    """BLEU-1..4 + ROUGE-L + CIDEr (+ METEOR-exact) with PTB tokenisation,
    per-study CSV dump and DICOM→study mean aggregation (tools/metrics/coco.py)."""

    def __init__(self, split, exp_dir, accumulate_over_dicoms, metrics=("bleu", "cider", "rouge"),
                 use_tokenizer: bool = True, meteor_synonyms=None, meteor_paraphrases=None,
                 meteor_function_words=None):
        super().__init__(split, exp_dir, "nlg_scores", accumulate_over_dicoms)
        self.metrics = [m.lower() for m in metrics]
        self.use_tokenizer = use_tokenizer
        # optional METEOR synonym module (eval/meteor.py:wordnet_synonyms),
        # paraphrase table (eval/meteor.py:load_paraphrase_table), and verbatim
        # function-word list (eval/meteor.py:load_function_words)
        self.meteor_synonyms = meteor_synonyms
        self.meteor_paraphrases = meteor_paraphrases
        self.meteor_function_words = meteor_function_words

    def update(self, predictions: Sequence[str], labels: Sequence[Sequence[str]],
               study_ids, dicom_ids=None):
        assert all(isinstance(p, str) for p in predictions)
        assert all(isinstance(l, list) for l in labels)
        if self.accumulate_over_dicoms:
            for p, l, s, d in zip(predictions, labels, study_ids, dicom_ids):
                self.rows.append({"prediction": p, "label": l, "study_id": s, "dicom_id": d})
        else:
            for p, l, s in zip(predictions, labels, study_ids):
                self.rows.append({"prediction": p, "label": l, "study_id": s})

    def compute(self, epoch=0) -> Dict[str, float]:
        rows = _gather_rows(self.rows)
        key = self._key()
        preds, labels = {}, {}
        for r in rows:
            idx = r[key]
            idx = int(idx) if isinstance(idx, (np.integer,)) else idx
            preds[idx] = [{"caption": " ".join(str(r["prediction"]).split())}]
            labels[idx] = [{"caption": " ".join(str(m).split())} for m in r["label"]]
        if self.use_tokenizer:
            preds = ptb_tokenize(preds)
            labels = ptb_tokenize(labels)
        else:
            preds = {k: [d["caption"] for d in v] for k, v in preds.items()}
            labels = {k: [d["caption"] for d in v] for k, v in labels.items()}

        df = pd.DataFrame(rows)[([ "dicom_id", "study_id"] if self.accumulate_over_dicoms else ["study_id"])]
        df = df.drop_duplicates(subset=[key])
        ids_in_order = [int(i) if isinstance(i, np.integer) else i for i in df[key]]
        preds = {i: preds[i] for i in ids_in_order}
        labels = {i: labels[i] for i in ids_in_order}

        scores: Dict[str, float] = {"num_study_ids": float(df.study_id.nunique())}
        if self.accumulate_over_dicoms:
            scores["num_dicom_ids"] = float(df.dicom_id.nunique())
        if "bleu" in self.metrics:
            _, per_item = nlg.bleu(labels, preds)
            for n in range(4):
                df[f"bleu_{n + 1}"] = per_item[n]
        if "meteor" in self.metrics:
            from cxrmate_tpu.eval.meteor import meteor

            _, per = meteor(labels, preds, synonyms=self.meteor_synonyms,
                            paraphrases=self.meteor_paraphrases,
                            function_words=self.meteor_function_words)
            df["meteor"] = per
        if "spice" in self.metrics:
            from cxrmate_tpu.eval.spice import spice

            _, per = spice(labels, preds)
            df["spice"] = per
        if "rouge" in self.metrics:
            _, per = nlg.rouge_l(labels, preds)
            df["rouge"] = per
        if "cider" in self.metrics:
            _, per = nlg.cider(labels, preds)
            df["cider"] = per
        self._save(df, epoch)
        if self.accumulate_over_dicoms:
            df = df.drop(["dicom_id"], axis=1).groupby("study_id", as_index=False).mean()
        means = df.drop(["study_id"], axis=1).mean()
        return {**scores, **means.to_dict()}


class CheXbertMetrics(_Accumulator):
    """14-pathology classification metrics via the CheXbert labeler
    (tools/metrics/chexbert.py)."""

    def __init__(self, split, exp_dir, accumulate_over_dicoms, predict_fn: Callable,
                 mbatch_size: int = 16):
        super().__init__(split, exp_dir, "chexbert_outputs", accumulate_over_dicoms)
        self.predict_fn = predict_fn  # reports -> [B, 14] class ids
        self.mbatch_size = mbatch_size

    def update(self, predictions, labels, study_ids, dicom_ids=None):
        labels = [l[0] if isinstance(l, list) else l for l in labels]
        if self.accumulate_over_dicoms:
            for p, l, s, d in zip(predictions, labels, study_ids, dicom_ids):
                self.rows.append({"prediction": p, "label": l, "study_id": s, "dicom_id": d})
        else:
            for p, l, s in zip(predictions, labels, study_ids):
                self.rows.append({"prediction": p, "label": l, "study_id": s})

    def compute(self, epoch=0) -> Dict[str, float]:
        from cxrmate_tpu.eval.chexbert import chexbert_scores

        rows = _gather_rows(self.rows)
        df = self._dedup_df(rows)
        preds, labels = [], []
        texts_p, texts_l = df["prediction"].tolist(), df["label"].tolist()
        for start in range(0, len(df), self.mbatch_size):
            preds.append(self.predict_fn(texts_p[start : start + self.mbatch_size]))
            labels.append(self.predict_fn(texts_l[start : start + self.mbatch_size]))
        y_hat = np.concatenate(preds, 0)
        y = np.concatenate(labels, 0)
        out_df = df.drop(columns=["prediction", "label"]).copy()
        from cxrmate_tpu.eval.chexbert import PATHOLOGIES

        for i, name in enumerate(PATHOLOGIES):
            out_df[f"pred_{name}"] = y_hat[:, i]
            out_df[f"label_{name}"] = y[:, i]
        self._save(out_df, epoch)
        return chexbert_scores(y_hat, y)


class CXRBERTMetric(_Accumulator):
    """CXR-BERT cosine-similarity metric (tools/metrics/cxr_bert.py)."""

    def __init__(self, split, exp_dir, accumulate_over_dicoms, reward_fn: Callable,
                 mbatch_size: int = 16):
        super().__init__(split, exp_dir, "cxr_bert", accumulate_over_dicoms)
        self.reward_fn = reward_fn
        self.mbatch_size = mbatch_size

    def update(self, predictions, labels, study_ids, dicom_ids=None):
        if self.accumulate_over_dicoms:
            for p, l, s, d in zip(predictions, labels, study_ids, dicom_ids):
                self.rows.append({"prediction": p, "label": l, "study_id": s, "dicom_id": d})
        else:
            for p, l, s in zip(predictions, labels, study_ids):
                self.rows.append({"prediction": p, "label": l, "study_id": s})

    def compute(self, epoch=0) -> Dict[str, float]:
        rows = _gather_rows(self.rows)
        df = self._dedup_df(rows)
        sims = []
        preds = df["prediction"].tolist()
        labels = df["label"].tolist()
        for start in range(0, len(df), self.mbatch_size):
            sims.append(
                self.reward_fn(preds[start : start + self.mbatch_size],
                               labels[start : start + self.mbatch_size])
            )
        sim = np.concatenate(sims, 0)
        out_df = df.drop(columns=["prediction", "label"]).copy()
        out_df["cxr_bert_similarity"] = sim
        self._save(out_df, epoch)
        if self.accumulate_over_dicoms:
            out_df = out_df.drop(["dicom_id"], axis=1).groupby("study_id", as_index=False).mean()
        return {"similarity": float(out_df["cxr_bert_similarity"].mean())}


class ReportLogger(_Accumulator):
    """Generated findings/impression → timestamped CSV (tools/metrics/report_logger.py);
    this is what produces the generated_reports/ parity artefacts."""

    def __init__(self, split, exp_dir, track_dicom_id: bool):
        super().__init__(split, exp_dir, "generated_reports", track_dicom_id)

    def update(self, findings, impression, study_ids, dicom_ids=None):
        if self.accumulate_over_dicoms:
            for f, i, s, d in zip(findings, impression, study_ids, dicom_ids):
                self.rows.append({"findings": f, "impression": i, "study_id": s, "dicom_id": d})
        else:
            for f, i, s in zip(findings, impression, study_ids):
                self.rows.append({"findings": f, "impression": i, "study_id": s})

    def compute(self, epoch=0):
        rows = _gather_rows(self.rows)
        self._save(self._dedup_df(rows), epoch)


class ReportTokenIdentifiersLogger(_Accumulator):
    """Raw generated token ids → CSV (tools/metrics/report_ids_logger.py)."""

    def __init__(self, split, exp_dir, track_dicom_id: bool):
        super().__init__(split, exp_dir, "generated_report_ids", track_dicom_id)

    def update(self, report_ids: np.ndarray, study_ids, dicom_ids=None):
        ids_list = [list(map(int, row)) for row in np.asarray(report_ids)]
        if self.accumulate_over_dicoms:
            for ids, s, d in zip(ids_list, study_ids, dicom_ids):
                self.rows.append({"report_ids": ids, "study_id": s, "dicom_id": d})
        else:
            for ids, s in zip(ids_list, study_ids):
                self.rows.append({"report_ids": ids, "study_id": s})

    def compute(self, epoch=0):
        rows = _gather_rows(self.rows)
        self._save(self._dedup_df(rows), epoch)
