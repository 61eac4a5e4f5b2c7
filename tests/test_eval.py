"""Evaluation-layer tests: NLG scorers against hand-computed values, PTB tokeniser
behaviour, CheXbert metric math, and the accumulate/dedup/aggregate plumbing."""

import math

import numpy as np

from cxrmate_tpu.eval import nlg
from cxrmate_tpu.eval.chexbert import chexbert_scores
from cxrmate_tpu.eval.metrics import COCONLGMetrics
from cxrmate_tpu.eval.ptb import ptb_tokenize_line


def test_bleu_hand_case():
    gts = {1: ["a b d"], 2: ["x y z w"]}
    res = {1: ["a b c"], 2: ["x y z w"]}
    corpus, per_item = nlg.bleu(gts, res)
    assert abs(per_item[0][0] - 2 / 3) < 1e-6  # unigram: 2 of 3
    assert abs(per_item[1][0] - math.sqrt((2 / 3) * (1 / 2))) < 1e-6
    assert abs(per_item[0][1] - 1.0) < 1e-6  # exact match
    assert abs(per_item[3][1] - 1.0) < 1e-6
    # corpus-level: pooled counts with brevity penalty 1 (equal lengths)
    assert abs(corpus[0] - 6 / 7) < 1e-6


def test_bleu_brevity_penalty():
    gts = {1: ["a b c d e"]}
    res = {1: ["a b"]}
    _, per_item = nlg.bleu(gts, res)
    bp = math.exp(1 - 5 / 2)
    assert abs(per_item[0][0] - 1.0 * bp) < 1e-5


def test_rouge_hand_case():
    gts = {1: ["a b d"]}
    res = {1: ["a b c"]}
    mean, per = nlg.rouge_l(gts, res)
    assert abs(per[0] - 2 / 3) < 1e-6
    gts = {1: ["same text here"]}
    res = {1: ["same text here"]}
    mean, per = nlg.rouge_l(gts, res)
    assert abs(per[0] - 1.0) < 1e-9


def test_cider_orders_similarity():
    gts = {
        1: ["no acute cardiopulmonary process"],
        2: ["stable cardiomegaly with clear lungs"],
        3: ["left basilar atelectasis without pneumothorax"],
    }
    res_good = {
        1: ["no acute cardiopulmonary process"],
        2: ["stable cardiomegaly with clear lungs"],
        3: ["left basilar atelectasis without pneumothorax"],
    }
    res_bad = {
        1: ["stable cardiomegaly"],
        2: ["no acute process"],
        3: ["right pleural effusion"],
    }
    good_mean, good = nlg.cider(gts, res_good)
    bad_mean, bad = nlg.cider(gts, res_bad)
    assert good_mean > bad_mean
    assert all(g >= b for g, b in zip(good, bad))
    assert good_mean > 5.0  # identical corpus scores high (≤10)


def test_golden_fixtures():
    """Pin BLEU/CIDEr/ROUGE numerics to analytically-derived pycocoevalcap values
    (closest-ref ties, fudge factors, BP, df clipping, length gaussian, beta=1.2).
    See tests/golden/README.md for provenance."""
    import json
    import os

    with open(os.path.join(os.path.dirname(__file__), "golden", "nlg_fixtures.json")) as f:
        fixtures = json.load(f)
    for case in fixtures["cases"]:
        gts = {k: list(v) for k, v in case["gts"].items()}
        res = {k: list(v) for k, v in case["res"].items()}
        if case["metric"] == "bleu":
            _, per_item = nlg.bleu(gts, res)
            for n in range(4):
                np.testing.assert_allclose(
                    per_item[n], case["expect_per_item"][n], rtol=1e-12, err_msg=case["note"]
                )
        elif case["metric"] == "bleu_corpus":
            corpus, _ = nlg.bleu(gts, res)
            np.testing.assert_allclose(corpus, case["expect_corpus"], rtol=1e-12, err_msg=case["note"])
        elif case["metric"] == "cider":
            _, per = nlg.cider(gts, res)
            np.testing.assert_allclose(per, case["expect_per_item"], rtol=1e-12, err_msg=case["note"])
        elif case["metric"] == "rouge":
            _, per = nlg.rouge_l(gts, res)
            np.testing.assert_allclose(per, case["expect_per_item"], rtol=1e-12, err_msg=case["note"])
        else:
            raise AssertionError(case["metric"])


def test_ptb_tokenizer():
    assert ptb_tokenize_line("There is no pneumothorax.") == ["there", "is", "no", "pneumothorax"]
    assert ptb_tokenize_line("Heart size: normal, stable.") == ["heart", "size", "normal", "stable"]
    # pycocoevalcap quirk: its punctuation filter is case-sensitive ("-LRB-") while
    # the Java tokenizer lowercases, so bracket tokens survive — reproduce that.
    assert ptb_tokenize_line("The patient's lines (unchanged).") == [
        "the", "patient", "'s", "lines", "-lrb-", "unchanged", "-rrb-",
    ]
    assert ptb_tokenize_line("Can't rule out edema...") == ["ca", "n't", "rule", "out", "edema"]


def test_ptb_tokenizer_mid_line_sentence_periods():
    """pycocoevalcap feeds Stanford's PTBTokenizer one whole multi-sentence
    caption per line (-preserveLines), and the jar splits EVERY sentence-final
    period — not just the line-final one the original PTB sed script handled.
    Radiology reports are multi-sentence, so mid-report periods must split off
    (and then drop via the punctuation filter) or no cross-sentence token can
    ever match the reference battery's output. Abbreviations/acronyms keep
    their period, like the jar's lexicon."""
    assert ptb_tokenize_line("No pneumothorax. The heart is normal.") == [
        "no", "pneumothorax", "the", "heart", "is", "normal",
    ]
    assert ptb_tokenize_line("Seen by Dr. Smith at 5 a.m. today. Stable.") == [
        "seen", "by", "dr.", "smith", "at", "5", "a.m.", "today", "stable",
    ]
    # decimals keep their period; enumeration periods split; ellipsis drops whole
    assert ptb_tokenize_line("1. Measures 5.4 cm. Unchanged vs. prior...") == [
        "1", "measures", "5.4", "cm", "unchanged", "vs.", "prior",
    ]
    # double-period typos (common in generated reports) must not leave a period
    # glued to the word; abbreviations still keep exactly their own period
    assert ptb_tokenize_line("No focal edema.. Stable.") == [
        "no", "focal", "edema", "stable",
    ]
    assert ptb_tokenize_line("Lines unchanged etc.. Stable.") == [
        "lines", "unchanged", "etc.", "stable",
    ]
    assert ptb_tokenize_line("Served in the u.s.. Stable.") == [
        "served", "in", "the", "u.s.", "stable",
    ]


def test_chexbert_scores_math():
    # 2 examples, 14 classes; class semantics: 1 == positive
    y = np.ones((2, 14), dtype=np.int64)
    y_hat = np.ones((2, 14), dtype=np.int64)
    s = chexbert_scores(y_hat, y)
    assert s["f1_macro"] == 1.0 and s["f1_micro"] == 1.0 and s["precision_example"] == 1.0
    y_hat2 = np.zeros((2, 14), dtype=np.int64)
    s2 = chexbert_scores(y_hat2, y)
    assert s2["f1_macro"] == 0.0 and s2["recall_micro"] == 0.0


def test_coco_metric_dedup_and_aggregation(tmp_path):
    m = COCONLGMetrics("test_report", str(tmp_path), accumulate_over_dicoms=True,
                       metrics=("bleu", "rouge"))
    m.update(["a b c"], [["a b c"]], study_ids=[10], dicom_ids=["d1"])
    m.update(["a b x"], [["a b c"]], study_ids=[10], dicom_ids=["d2"])
    m.update(["a b x"], [["a b c"]], study_ids=[10], dicom_ids=["d2"])  # dup dropped
    m.update(["q r s"], [["q r s"]], study_ids=[20], dicom_ids=["d3"])
    scores = m.compute(epoch=0)
    assert scores["num_study_ids"] == 2.0 and scores["num_dicom_ids"] == 3.0
    # study 10 mean of (1.0, 2/3) = 5/6; study 20 = 1.0; mean = 11/12
    assert abs(scores["bleu_1"] - 11 / 12) < 1e-6
    csvs = list((tmp_path / "nlg_scores").glob("*.csv"))
    assert len(csvs) == 1


def test_coco_metrics_degenerate_inputs(tmp_path):
    """Real decodes can produce empty or punctuation-only generations (immediate
    EOS) and references can be empty after section splitting — the battery must
    return finite scores, never NaN/crash."""
    m = COCONLGMetrics("test_report", str(tmp_path), accumulate_over_dicoms=False,
                       metrics=("bleu", "cider", "rouge", "meteor"))
    preds = ["", "the", "no acute findings", "...", "x x x x", ""]
    labels = [["no acute disease"], [""], ["no acute findings"], ["."], ["y"], [""]]
    m.update(preds, labels, study_ids=["s1", "s2", "s3", "s4", "s5", "s6"])
    scores = m.compute(epoch=0)
    for k, v in scores.items():
        assert np.isfinite(v), k
    assert scores["num_study_ids"] == 6.0
    assert abs(scores["bleu_1"] - 1 / 6) < 1e-9  # only the exact match scores
