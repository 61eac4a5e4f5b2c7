"""METEOR + Snowball stemmer tests.

The stemmer is pinned word-for-word against nltk's EnglishStemmer on a curated
real-English list (plus the radiology vocabulary METEOR will actually see); the
one *deliberate* divergence class — genuine Snowball keeps R1/R2 as fixed
positions after suffix replacement, nltk re-derives them from tracked substrings
— is pinned explicitly. METEOR itself is checked against hand-derived scores
using the METEOR 1.5 English parameters."""

import math

import pytest

from cxrmate_tpu.eval.meteor import (
    ALPHA, BETA, DELTA, FUNCTION_WORDS, GAMMA, WEIGHT_STEM, meteor,
)
from cxrmate_tpu.eval.stem import stem

REAL_WORDS = """
consolidation effusion cardiomegaly pneumothorax generalized communication arsenic
skis skies dying lying tying idly gently ugly early only singly sky news howe atlas
cosmos bias andes caresses ponies ties caress cats feed agreed plastered bled motoring
sing conflated troubled sized hopping tanned falling hissing fizzed failing filing
happy sly relational conditional rational valenci hesitanci digitizer conformabli
radicalli differentli vileli analogousli vietnamization predication operator feudalism
decisiveness hopefulness callousness formaliti sensitiviti sensibiliti triplicate
formative formalize electriciti electrical hopeful goodness revival allowance inference
airliner gyroscopic adjustable defensible irritant replacement adjustment dependent
adoption communism activate angulariti homologous effective bowdlerize probate rate
cease dyed died lied agreed owed owing armies crying string meetings meeting inning
outing canning herring earring proceed exceed succeed knack knacks generously generate
generic general arsenal luxuriant luxuriance bed bedding shed shedding dog dogs doggy
argues arguing argued argue argument fluently beautifully beautifulness hopelessness
hopelessly pirouetting pirouette grating grate skating skate exponentially
radiographically clinically bilaterally opacities opacity atelectasis degenerative
osseous carina vasculature interstitial pulmonary edema pleural effusions costophrenic
silhouettes mediastinal contours unremarkable visualized comparison aeration bibasilar
streaky disease process enlarged stably lives lived living live wives knives ourselves
organization civilization hospitalization visualization normalization rating dating
interval improvement degenerate worsening clear lungs heart stable focal opacification
""".split()


def test_stemmer_matches_nltk_on_real_words():
    nltk = pytest.importorskip("nltk")
    from nltk.stem.snowball import EnglishStemmer

    ns = EnglishStemmer()
    bad = [(w, stem(w), ns.stem(w)) for w in REAL_WORDS if stem(w) != ns.stem(w)]
    assert not bad, bad[:10]


def test_stemmer_genuine_snowball_region_semantics():
    """Genuine Snowball (the jar's englishStemmer) keeps R2 as a fixed position
    after 'ization'→'ize', so the trailing e lands in R2 and is removed; nltk's
    substring-tracked regions keep it. We follow the jar."""
    assert stem("realization") == "realiz"
    # both sides of a METEOR comparison stem identically, so alignment is unaffected
    assert stem("realizes") == stem("realization") == stem("realizing")


def test_stemmer_idempotent_on_stems():
    for w in ["effusion", "cardiomegaly", "clear", "stable", "process"]:
        assert stem(stem(w)) == stem(w)


def _fmean(p, r):
    return p * r / (ALPHA * p + (1 - ALPHA) * r)


def test_meteor_identity_scores_one():
    gts = {1: ["no acute cardiopulmonary process"]}
    res = {1: ["no acute cardiopulmonary process"]}
    corpus, per = meteor(gts, res)
    # literal identity: P=R=1, fragmentation penalty zeroed by the jar's special case
    assert per[0] == pytest.approx(1.0)
    assert corpus == pytest.approx(1.0)


def test_meteor_no_overlap_is_zero():
    corpus, per = meteor({1: ["pleural effusion"]}, {1: ["cardiac silhouette"]})
    assert per[0] == 0.0 and corpus == 0.0


def test_meteor_hand_derived_exact_case():
    """hyp 'b a' vs ref 'a b': both content words, 2 exact matches, 2 chunks."""
    corpus, per = meteor({1: ["a b"]}, {1: ["b a"]})
    # all words content-weighted delta; P = R = 1 (weighted matches / weighted len)
    f = _fmean(1.0, 1.0)
    pen = GAMMA * (2 / 2) ** BETA
    assert per[0] == pytest.approx((1 - pen) * f, rel=1e-12)


def test_meteor_stem_module_weight():
    """'effusions' vs 'effusion' match via the stem stage at weight 0.6."""
    corpus, per = meteor({1: ["effusion"]}, {1: ["effusions"]})
    p = r = WEIGHT_STEM  # single content word, module weight 0.6
    f = _fmean(p, r)
    pen = GAMMA * (1 / 1) ** BETA
    assert per[0] == pytest.approx((1 - pen) * f, rel=1e-12)


def test_meteor_function_word_weighting():
    """hyp 'the effusion' vs ref 'an effusion': only the content word matches;
    function words weigh (1-delta)."""
    corpus, per = meteor({1: ["an effusion"]}, {1: ["the effusion"]})
    assert "the" in FUNCTION_WORDS and "an" in FUNCTION_WORDS
    w_len = (1 - DELTA) + DELTA
    p = r = DELTA / w_len  # one exact content match
    f = _fmean(p, r)
    pen = GAMMA * (1 / 1) ** BETA
    assert per[0] == pytest.approx((1 - pen) * f, rel=1e-12)


def test_meteor_prefers_order():
    """Same bag of words, correct order scores higher (chunk penalty)."""
    ref = {1: ["the heart size is normal and stable"]}
    _, good = meteor(ref, {1: ["the heart size is normal and stable"]})
    _, bad = meteor(ref, {1: ["stable and normal is size heart the"]})
    assert good[0] > bad[0] > 0


def test_meteor_corpus_aggregates_stats():
    """Corpus score comes from summed statistics, not the mean of segment scores."""
    gts = {1: ["a b c d"], 2: ["q"]}
    res = {1: ["a b c d"], 2: ["z"]}
    corpus, per = meteor(gts, res)
    assert per[1] == 0.0
    assert corpus != pytest.approx(sum(per) / 2)  # stats-pooled, not averaged
    assert 0 < corpus < per[0]


def test_meteor_synonym_adapter():
    syn = lambda a, b: {a, b} == {"normal", "unremarkable"}
    _, without = meteor({1: ["normal heart"]}, {1: ["unremarkable heart"]})
    _, with_syn = meteor({1: ["normal heart"]}, {1: ["unremarkable heart"]}, synonyms=syn)
    assert with_syn[0] > without[0]
