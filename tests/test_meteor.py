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


# ---------------------------------------------------------------------------
# Cross-validation vs nltk's METEOR (VERDICT r2 item 5)
# ---------------------------------------------------------------------------
# nltk implements METEOR-original (Lavie & Agarwal 2007): α=0.9 β=3 γ=0.5, no
# function-word weighting, unit module weights, greedy stage-sequential
# alignment. Our scorer is parameterised, so running it at those settings
# isolates the shared machinery (matching modules + chunk counting + scoring
# formula) from the 1.5-specific parts (weights, δ, aggregate corpus stats).
# Both sides are given the SAME stemmer (our Snowball) and the SAME synonym
# table so module differences cannot mask alignment/scoring bugs. nltk's stem
# stage rewrites unmatched words to their stems before its wordnet stage, so
# the shared synonymy is keyed by stem on both sides.
#
# Residual deltas are real aligner differences, not bugs: nltk's exact stage
# matches each hypothesis word to the LATEST still-unused reference position
# (reverse scan), which fragments chunks whenever a word repeats — e.g.
# ref 'normal or are seen or atelectasis' / hyp 'normal or are seen
# atelectasis': nltk pairs hyp 'or' with the SECOND ref 'or' (4 chunks),
# the jar-style beam aligner here picks the contiguous alignment (2 chunks).
# The METEOR-1.5 jar resolves ties by max-matches → min-chunks → min-distance,
# which is what we implement; on a 200-pair radiology-like corpus the mean
# |Δ| vs nltk is ~0.014 and every large outlier traces to that tie-break.

# synonym pairs the corpus generator substitutes into hypotheses — every group
# is a subset of a group in the SHIPPED table (asserted below), so the nltk
# numerical pin exercises the synonymy the default battery actually runs
_SYN_GROUPS = [
    {"normal", "unremarkable"}, {"effusion", "fluid"},
    {"worsening", "progression"}, {"opacity", "infiltrate"},
    {"stable", "unchanged"}, {"atelectasis", "collapse"},
    {"edema", "swelling"},
]


def _shared_synonymy():
    """Stem-keyed view of the VENDORED synonym table (eval/data/synonyms_en.txt)
    shared verbatim between both scorers: nltk's wordnet stage looks words up
    after its stem rewrite, so the fake corpus and our ``synonyms=`` module are
    both built from {stem → union of group stems}."""
    from cxrmate_tpu.eval.meteor import load_synonym_table

    table = load_synonym_table()
    by_stem = {}
    for g in table.groups:
        sg = {stem(w) for w in g}
        for s in sg:
            by_stem.setdefault(s, set()).update(sg)
    return by_stem


def test_corpus_groups_are_in_the_shipped_table():
    """_SYN_GROUPS (the corpus generator's substitutions) must be real synonym
    relations of the shipped default table, or the pin test would drift from
    what a default --test runs."""
    from cxrmate_tpu.eval.meteor import load_synonym_table

    table = load_synonym_table()
    for g in _SYN_GROUPS:
        a, b = sorted(g)[:2]
        assert table(a, b) and table(b, a), g


class _FakeLemma:
    def __init__(self, n):
        self._n = n

    def name(self):
        return self._n


class _FakeSynset:
    def __init__(self, names):
        self._lemmas = [_FakeLemma(n) for n in names]

    def lemmas(self):
        return self._lemmas


class _FakeWordnet:
    """Just enough of nltk.corpus.wordnet for _enum_wordnetsyn_match."""

    def __init__(self, by_stem):
        self._by_stem = by_stem

    def synsets(self, w):
        return [_FakeSynset(sorted(self._by_stem[w]))] if w in self._by_stem else []


_VOCAB = (
    "the heart size is normal and lungs are clear no acute cardiopulmonary process "
    "small left pleural effusion stable cardiomegaly with focal consolidation seen "
    "right lower lobe opacity may reflect atelectasis or pneumonia interval improvement "
    "in pulmonary edema mediastinal contours unremarkable degenerative changes of spine "
    "there has been worsening bibasilar airspace disease since prior exam"
).split()


def _report_corpus(n_pairs=200, seed=42):
    import random

    by_word = {}
    for g in _SYN_GROUPS:
        for w in g:
            by_word.setdefault(w, set()).update(g)
    rng = random.Random(seed)
    pairs = []
    for _ in range(n_pairs):
        n = rng.randint(6, 22)
        ref = [rng.choice(_VOCAB) for _ in range(n)]
        hyp = list(ref)
        for i, w in enumerate(hyp):
            if w in by_word and rng.random() < 0.4:
                hyp[i] = rng.choice(sorted(by_word[w] - {w}))
            elif rng.random() < 0.15:
                hyp[i] = rng.choice(_VOCAB)
        if rng.random() < 0.5 and len(hyp) > 3:
            del hyp[rng.randrange(len(hyp))]
        if rng.random() < 0.5:
            hyp.insert(rng.randrange(len(hyp) + 1), rng.choice(_VOCAB))
        if rng.random() < 0.3 and len(hyp) > 4:
            i = rng.randrange(len(hyp) - 2)
            hyp[i], hyp[i + 1] = hyp[i + 1], hyp[i]
        pairs.append((" ".join(ref), " ".join(hyp)))
    return pairs


def test_meteor_bounded_against_nltk_with_synonyms():
    import statistics
    import types

    nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")

    by_stem = _shared_synonymy()
    fw = _FakeWordnet(by_stem)

    def syn_fn(a, b):
        return stem(b) in by_stem.get(stem(a), ())

    pairs = _report_corpus()
    gts = {i: [r] for i, (r, h) in enumerate(pairs)}
    res = {i: [h] for i, (r, h) in enumerate(pairs)}
    corpus, per = meteor(
        gts, res, synonyms=syn_fn,
        alpha=0.9, beta=3.0, gamma=0.5, delta=0.5, weights=(1.0, 1.0, 1.0),
    )
    stemmer = types.SimpleNamespace(stem=stem)
    nl = [
        nltk_meteor.single_meteor_score(r.split(), h.split(), stemmer=stemmer, wordnet=fw)
        for r, h in pairs
    ]
    deltas = [abs(a - b) for a, b in zip(per, nl)]
    # measured on this corpus: mean ~0.0144, max ~0.19 (all alignment tie-breaks)
    assert statistics.mean(deltas) < 0.02
    assert max(deltas) < 0.25
    assert abs(statistics.mean(per) - statistics.mean(nl)) < 0.02
    # where alignments agree the scores agree exactly
    assert sum(1 for d in deltas if d < 1e-12) > len(pairs) // 2
    # our aligner never scores below nltk's greedy one by more than a chunk-tie:
    # it maximises matches first, so big negative deltas would be a bug
    assert min(a - b for a, b in zip(per, nl)) > -0.08
    # the 1.5-style aggregate corpus score stays near the per-segment mean
    assert abs(corpus - statistics.mean(per)) < 0.05


def test_meteor_identical_without_repeats_or_synonyms():
    """With no repeated words and no synonym stage, both aligners must find the
    identical unique alignment — scores equal to float precision."""
    import types

    nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")

    pairs = [
        ("the heart is normal", "the heart appears normal"),
        ("small left pleural effusion", "left pleural effusion is small"),
        ("no acute cardiopulmonary process", "no acute disease"),
        ("stable cardiomegaly with edema", "cardiomegaly stable without edema"),
    ]
    gts = {i: [r] for i, (r, h) in enumerate(pairs)}
    res = {i: [h] for i, (r, h) in enumerate(pairs)}
    _, per = meteor(gts, res, alpha=0.9, beta=3.0, gamma=0.5, delta=0.5,
                    weights=(1.0, 1.0, 1.0))
    stemmer = types.SimpleNamespace(stem=stem)
    fw = _FakeWordnet({})
    for (r, h), ours in zip(pairs, per):
        theirs = nltk_meteor.single_meteor_score(
            r.split(), h.split(), stemmer=stemmer, wordnet=fw
        )
        assert ours == pytest.approx(theirs, abs=1e-12), (r, h)


# ---------------------------------------------------------------------------
# Vendored synonym table + default module (VERDICT r3 item 2: the synonym stage
# runs BY DEFAULT, like the jar's English module stack)


def test_vendored_synonym_table_semantics():
    from cxrmate_tpu.eval.meteor import load_synonym_table

    t = load_synonym_table()
    assert len(t) > 100  # a real table, not a stub
    assert t("normal", "unremarkable") and t("unremarkable", "normal")
    assert t("effusion", "fluid")
    # stem-keyed lookup: inflected forms hit their lemma's group
    assert t("persists", "remains") and t("continued", "persisting")
    assert t("enlarged", "dilated")
    # non-synonyms do not match, and unknown words match only themselves
    assert not t("normal", "effusion")
    assert not t("heart", "lungs")
    assert t("xyzzy", "xyzzy") and not t("xyzzy", "normal")


def test_default_synonyms_runs_without_wordnet():
    """default_synonyms() never returns None in this offline image — it falls
    back to the vendored table so the battery's METEOR runs exact→stem→synonym
    like the jar (/root/reference/tools/metrics/coco.py:59), with no warning."""
    import warnings

    import cxrmate_tpu.eval.meteor as m

    m._DEFAULT_SYNONYMS = None  # reset the cache
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        syn = m.default_synonyms()
    assert syn is not None and callable(syn)
    # the synonym stage changes scores: a synonym substitution scores between
    # the exact match and an unrelated substitution
    gts = {0: ["the heart is normal"]}
    hi, _ = meteor(gts, {0: ["the heart is normal"]}, synonyms=syn)
    mid, _ = meteor(gts, {0: ["the heart is unremarkable"]}, synonyms=syn)
    lo, _ = meteor(gts, {0: ["the heart is unremarkable"]}, synonyms=None)
    assert hi > mid > lo


def test_make_metrics_wires_default_synonyms(tmp_path):
    """The CLI battery passes the default synonym module into COCONLGMetrics —
    a plain --test runs the synonym stage."""
    from cxrmate_tpu.cli.config import TaskConfig
    from cxrmate_tpu.cli.stages import make_metrics

    task = TaskConfig(variant="multi", exp_dir=str(tmp_path),
                      dataset_dir=str(tmp_path), ckpt_zoo_dir=str(tmp_path))
    out = make_metrics(task, "test")
    nlg = out["test_report_nlg"]
    assert nlg.meteor_synonyms is not None
    assert nlg.meteor_synonyms("normal", "unremarkable")


# ---------------------------------------------------------------------------
# Paraphrase module (the jar's 4th matcher stage, file-gated table)


def _para_table(pairs):
    from cxrmate_tpu.eval.meteor import ParaphraseTable

    return ParaphraseTable(pairs)


def test_paraphrase_table_loader_formats(tmp_path):
    import gzip

    from cxrmate_tpu.eval.meteor import load_paraphrase_table

    plain = tmp_path / "para.txt"
    plain.write_text(
        "cardiac silhouette ||| heart size\n"
        "0.73 ||| x y ||| z\n"
        "dup ||| dup\n"          # identity pairs are dropped
        "malformed line\n"       # ignored
        " spaced  ||| pair \n"
    )
    t = load_paraphrase_table(str(plain))
    assert "heart size" in t.get("cardiac silhouette")
    assert "cardiac silhouette" in t.get("heart size")  # symmetric
    assert "z" in t.get("x y")                           # probability field ignored
    assert not t.get("dup")
    assert "pair" in t.get("spaced")
    assert t.max_len == 2

    gz = tmp_path / "para.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write("a b c ||| d\n")
    tg = load_paraphrase_table(str(gz))
    assert "d" in tg.get("a b c") and tg.max_len == 3

    # trailing-probability (PPDB-style) layout parses as the pair, not as
    # (paraphrase, prob)
    trail = tmp_path / "trail.txt"
    trail.write_text("heart size ||| cardiac silhouette ||| 0.81\n")
    tt = load_paraphrase_table(str(trail))
    assert "cardiac silhouette" in tt.get("heart size")
    assert not tt.get("0.81")

    # gzip content is detected by magic bytes, not the suffix
    gz_nosuffix = tmp_path / "para.bin"
    with gzip.open(gz_nosuffix, "wt", encoding="utf-8") as f:
        f.write("e f ||| g\n")
    tn = load_paraphrase_table(str(gz_nosuffix))
    assert "g" in tn.get("e f")


def test_paraphrase_table_loader_fails_loudly(tmp_path):
    """Wrong or mostly-corrupt files raise instead of silently yielding an
    empty/garbage table (same loud-failure contract as the SPICE adapter)."""
    from cxrmate_tpu.eval.meteor import load_paraphrase_table

    empty = tmp_path / "empty.txt"
    empty.write_text("\n\n")
    with pytest.raises(ValueError, match="no 'phrase"):
        load_paraphrase_table(str(empty))

    wrong = tmp_path / "wrong.txt"
    wrong.write_text("just some prose\nnot a table\n")
    with pytest.raises(ValueError):
        load_paraphrase_table(str(wrong))

    ppdb = tmp_path / "ppdb.txt"  # 5-field PPDB layout is not supported — loud
    ppdb.write_text(
        "[NP] ||| heart size ||| cardiac silhouette ||| f=1 ||| 0-0\n"
        "[NP] ||| a b ||| c d ||| f=1 ||| 0-0\n"
        "ok ||| pair\n"
    )
    with pytest.raises(ValueError, match="unparseable"):
        load_paraphrase_table(str(ppdb))


def test_function_words_file_gate(tmp_path):
    """load_function_words parses the jar's one-word-per-line format, fails
    loudly on junk, and meteor(function_words=...) overrides the built-in list
    (a word moved into the function class weighs (1-δ) instead of δ)."""
    from cxrmate_tpu.eval.meteor import load_function_words

    fw_file = tmp_path / "function.words"
    fw_file.write_text("# comment\nthe\nof\nlungs\n\n")
    fw = load_function_words(str(fw_file))
    assert fw == {"the", "of", "lungs"}

    with pytest.raises(ValueError, match="no words"):
        empty = tmp_path / "empty.words"
        empty.write_text("# only a comment\n")
        load_function_words(str(empty))
    with pytest.raises(ValueError, match="multi-word"):
        bad = tmp_path / "bad.words"
        bad.write_text("two words\n")
        load_function_words(str(bad))

    # 'lungs' is a content word by default; the custom list demotes it, so a
    # hypothesis missing 'lungs' scores HIGHER under the custom weighting
    gts = {1: ["the lungs are clear"]}
    res = {1: ["the heart are clear"]}
    _, (default_score,) = meteor(gts, res)
    _, (custom_score,) = meteor(gts, res, function_words=fw)
    assert custom_score > default_score


def test_meteor_empty_reference_list_scores_zero():
    """A key with zero references scores 0 instead of crashing (best=None)."""
    corpus, per = meteor({1: [], 2: ["the lungs are clear"]},
                         {1: ["some report"], 2: ["the lungs are clear"]})
    assert per[0] == 0.0 and per[1] == 1.0
    assert 0.0 < corpus <= 1.0


def test_paraphrase_weight_configurable():
    """weights=(e, s, syn, para) overrides the paraphrase module weight; at
    weight 1.0 a pure paraphrase match scores like an exact match."""
    table = _para_table([("x", "z")])
    # hyp differs from ref by one extra word so the literal-identity
    # zero-fragmentation special case does not fire in the exact analogue
    _, (at_exact,) = meteor({1: ["z q"]}, {1: ["x q extra"]},
                            weights=(1.0, 0.6, 0.8, 1.0), paraphrases=table)
    _, (exact,) = meteor({1: ["z q"]}, {1: ["z q extra"]})
    assert at_exact == pytest.approx(exact, abs=1e-12)
    _, (default_w,) = meteor({1: ["z q"]}, {1: ["x q extra"]}, paraphrases=table)
    assert default_w < at_exact  # 3-tuple default keeps the 0.6 METEOR-1.5 weight


def test_paraphrase_span_match_hand_derived():
    """hyp 'cardiac silhouette enlarged' vs ref 'heart size enlarged' with the
    phrase pair matched at weight 0.6: all six words are content words, the
    2x2 span + the exact 1x1 are contiguous (1 chunk), matches = 3."""
    table = _para_table([("cardiac silhouette", "heart size")])
    gts = {1: ["heart size enlarged"]}
    res = {1: ["cardiac silhouette enlarged"]}
    _, (without,) = meteor(gts, res)
    _, (with_para,) = meteor(gts, res, paraphrases=table)
    assert with_para > without
    p = (0.6 * 2 * DELTA + 1.0 * DELTA) / (3 * DELTA)
    f = _fmean(p, p)
    frag = 1.0 / 3.0
    expected = (1 - GAMMA * frag ** BETA) * f
    assert math.isclose(with_para, expected, rel_tol=1e-12)


def test_paraphrase_unequal_span_lengths():
    """2-word hyp phrase matched to a 1-word ref phrase: matched words average
    to 1.5, both sides' weighted masses use the module weight."""
    table = _para_table([("x y", "z")])
    _, (score,) = meteor({1: ["z"]}, {1: ["x y"]}, paraphrases=table)
    p, r = 0.6, 0.6  # wm/w on each side: 0.6*1.5d/1.5d and 0.6*d/d
    frag = 1.0 / 1.5
    expected = (1 - GAMMA * frag ** BETA) * _fmean(p, r)
    assert math.isclose(score, expected, rel_tol=1e-12)
    _, (zero,) = meteor({1: ["z"]}, {1: ["x y"]})
    assert zero == 0.0


def test_paraphrase_does_not_shadow_higher_modules():
    """A 1x1 pair already matched exactly keeps the exact weight; an unrelated
    table entry leaves scores bit-identical to the no-table path."""
    table = _para_table([("normal", "unremarkable"), ("clear", "lucent")])
    gts = {1: ["the lungs are normal"], 2: ["pleural effusion seen"]}
    res = {1: ["the lungs are normal"], 2: ["effusion is seen"]}
    c0, per0 = meteor(gts, res)
    c1, per1 = meteor(gts, res, paraphrases=table)
    assert c0 == c1 and per0 == per1
    # ...but the table DOES kick in where only the paraphrase module matches
    _, (w,) = meteor({1: ["normal heart"]}, {1: ["unremarkable heart"]}, paraphrases=table)
    _, (wo,) = meteor({1: ["normal heart"]}, {1: ["unremarkable heart"]})
    assert w > wo
