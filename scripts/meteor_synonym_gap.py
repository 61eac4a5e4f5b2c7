"""Quantify the METEOR synonym stage on real radiology reports (VERDICT r4
item 7: "quantify and shrink the METEOR synonym gap").

The jar the reference shells out to (`/root/reference/tools/metrics/coco.py:59`)
matches synonyms against full WordNet (~117k synsets); our default battery falls
back to the vendored curated table ``eval/data/synonyms_en.txt`` because the
nltk WordNet corpus is absent in this image. This script measures what the
synonym stage actually does on the DOMAIN's text — the in-repo public corpus of
reference-generated reports (`/root/reference/generated_reports/*/*.csv`,
1,624 test studies x 4 released models) — so the shipped-table-vs-WordNet gap
stops being a hand-wave:

  * Pairs: for each study, one model's report is scored against another model's
    report for the SAME study (6 ordered model pairs x findings/impression).
    Same-study cross-model reports are natural paraphrase pairs — the exact
    regime where the synonym stage earns its keep (different surface choices
    for the same radiological content).
  * For each synonym module (OFF / shipped table / extended table file) it
    reports the corpus METEOR, the per-1k-words synonym-match rate (alignment
    matches with module weight 0.8), and the score delta vs OFF.
  * ``--mine`` additionally prints candidate synonym pairs for curation: the
    most frequent co-unmatched content-word pairs across aligned segments
    (both words left unmatched by exact+stem+table in the same segment pair).
    Candidates are RAW co-occurrence statistics — a human curates which are
    true synonyms before extending ``synonyms_en.txt`` (most frequent pairs
    are contextual correlates like "lateral/portable", not synonyms).

Usage:
  python scripts/meteor_synonym_gap.py [--studies N] [--mine] [--table PATH]
"""

from __future__ import annotations

import argparse
import collections
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from cxrmate_tpu.eval.meteor import (
    WEIGHT_SYN,
    _align,
    load_synonym_table,
    meteor,
)
from cxrmate_tpu.eval.ptb import ptb_tokenize_line

CSV_DIR = "/root/reference/generated_reports"
MODELS = ["cxrmate", "cxrmate-tf", "cxrmate-multi-tf", "cxrmate-single-tf"]


def load_reports(csv_dir: str):
    """{model: {study_id: (findings, impression)}} from the golden CSVs
    (the per-DICOM single-tf CSV is deduped by study_id)."""
    out = {}
    for model in MODELS:
        d = os.path.join(csv_dir, model)
        if not os.path.isdir(d):
            continue
        csvs = [f for f in os.listdir(d) if f.endswith(".csv")]
        df = pd.read_csv(os.path.join(d, csvs[0])).drop_duplicates("study_id")
        out[model] = {
            int(r["study_id"]): (str(r["findings"]), str(r["impression"]))
            for _, r in df.iterrows()
            if isinstance(r["findings"], str) and isinstance(r["impression"], str)
        }
    return out


def build_pairs(reports, max_studies: int):
    """[(hyp_tokens, ref_tokens)] — ordered model pairs over the shared study
    set, findings and impression as separate segments (the battery scores the
    sections separately too)."""
    models = [m for m in MODELS if m in reports]
    shared = sorted(set.intersection(*(set(reports[m]) for m in models)))
    if max_studies:
        shared = shared[:max_studies]
    pairs = []
    for a, b in itertools.permutations(models, 2):
        for sid in shared:
            for sec in (0, 1):
                hyp = ptb_tokenize_line(reports[a][sid][sec])
                ref = ptb_tokenize_line(reports[b][sid][sec])
                if hyp and ref:
                    pairs.append((hyp, ref))
    return pairs


def evaluate(pairs, synonyms, name: str, mine: bool = False):
    gts = {i: [" ".join(r)] for i, (_, r) in enumerate(pairs)}
    res = {i: [" ".join(h)] for i, (h, _) in enumerate(pairs)}
    corpus, _ = meteor(gts, res, synonyms=synonyms)
    syn_matches = 0
    total_words = 0
    co_unmatched: collections.Counter = collections.Counter()
    for hyp, ref in pairs:
        align = _align(hyp, ref, synonyms)
        total_words += len(hyp)
        syn_matches += sum(1 for (_, _, _, _, w) in align if w == WEIGHT_SYN)
        if mine:
            hyp_used = {i for (i, hl, _, _, _) in align for i in range(i, i + hl)}
            ref_used = {j for (_, _, j, jl, _) in align for j in range(j, j + jl)}
            h_un = {hyp[i] for i in range(len(hyp)) if i not in hyp_used and len(hyp[i]) > 3}
            r_un = {ref[j] for j in range(len(ref)) if j not in ref_used and len(ref[j]) > 3}
            for a in h_un:
                for b in r_un:
                    if a != b:
                        co_unmatched[tuple(sorted((a, b)))] += 1
    rate = 1000.0 * syn_matches / max(1, total_words)
    print(f"{name:<28} corpus METEOR {corpus:.5f}   "
          f"synonym matches {syn_matches:>6} ({rate:.2f}/1k hyp words)")
    return corpus, syn_matches, co_unmatched


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv-dir", default=CSV_DIR)
    ap.add_argument("--studies", type=int, default=200,
                    help="studies per model pair (0 = all 1,624; default 200 "
                    "keeps the beam aligner under ~10 min on one core)")
    ap.add_argument("--mine", action="store_true",
                    help="print co-unmatched word-pair candidates for curation")
    ap.add_argument("--table", default=None,
                    help="alternative synonym table file to score (A/B vs shipped)")
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()

    reports = load_reports(args.csv_dir)
    pairs = build_pairs(reports, args.studies)
    n_tok = sum(len(h) for h, _ in pairs)
    print(f"{len(pairs)} segment pairs ({n_tok} hyp tokens) from "
          f"{len(reports)} models x {args.studies or 'all'} studies\n")

    off, _, _ = evaluate(pairs, None, "synonyms OFF (exact+stem)")
    shipped = load_synonym_table()
    s_corpus, s_matches, co = evaluate(pairs, shipped, "shipped table", mine=args.mine)
    print(f"{'':28} delta vs OFF: {s_corpus - off:+.5f}")
    if args.table:
        alt = load_synonym_table(args.table)
        a_corpus, a_matches, _ = evaluate(pairs, alt, f"table {os.path.basename(args.table)}")
        print(f"{'':28} delta vs OFF: {a_corpus - off:+.5f}   "
              f"extra synonym matches vs shipped: {a_matches - s_matches:+d}")
    if args.mine:
        print(f"\ntop {args.top} co-unmatched word pairs (curation candidates, "
              "NOT auto-added):")
        for (a, b), n in co.most_common(args.top):
            print(f"  {n:>5}  {a} | {b}")


if __name__ == "__main__":
    main()
