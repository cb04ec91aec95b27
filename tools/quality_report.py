"""Two-scale quality report: the reference's AnalysisReport.md §1-2
scaling sanity check (10 vs 100 input files) reproduced on synthetic
biarc corpora through the end-to-end CLI.

The corpus generator controls the data-sparsity lever the reference
report demonstrates: each synonym verb pair shares a per-group noun
pool that is LARGE relative to the small run's sentence budget, so at
the small scale the two verbs' (slot, word) feature vectors rarely
overlap (recall collapses), while at 10x the sentences the overlap —
and with it recall and F1 — rises sharply; precision stays high at
both scales because cross-group verbs share only a handful of generic
nouns (reference AnalysisReport.md:17-28).

Run:  python tools/quality_report.py [--small 6] [--large 60] [--out QUALITY.md]
Writes the two-scale comparison table (the AnalysisReport §2 shape)
plus both runs' CLI report.md sections.  tests/test_quality_report.py
asserts the directional claims on a smaller pair of scales.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 12 synonym groups: (verb pair, subject pool, object pool).  Nouns are
# group-specific (20 per slot, generated deterministically) plus a few
# generic nouns shared across ALL groups so negative pairs score >0
# occasionally — keeping precision a real measurement, not a freebie.
_GROUP_VERBS = [
    ("chase", "pursue"), ("cause", "trigger"), ("cure", "heal"),
    ("build", "construct"), ("devour", "consume"), ("teach", "instruct"),
    ("guard", "protect"), ("steal", "pilfer"), ("repair", "mend"),
    ("praise", "applaud"), ("carry", "haul"), ("examine", "inspect"),
]
_SHARED_SUBJ = ["people", "groups", "animals"]
_SHARED_OBJ = ["things", "items", "targets"]
_POOL = 20  # nouns per group per slot — large vs the small-scale budget


def groups():
    out = []
    for g, verbs in enumerate(_GROUP_VERBS):
        subj = [f"agent{g}n{i}s" for i in range(_POOL)] + _SHARED_SUBJ
        obj = [f"theme{g}n{i}s" for i in range(_POOL)] + _SHARED_OBJ
        out.append((verbs, subj, obj))
    return out


def corpus_lines(sentences_per_verb: int, seed: int = 11) -> list[str]:
    rng = random.Random(seed)
    lines = []
    for verbs, subj, obj in groups():
        for verb in verbs:
            for _ in range(sentences_per_verb):
                s, o = rng.choice(subj), rng.choice(obj)
                n = rng.randint(1, 5)
                lines.append(
                    f"{verb}\t{s}/NNS/nsubj/2 {verb}/VBP/ROOT/0 "
                    f"{o}/NN/dobj/2\t{n}"
                )
    return lines


def testset_lines() -> tuple[list[str], list[str]]:
    gs = _GROUP_VERBS
    pos = [f"X {a} Y\tX {b} Y" for a, b in gs]
    rng = random.Random(17)
    neg = []
    for i in range(len(gs)):
        for _ in range(2):  # 2 cross-group negatives per group
            j = rng.randrange(len(gs))
            while j == i:
                j = rng.randrange(len(gs))
            neg.append(f"X {gs[i][0]} Y\tX {gs[j][1]} Y")
    return pos, sorted(set(neg))


def run_scale(workdir: str, sentences_per_verb: int) -> dict:
    """Generate a corpus at the given scale and drive the CLI; returns
    metrics.json + the CLI report.md text."""
    from dirt_hadoop_similarity_spark.__main__ import main as cli_main

    os.makedirs(workdir, exist_ok=True)
    corpus = os.path.join(workdir, "corpus.txt")
    with open(corpus, "w") as f:
        f.write("\n".join(corpus_lines(sentences_per_verb)) + "\n")
    pos_lines, neg_lines = testset_lines()
    pos = os.path.join(workdir, "positive-preds.txt")
    neg = os.path.join(workdir, "negative-preds.txt")
    with open(pos, "w") as f:
        f.write("\n".join(pos_lines) + "\n")
    with open(neg, "w") as f:
        f.write("\n".join(neg_lines) + "\n")
    out = os.path.join(workdir, "out")
    rc = cli_main([corpus, "--testset", pos, neg, "--out", out])
    assert rc == 0, rc
    with open(os.path.join(out, "metrics.json")) as f:
        metrics = json.load(f)
    with open(os.path.join(out, "report.md")) as f:
        report = f.read()
    metrics["n_corpus_lines"] = sentences_per_verb * 2 * len(_GROUP_VERBS)
    metrics["report_md"] = report
    return metrics


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--small", type=int, default=6)
    p.add_argument("--large", type=int, default=60)
    p.add_argument("--out", default="QUALITY.md")
    p.add_argument("--workdir", default="/tmp/dirt_quality")
    args = p.parse_args(argv)

    small = run_scale(os.path.join(args.workdir, "small"), args.small)
    large = run_scale(os.path.join(args.workdir, "large"), args.large)

    n_pos = len(testset_lines()[0])

    def row(name, key, fmt="{:.4f}"):
        return (
            f"| **{name}** | {fmt.format(small[key])} "
            f"| {fmt.format(large[key])} |\n"
        )

    with open(args.out, "w") as f:
        f.write(
            "# Two-scale quality report\n\n"
            "The reference AnalysisReport.md §2 scaling sanity check "
            "reproduced through `python -m dirt_hadoop_similarity_spark` "
            "on synthetic biarc corpora (generator: "
            "tools/quality_report.py — 12 synonym verb pairs, 24 "
            "cross-group negatives, per-group noun pools sized so the "
            "small corpus is feature-sparse).  Expected shape, per the "
            "reference: recall rises sharply with corpus size while "
            "precision stays high.\n\n"
            f"| Metric | Small ({small['n_corpus_lines']} lines) "
            f"| Large ({large['n_corpus_lines']} lines) |\n"
            "| :--- | :--- | :--- |\n"
            + row("Pairs Found", "pairs_found", "{}")
            + row("Optimal Threshold", "threshold", "{:.6f}")
            + row("Precision", "precision")
            + row("Recall", "recall")
            + row("F1 Score", "f1")
            + f"\n(gold positives: {n_pos}; directional assertions live "
            "in tests/test_quality_report.py)\n\n"
            "## Small-scale CLI report\n\n"
            + small["report_md"]
            + "\n## Large-scale CLI report\n\n"
            + large["report_md"]
        )
    print(
        json.dumps(
            {
                k: {m: v[m] for m in ("pairs_found", "precision", "recall", "f1")}
                for k, v in (("small", small), ("large", large))
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
