"""Pin the reference's third correctness leg: the scale-sensitivity
DIRECTIONS of analysis/AnalysisReport.md:9-28.

The reference ran its pipeline on 10 vs 100 Google-Biarcs files and
reported (AnalysisReport.md:18-24, mirrored in BASELINE.md):

    Pairs Found        17       -> 538     (rises, super-linearly)
    Optimal Threshold  0.025647 -> 0.004192 (falls)
    Recall             0.0084   -> 0.1214   (rises steeply)

The mechanism is data sparsity: with little data, synonym verbs rarely
co-occur with shared argument words, so their feature vectors don't
overlap and gold positives score 0; more data fills the vectors, more
positives surface (recall up), and the weaker newly-found pairs pull
the optimal-F1 threshold down.  This test reproduces those three
directions end-to-end through the real CLI on a deterministic synthetic
corpus pair where the LARGE corpus is a strict superset of the SMALL
one (more files of the same collection, as in the reference's setup):
in SMALL only chase/pursue share arguments; in LARGE the other three
gold pairs gain (partial) argument overlap plus bulk unrelated mass.
All arithmetic downstream is exact/deterministic, so the asserted
inequalities are stable, not statistical.
"""

import json

import pytest

from dirt_hadoop_similarity_spark.__main__ import main as cli_main

SMALL = [
    # the one strongly-overlapping synonym pair
    "chase\tdogs/NNS/nsubj/2 chase/VBP/ROOT/0 cats/NNS/dobj/2\t3",
    "pursue\tdogs/NNS/nsubj/2 pursue/VBP/ROOT/0 cats/NNS/dobj/2\t2",
    "chase\tfoxes/NNS/nsubj/2 chase/VBP/ROOT/0 birds/NNS/dobj/2\t1",
    # the other positive-pair verbs appear, but with DISJOINT arguments
    "grab\thands/NNS/nsubj/2 grab/VBP/ROOT/0 tools/NNS/dobj/2\t2",
    "seize\tarmies/NNS/nsubj/2 seize/VBP/ROOT/0 cities/NNS/dobj/2\t2",
    "build\tworkers/NNS/nsubj/2 build/VBP/ROOT/0 houses/NNS/dobj/2\t2",
    "construct\tfirms/NNS/nsubj/2 construct/VBP/ROOT/0 bridges/NNS/dobj/2\t2",
    # negative-pair verbs, fully disjoint from their counterparts
    "eat\tcows/NNS/nsubj/2 eat/VBP/ROOT/0 grass/NNS/dobj/2\t2",
    "demolish\tcrews/NNS/nsubj/2 demolish/VBP/ROOT/0 walls/NNS/dobj/2\t2",
]
EXTRA = [
    # 10x the data: the sparse pairs now share arguments (weak overlap)
    "grab\tchildren/NNS/nsubj/2 grab/VBP/ROOT/0 toys/NNS/dobj/2\t1",
    "seize\tchildren/NNS/nsubj/2 seize/VBP/ROOT/0 toys/NNS/dobj/2\t1",
    "grab\tlions/NNS/nsubj/2 grab/VBP/ROOT/0 prey/NNS/dobj/2\t3",
    "seize\tpolice/NNS/nsubj/2 seize/VBP/ROOT/0 drugs/NNS/dobj/2\t3",
    "build\tmasons/NNS/nsubj/2 build/VBP/ROOT/0 towers/NNS/dobj/2\t1",
    "construct\tmasons/NNS/nsubj/2 construct/VBP/ROOT/0 towers/NNS/dobj/2\t1",
    "build\tbirds/NNS/nsubj/2 build/VBP/ROOT/0 nests/NNS/dobj/2\t3",
    "construct\tstates/NNS/nsubj/2 construct/VBP/ROOT/0 roads/NNS/dobj/2\t3",
    "push\tkids/NNS/nsubj/2 push/VBP/ROOT/0 carts/NNS/dobj/2\t1",
    "shove\tkids/NNS/nsubj/2 shove/VBP/ROOT/0 carts/NNS/dobj/2\t1",
    "push\tcrowds/NNS/nsubj/2 push/VBP/ROOT/0 gates/NNS/dobj/2\t2",
    "shove\tplayers/NNS/nsubj/2 shove/VBP/ROOT/0 rivals/NNS/dobj/2\t2",
    # bulk unrelated mass, as the larger corpus carries
] + [
    f"watch\tpeople{i}/NNS/nsubj/2 watch/VBP/ROOT/0 shows{i}/NNS/dobj/2\t4"
    for i in range(10)
] + [
    f"read\tstudents{i}/NNS/nsubj/2 read/VBP/ROOT/0 books{i}/NNS/dobj/2\t4"
    for i in range(10)
]

POS = [
    "X chase Y\tX pursue Y",
    "X grab Y\tX seize Y",
    "X build Y\tX construct Y",
    "X push Y\tX shove Y",
]
NEG = ["X chase Y\tX eat Y", "X build Y\tX demolish Y"]


@pytest.mark.slow
def test_recall_rises_and_threshold_falls_with_corpus_size(
    spark, tmp_path, capsys
):
    pos = tmp_path / "pos.txt"
    pos.write_text("\n".join(POS) + "\n")
    neg = tmp_path / "neg.txt"
    neg.write_text("\n".join(NEG) + "\n")

    metrics = {}
    for name, lines in (("small", SMALL), ("large", SMALL + EXTRA)):
        corpus = tmp_path / f"{name}.txt"
        corpus.write_text("\n".join(lines) + "\n")
        out = tmp_path / f"out_{name}"
        rc = cli_main(
            [str(corpus), "--testset", str(pos), str(neg), "--out", str(out)]
        )
        assert rc == 0
        capsys.readouterr()
        metrics[name] = json.loads((out / "metrics.json").read_text())

    small, large = metrics["small"], metrics["large"]
    # the three documented directions (AnalysisReport.md:18-24)
    assert large["pairs_found"] > small["pairs_found"], metrics
    assert large["recall"] > small["recall"], metrics
    assert large["threshold"] < small["threshold"], metrics
    # and the sparsity mechanism's signature: precision does NOT degrade
    # while recall multiplies (the reference saw 0.77 -> 0.98)
    assert large["precision"] >= small["precision"], metrics
    # pinned exact values for this corpus (deterministic arithmetic):
    # small finds only chase/pursue (1 of 4 gold positives)
    assert small["pairs_found"] == 1 and small["recall"] == 0.25, metrics
    assert large["pairs_found"] == 4 and large["recall"] == 1.0, metrics
