"""Unit tests for the path-extraction core (pure Python, no Spark)."""

from dirt_hadoop_similarity_spark.operators.extraction import (
    extract_paths,
    _shortest_path,
)


def tok(word, pos, dep, head):
    return {"word": word, "pos": pos, "dep": dep, "head": head}


SVO = [
    tok("dogs", "NNS", "nsubj", 2),
    tok("chase", "VBP", "ROOT", 0),
    tok("cats", "NNS", "dobj", 2),
]


def test_svo_path():
    out = extract_paths(SVO)
    assert out == [{"path": "N:<nsubj:V:chase:>dobj:N", "x": "dog", "y": "cat"}]


def test_prep_path():
    toks = [
        tok("patients", "NNS", "nsubj", 2),
        tok("die", "VBP", "ROOT", 0),
        tok("from", "IN", "prep", 2),
        tok("infections", "NNS", "pobj", 3),
    ]
    out = extract_paths(toks)
    assert out == [
        {
            "path": "N:<nsubj:V:die:>prep:P:from:>pobj:N",
            "x": "patient",
            "y": "infect",
        }
    ]


def test_aux_only_path_rejected():
    toks = [
        tok("dogs", "NNS", "nsubj", 2),
        tok("are", "VBP", "ROOT", 0),
        tok("animals", "NNS", "attr", 2),
    ]
    assert extract_paths(toks) == []


def test_no_verb_path_rejected():
    # two nouns joined directly (compound) — no verb on the path
    toks = [tok("dog", "NN", "compound", 2), tok("house", "NN", "ROOT", 0)]
    assert extract_paths(toks) == []


def test_disconnected_pair_skipped():
    # head pointers out of range → no edges → BFS returns None
    toks = [
        tok("dogs", "NNS", "nsubj", 9),
        tok("chase", "VBP", "ROOT", 9),
        tok("cats", "NNS", "dobj", 9),
    ]
    assert extract_paths(toks) == []


def test_three_nouns_all_pairs():
    # "dogs chase cats in parks" — nouns at 0, 2, 4 → 3 ordered pairs
    toks = [
        tok("dogs", "NNS", "nsubj", 2),
        tok("chase", "VBP", "ROOT", 0),
        tok("cats", "NNS", "dobj", 2),
        tok("in", "IN", "prep", 2),
        tok("parks", "NNS", "pobj", 4),
    ]
    out = extract_paths(toks)
    paths = [o["path"] for o in out]
    assert paths == [
        "N:<nsubj:V:chase:>dobj:N",          # dogs-cats
        "N:<nsubj:V:chase:>prep:P:in:>pobj:N",  # dogs-parks
        "N:<dobj:V:chase:>prep:P:in:>pobj:N",   # cats-parks
    ]
    assert [(o["x"], o["y"]) for o in out] == [
        ("dog", "cat"),
        ("dog", "park"),
        ("cat", "park"),
    ]


def test_non_verb_non_prep_renders_w_node():
    # "dogs chase cats and mice": the dogs→mice path passes through the
    # noun "cats", which renders as a W:<lower> internal node; the
    # cats→mice pair has no verb on its path and is rejected.
    toks = [
        tok("dogs", "NNS", "nsubj", 2),
        tok("chase", "VBP", "ROOT", 0),
        tok("cats", "NNS", "dobj", 2),
        tok("and", "CC", "cc", 3),
        tok("mice", "NNS", "conj", 3),
    ]
    out = extract_paths(toks)
    assert [o["path"] for o in out] == [
        "N:<nsubj:V:chase:>dobj:N",
        "N:<nsubj:V:chase:>dobj:W:cats:>conj:N",
    ]
    assert [(o["x"], o["y"]) for o in out] == [("dog", "cat"), ("dog", "mice")]


def test_edge_direction_rendering():
    # noun whose head IS the next node renders "<dep"; otherwise ">dep-of-next"
    # chain: a(1) <- b(2) -> c(3): a.head=2, b.head=0, c.head=2
    toks = [
        tok("apples", "NNS", "nsubj", 2),
        tok("rot", "VBP", "ROOT", 0),
        tok("barrels", "NNS", "nmod", 2),
    ]
    out = extract_paths(toks)
    assert out[0]["path"] == "N:<nsubj:V:rot:>nmod:N"


def test_bfs_shortest_and_tiebreak():
    # diamond impossible in a tree, but verify shortest wins over longer
    heads = [2, 0, 2]  # 0-1, 2-1 edges
    assert _shortest_path(heads, 0, 2) == [0, 1, 2]
    assert _shortest_path(heads, 0, 0) == [0]


def test_empty_tokens():
    assert extract_paths([]) == []
