"""Dependency-path extraction: the engine's one genuine UDTF.

Per sentence (token array): enumerate ordered noun pairs, BFS the
shortest undirected path through the head-pointer tree, keep paths that
contain at least one non-auxiliary verb, render the path string, and
stem the two endpoint nouns.  Output explodes to one row per extracted
``(path, x, y)`` carrying the corpus weight ``n``.

Reference semantics (/root/reference/src/main/java/com/dirt/DirtDriver.java):
  * noun = pos startswith "N"; verb = startswith "V"; prep = pos in
    {IN, TO} (DirtDriver.java:37-47);
  * 23-word auxiliary stoplist; a path is valid iff some token on it is
    a verb not in the stoplist (DirtDriver.java:375-378,404-411);
  * BFS over the undirected adjacency induced by 1-based head pointers;
    out-of-range heads contribute no edge; disconnected pair → no path
    (DirtDriver.java:437-476). Neighbor order = insertion order
    (child→head edge first), which fixes tie-breaks between equal-length
    paths — we replicate the same insertion order;
  * rendering: endpoints "N"; verbs "V:<stem>"; preps "P:<lower word>";
    others "W:<lower word>"; edge label "<dep-of-current" when the
    current token's head is the next node, else ">dep-of-next"
    (DirtDriver.java:413-435);
  * endpoint nouns are Porter-stemmed, case preserved
    (DirtDriver.java:394-396).

The per-sentence graph is tiny (≤ ~50 nodes) so this is a per-row
micro-graph inside an Arrow-batched pandas UDF — not a distributed graph
problem.  At 100 TB the UDF scales embarrassingly: no shuffle, no state,
pure map over row batches.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dirt_hadoop_similarity_spark.functions.porter import porter_stem

AUX_VERBS = frozenset(
    (
        "be", "am", "is", "are", "was", "were", "been", "being",
        "do", "does", "did", "have", "has", "had", "will", "would",
        "shall", "should", "can", "could", "may", "might", "must",
    )
)

EXTRACTION_TYPE = "array<struct<path:string,x:string,y:string>>"


def _shortest_path(heads: list[int], src: int, dst: int) -> list[int] | None:
    """BFS over the undirected head-pointer adjacency; returns the node
    index path src..dst or None if disconnected."""
    n = len(heads)
    adj: list[list[int]] = [[] for _ in range(n)]
    for i, head in enumerate(heads):
        h = head - 1
        if 0 <= h < n:
            adj[i].append(h)
            adj[h].append(i)
    prev = [-1] * n
    prev[src] = src
    queue = deque([src])
    while queue:
        u = queue.popleft()
        if u == dst:
            break
        for v in adj[u]:
            if prev[v] == -1:
                prev[v] = u
                queue.append(v)
    if prev[dst] == -1:
        return None
    path = [dst]
    while path[-1] != src:
        path.append(prev[path[-1]])
    path.reverse()
    return path


def _is_noun(pos: str | None) -> bool:
    return bool(pos) and pos.startswith("N")


def _is_verb(pos: str | None) -> bool:
    return bool(pos) and pos.startswith("V")


def _is_prep(pos: str | None) -> bool:
    return pos in ("IN", "TO")


def _render_path(tokens: list, node_path: list[int]) -> str:
    pieces: list[str] = []
    last = len(node_path) - 1
    for i, idx in enumerate(node_path):
        tok = tokens[idx]
        if i == 0 or i == last:
            pieces.append("N")
        elif _is_verb(tok["pos"]):
            pieces.append("V:" + porter_stem(tok["word"]))
        elif _is_prep(tok["pos"]):
            pieces.append("P:" + tok["word"].lower())
        else:
            pieces.append("W:" + tok["word"].lower())
        if i < last:
            nxt = node_path[i + 1]
            if tok["head"] - 1 == nxt:
                rel = "<" + tok["dep"]
            else:
                rel = ">" + tokens[nxt]["dep"]
            pieces.append(":" + rel + ":")
    return "".join(pieces)


def extract_paths(tokens: list) -> list[dict]:
    """Pure-Python core: token list → list of {path, x, y} dicts."""
    if not tokens:
        return []
    nouns = [i for i, t in enumerate(tokens) if _is_noun(t["pos"])]
    heads = [t["head"] for t in tokens]
    out: list[dict] = []
    for a in range(len(nouns)):
        for b in range(a + 1, len(nouns)):
            src, dst = nouns[a], nouns[b]
            node_path = _shortest_path(heads, src, dst)
            if node_path is None:
                continue
            if not any(
                _is_verb(tokens[i]["pos"])
                and tokens[i]["word"].lower() not in AUX_VERBS
                for i in node_path
            ):
                continue
            out.append(
                {
                    "path": _render_path(tokens, node_path),
                    "x": porter_stem(tokens[src]["word"]),
                    "y": porter_stem(tokens[dst]["word"]),
                }
            )
    return out


def extract_paths_udf():
    """Arrow-batched pandas UDF: tokens array column → array<struct<path,x,y>>."""
    from dirt_hadoop_similarity_spark.operators._extraction_udf import (
        make_extract_udf,
    )

    return make_extract_udf(extract_paths)


def extractions(parsed: DataFrame) -> DataFrame:
    """G3: sentence rows → one row per extracted path occurrence.

    Input needs columns ``tokens`` (array<struct>) and ``n`` (weight).
    Output: ``(path, x, y, n)``.
    """
    udf = extract_paths_udf()
    return (
        parsed.select(F.explode(udf(F.col("tokens"))).alias("e"), "n")
        .select("e.path", "e.x", "e.y", "n")
    )


def facts(extracted: DataFrame) -> DataFrame:
    """Unpivot extractions into the (path, slot, word, n) fact stream —
    the Spark form of Job1's tagged TRIPLE emissions
    (DirtDriver.java:511-512): one X row for the left noun, one Y row for
    the right noun, each carrying the full corpus weight."""
    slots = F.array(
        F.struct(F.lit("X").alias("slot"), F.col("x").alias("word")),
        F.struct(F.lit("Y").alias("slot"), F.col("y").alias("word")),
    )
    return extracted.select(
        "path", F.explode(slots).alias("s"), "n"
    ).select("path", "s.slot", "s.word", "n")
